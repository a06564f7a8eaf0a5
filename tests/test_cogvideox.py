"""CogVideoX analog: structural tests + scheduler math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.models.cogvideox import (
    CogVideoXConfig, CogVideoXSampler, CogVideoXTransformer, cosine_betas,
    video_rope_cos_sin,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = CogVideoXConfig.tiny()
    model = CogVideoXTransformer(cfg)
    lat = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
    txt = jnp.zeros((1, 4, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, txt,
                        jnp.zeros((1,), jnp.int32))["params"]
    return cfg, model, params


def test_transformer_shapes_and_conditioning(tiny):
    cfg, model, params = tiny
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(2, 2, 8, 8, cfg.in_channels), jnp.float32)
    txt = jnp.asarray(rs.randn(2, 4, cfg.text_dim), jnp.float32)
    t = jnp.asarray([100, 100], jnp.int32)
    out = model.apply({"params": params}, lat, txt, t)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = model.apply({"params": params}, lat, txt + 1.0, t)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4
    out3 = model.apply({"params": params}, lat, txt,
                       jnp.asarray([900, 900], jnp.int32))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4


def test_rope_tables_distinct_positions():
    cos, sin = video_rope_cos_sin(2, 4, 4, 16, 10000.0)
    assert cos.shape == (32, 16)
    assert not np.allclose(np.asarray(cos[0]), np.asarray(cos[5]))
    np.testing.assert_allclose(
        np.asarray(cos) ** 2 + np.asarray(sin) ** 2, 1.0, atol=1e-6
    )


def test_rope_tables_match_independent_rederivation():
    """Cross-check video_rope_cos_sin against an independent numpy
    re-derivation of the published 3D-RoPE semantics (diffusers
    get_3d_rotary_pos_embed at the native-resolution operating point,
    where the crop grid degenerates to arange): per-axis 1D rope with
    dims (D/4, 3D/8, 3D/8), repeat_interleave(2) real tables, grids
    broadcast over a (t, h, w)-ordered mesh, concatenated t|h|w.

    The repo's table builder constructs this differently (flat meshgrid +
    per-axis concat); this test is the independent check the round-2
    advisor asked for — a construction-order or axis-split mismatch vs
    the published layout would corrupt outputs with real CogVideoX-5b
    weights while passing the transformer parity test (which reuses the
    repo's own tables)."""
    t, h, w, head_dim, theta = 3, 4, 5, 64, 10000.0

    def rope_1d(dim, pos):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, np.float64) / dim))
        ang = np.outer(pos.astype(np.float64), freqs)
        # repeat_interleave(2, dim=1)
        return (np.repeat(np.cos(ang), 2, axis=1),
                np.repeat(np.sin(ang), 2, axis=1))

    dim_t, dim_h, dim_w = head_dim // 4, head_dim // 8 * 3, head_dim // 8 * 3
    t_cos, t_sin = rope_1d(dim_t, np.arange(t))
    h_cos, h_sin = rope_1d(dim_h, np.arange(h))
    w_cos, w_sin = rope_1d(dim_w, np.arange(w))

    def combine(ft, fh, fw):
        ft = np.broadcast_to(ft[:, None, None, :], (t, h, w, dim_t))
        fh = np.broadcast_to(fh[None, :, None, :], (t, h, w, dim_h))
        fw = np.broadcast_to(fw[None, None, :, :], (t, h, w, dim_w))
        return np.concatenate([ft, fh, fw], axis=-1).reshape(t * h * w, -1)

    exp_cos = combine(t_cos, h_cos, w_cos)
    exp_sin = combine(t_sin, h_sin, w_sin)

    cos, sin = video_rope_cos_sin(t, h, w, head_dim, theta)
    np.testing.assert_allclose(np.asarray(cos), exp_cos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), exp_sin, atol=1e-6)


def test_cosine_betas_schedule():
    betas = cosine_betas(1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    alphas_bar = np.cumprod(1 - betas)
    assert alphas_bar[0] > 0.99 and alphas_bar[-1] < 1e-3


def test_sampler_end_to_end_tiny(tiny):
    cfg, model, params = tiny
    sampler = CogVideoXSampler(cfg, params)
    rs = np.random.RandomState(0)
    txt = rs.randn(1, 4, cfg.text_dim).astype(np.float32)
    lat = sampler.sample(txt, frames=2, height=8, width=8, num_steps=3,
                         guidance=6.0, seed=0)
    assert lat.shape == (1, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(lat)).all()


# ------------- torch reference for the full transformer (no diffusers) -----
# An independent torch implementation of the published CogVideoX-5b
# semantics (video-first LayerNormZero chunks, shared affine LN, LayerNorm
# qk-norm eps 1e-6, inner_dim timestep freqs, Conv2d patch embed, joint
# norm_final, shift-first AdaLN head, (C,p,p) proj_out layout) with
# diffusers state_dict key names, used to validate convert_cogvideox end to
# end on random weights.


def _build_torch_cogvideox(cfg, seed=0):
    import torch
    from torch import nn as tnn

    d, hd, tdim = cfg.hidden_size, cfg.head_dim, cfg.time_embed_dim
    mlp = int(cfg.hidden_size * cfg.mlp_ratio)
    torch.manual_seed(seed)

    class LNZero(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear = tnn.Linear(tdim, 6 * d)
            self.norm = tnn.LayerNorm(d, eps=1e-5)

        def forward(self, vid, txt, temb):
            sh, sc, g, esh, esc, eg = self.linear(
                torch.nn.functional.silu(temb)).chunk(6, dim=1)
            vid = self.norm(vid) * (1 + sc[:, None]) + sh[:, None]
            txt = self.norm(txt) * (1 + esc[:, None]) + esh[:, None]
            return vid, txt, g[:, None], eg[:, None]

    class GELUProj(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Linear(d, mlp)

        def forward(self, x):
            return torch.nn.functional.gelu(self.proj(x), approximate="tanh")

    class Attn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = tnn.Linear(d, d)
            self.to_k = tnn.Linear(d, d)
            self.to_v = tnn.Linear(d, d)
            self.norm_q = tnn.LayerNorm(hd, eps=1e-6)
            self.norm_k = tnn.LayerNorm(hd, eps=1e-6)
            self.to_out = tnn.ModuleList([tnn.Linear(d, d)])

        def forward(self, x, st, cos, sin):
            b, s, _ = x.shape
            h = cfg.num_heads

            def heads(t):
                return t.reshape(b, s, h, hd).permute(0, 2, 1, 3)

            q = self.norm_q(heads(self.to_q(x)))
            k = self.norm_k(heads(self.to_k(x)))
            v = heads(self.to_v(x))

            def rope(t):  # interleaved pairing (apply_rotary_emb dim=-1)
                tr = torch.stack([-t[..., 1::2], t[..., 0::2]],
                                 dim=-1).flatten(-2)
                return t * cos + tr * sin

            q = torch.cat([q[:, :, :st], rope(q[:, :, st:])], dim=2)
            k = torch.cat([k[:, :, :st], rope(k[:, :, st:])], dim=2)
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            return self.to_out[0](o.permute(0, 2, 1, 3).reshape(b, s, d))

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1, self.norm2 = LNZero(), LNZero()
            self.attn1 = Attn()
            self.ff = tnn.Module()
            self.ff.net = tnn.ModuleList(
                [GELUProj(), tnn.Identity(), tnn.Linear(mlp, d)])

        def forward(self, vid, txt, temb, cos, sin):
            st = txt.shape[1]
            nv, nt, g, eg = self.norm1(vid, txt, temb)
            a = self.attn1(torch.cat([nt, nv], dim=1), st, cos, sin)
            vid = vid + g * a[:, st:]
            txt = txt + eg * a[:, :st]
            nv, nt, gf, egf = self.norm2(vid, txt, temb)
            y = self.ff.net[2](self.ff.net[0](torch.cat([nt, nv], dim=1)))
            return vid + gf * y[:, st:], txt + egf * y[:, :st]

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            p = cfg.patch_size
            self.patch_embed = tnn.Module()
            self.patch_embed.proj = tnn.Conv2d(
                cfg.in_channels, d, kernel_size=p, stride=p)
            self.patch_embed.text_proj = tnn.Linear(cfg.text_dim, d)
            self.time_embedding = tnn.Module()
            self.time_embedding.linear_1 = tnn.Linear(d, tdim)
            self.time_embedding.linear_2 = tnn.Linear(tdim, tdim)
            self.transformer_blocks = tnn.ModuleList(
                [Block() for _ in range(cfg.num_layers)])
            self.norm_final = tnn.LayerNorm(d, eps=1e-5)
            self.norm_out = tnn.Module()
            self.norm_out.linear = tnn.Linear(tdim, 2 * d)
            self.norm_out.norm = tnn.LayerNorm(d, eps=1e-5)
            self.proj_out = tnn.Linear(d, p * p * cfg.in_channels)

        def forward(self, lat, text, timestep):
            # lat (B, T, H, W, C) channels-last like the JAX model
            import math as _math
            p = cfg.patch_size
            b, t, hh, ww, c = lat.shape
            half = d // 2
            freqs = torch.exp(
                -_math.log(10000.0) * torch.arange(half).float() / half)
            ang = timestep.float()[:, None] * freqs[None]
            emb = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)
            temb = self.time_embedding.linear_2(torch.nn.functional.silu(
                self.time_embedding.linear_1(emb)))

            x = lat.permute(0, 1, 4, 2, 3).reshape(b * t, c, hh, ww)
            x = self.patch_embed.proj(x)  # (b*t, d, h/p, w/p)
            vid = x.flatten(2).transpose(1, 2).reshape(b, -1, d)
            txt = self.patch_embed.text_proj(text)

            cos, sin = video_rope_cos_sin(
                t, hh // p, ww // p, hd, cfg.rope_theta)
            cos = torch.tensor(np.asarray(cos))[None, None]
            sin = torch.tensor(np.asarray(sin))[None, None]
            for blk in self.transformer_blocks:
                vid, txt = blk(vid, txt, temb, cos, sin)
            st = txt.shape[1]
            vid = self.norm_final(torch.cat([txt, vid], dim=1))[:, st:]
            sh, sc = self.norm_out.linear(
                torch.nn.functional.silu(temb)).chunk(2, dim=1)
            vid = self.norm_out.norm(vid) * (1 + sc[:, None]) + sh[:, None]
            out = self.proj_out(vid)  # features in (C, p, p) order
            out = out.reshape(b, t, hh // p, ww // p, c, p, p)
            out = out.permute(0, 1, 2, 5, 3, 6, 4).reshape(b, t, hh, ww, c)
            return out

    return Model()


def test_transformer_matches_torch():
    torch = pytest.importorskip("torch")

    cfg = CogVideoXConfig.tiny()
    ref = _build_torch_cogvideox(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from thinkdiff_tpu.models.cogvideox import convert_cogvideox

    params = convert_cogvideox(sd)
    model = CogVideoXTransformer(cfg)

    rs = np.random.RandomState(0)
    lat = rs.randn(2, 2, 8, 8, cfg.in_channels).astype(np.float32)
    txt = rs.randn(2, 5, cfg.text_dim).astype(np.float32)
    ts = np.asarray([17, 903], np.int64)

    with torch.no_grad():
        want = ref(torch.tensor(lat), torch.tensor(txt),
                   torch.tensor(ts)).numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(ts, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ------------- torch-validated primitive numerics (no diffusers) ------------
# diffusers isn't in this image, but its CogVideoX VAE primitives reduce to
# torch ops we CAN check: causal conv3d == conv3d(replicate-time + zero-space
# pad), the converter's (O,I,kt,kh,kw)->(kt,kh,kw,I,O) transpose, GroupNorm.


def test_causal_conv3d_matches_torch_conv3d():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from thinkdiff_tpu.models.cogvideox_vae import CausalConv3d, _conv3d

    rs = np.random.RandomState(0)
    b, t, h, w, ci, co = 2, 5, 6, 6, 3, 4
    kt, kh, kw = 3, 3, 3
    x = rs.randn(b, t, h, w, ci).astype(np.float32)
    wgt = rs.randn(co, ci, kt, kh, kw).astype(np.float32) * 0.1
    bias = rs.randn(co).astype(np.float32)

    # torch reference: replicate pad in time (first frame), zero pad in space
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # (B, C, T, H, W)
    xt = F.pad(xt, (0, 0, 0, 0, kt - 1, 0), mode="replicate")
    xt = F.pad(xt, (kw // 2, kw // 2, kh // 2, kh // 2, 0, 0))
    ref = F.conv3d(xt, torch.tensor(wgt), torch.tensor(bias))
    ref = ref.permute(0, 2, 3, 4, 1).numpy()

    mod = CausalConv3d(co, (kt, kh, kw))
    params = {"conv": {"kernel": _conv3d(wgt), "bias": bias}}
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_upsample3d_conv_matches_torch_conv2d():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from thinkdiff_tpu.models.cogvideox_vae import Upsample3D, _conv2d

    rs = np.random.RandomState(1)
    b, t, h, w, c = 1, 3, 4, 4, 4
    x = rs.randn(b, t, h, w, c).astype(np.float32)
    wgt = rs.randn(c, c, 3, 3).astype(np.float32) * 0.1
    bias = rs.randn(c).astype(np.float32)

    # torch reference (diffusers CogVideoXUpsample3D semantics,
    # compress_time): first frame 2x spatial only, rest 2x time + 2x space,
    # then a per-frame 3x3 conv
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
    first = F.interpolate(xt[:, :, :1].squeeze(2), scale_factor=2.0,
                          mode="nearest").unsqueeze(2)
    rest = F.interpolate(xt[:, :, 1:], scale_factor=(2.0, 2.0, 2.0),
                         mode="nearest")
    up = torch.cat([first, rest], dim=2)  # (B, C, 2T-1, 2H, 2W)
    bt = up.shape[0] * up.shape[2]
    flat = up.permute(0, 2, 1, 3, 4).reshape(bt, c, up.shape[3], up.shape[4])
    ref = F.conv2d(flat, torch.tensor(wgt), torch.tensor(bias), padding=1)
    ref = ref.reshape(b, up.shape[2], c, up.shape[3], up.shape[4])
    ref = ref.permute(0, 1, 3, 4, 2).numpy()

    mod = Upsample3D(c, compress_time=True)
    params = {"conv": {"kernel": _conv2d(wgt), "bias": bias}}
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == ref.shape  # (1, 2T-1, 2H, 2W, C)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_spatial_norm_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")

    from thinkdiff_tpu.models.cogvideox_vae import SpatialNorm3D

    rs = np.random.RandomState(2)
    b, t, h, w, c = 1, 3, 4, 4, 8
    f = rs.randn(b, t, h, w, c).astype(np.float32)
    zq = rs.randn(b, 3, 2, 2, c).astype(np.float32)
    mod = SpatialNorm3D(groups=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(f), jnp.asarray(zq))

    gn = torch.nn.GroupNorm(4, c, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(np.asarray(
            params["params"]["norm_layer"]["scale"])))
        gn.bias.copy_(torch.tensor(np.asarray(
            params["params"]["norm_layer"]["bias"])))
        ref_norm = gn(torch.tensor(f).permute(0, 4, 1, 2, 3).reshape(
            b, c, t * h, w)).reshape(b, c, t, h, w).permute(
            0, 2, 3, 4, 1).numpy()

    # isolate the GroupNorm by zeroing the modulation convs: y==1, b==0
    p = jax.tree.map(np.asarray, params["params"])
    p["conv_y"]["conv"]["kernel"] = np.zeros_like(p["conv_y"]["conv"]["kernel"])
    p["conv_y"]["conv"]["bias"] = np.ones_like(p["conv_y"]["conv"]["bias"])
    p["conv_b"]["conv"]["kernel"] = np.zeros_like(p["conv_b"]["conv"]["kernel"])
    p["conv_b"]["conv"]["bias"] = np.zeros_like(p["conv_b"]["conv"]["bias"])
    out = np.asarray(mod.apply({"params": p}, jnp.asarray(f), jnp.asarray(zq)))
    np.testing.assert_allclose(out, ref_norm, atol=1e-4, rtol=1e-3)


# --------- torch reference for the FULL 3D causal VAE decoder --------------


def _build_torch_cogvideox_vae(cfg, seed=0):
    """Independent torch implementation of the published AutoencoderKL-
    CogVideoX decoder semantics (causal conv3d first-frame padding,
    SpatialNorm3D odd-frame split interpolation, compress_time upsampling,
    per-frame 2D upsample convs), with diffusers state_dict key names."""
    import torch
    import torch.nn.functional as F
    from torch import nn as tnn

    g = cfg.norm_num_groups
    zc = cfg.latent_channels
    torch.manual_seed(seed)

    class Causal(tnn.Module):
        def __init__(self, cin, cout, k=3):
            super().__init__()
            self.conv = tnn.Conv3d(cin, cout, k)

        def forward(self, x):
            kt, kh, kw = self.conv.kernel_size
            if kt > 1:
                x = torch.cat([x[:, :, :1]] * (kt - 1) + [x], dim=2)
            x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, 0, 0))
            return self.conv(x)

    class SpatialNorm(tnn.Module):
        def __init__(self, f_ch):
            super().__init__()
            self.norm_layer = tnn.GroupNorm(g, f_ch, eps=1e-6)
            self.conv_y = Causal(zc, f_ch, 1)
            self.conv_b = Causal(zc, f_ch, 1)

        def forward(self, f, zq):
            if f.shape[2] > 1 and f.shape[2] % 2 == 1:
                zf = F.interpolate(zq[:, :, :1],
                                   size=(1, f.shape[3], f.shape[4]))
                zr = F.interpolate(zq[:, :, 1:],
                                   size=(f.shape[2] - 1, f.shape[3],
                                         f.shape[4]))
                zq = torch.cat([zf, zr], dim=2)
            else:
                zq = F.interpolate(zq, size=f.shape[-3:])
            return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)

    class Res(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = SpatialNorm(cin)
            self.conv1 = Causal(cin, cout, 3)
            self.norm2 = SpatialNorm(cout)
            self.conv2 = Causal(cout, cout, 3)
            if cin != cout:
                self.conv_shortcut = Causal(cin, cout, 1)

        def forward(self, x, zq):
            h = self.conv1(F.silu(self.norm1(x, zq)))
            h = self.conv2(F.silu(self.norm2(h, zq)))
            if hasattr(self, "conv_shortcut"):
                x = self.conv_shortcut(x)
            return x + h

    class Up(tnn.Module):
        def __init__(self, ch, compress_time):
            super().__init__()
            self.conv = tnn.Conv2d(ch, ch, 3, padding=1)
            self.compress_time = compress_time

        def forward(self, x):
            if self.compress_time and x.shape[2] > 1 and x.shape[2] % 2 == 1:
                xf = F.interpolate(x[:, :, 0], scale_factor=2.0)
                xr = F.interpolate(x[:, :, 1:], scale_factor=2.0)
                x = torch.cat([xf[:, :, None], xr], dim=2)
            elif self.compress_time:
                x = F.interpolate(x, scale_factor=2.0)
            else:
                b, c, t, h, w = x.shape
                x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
                x = F.interpolate(x, scale_factor=2.0)
                x = x.reshape(b, t, c, x.shape[-2], x.shape[-1]
                              ).permute(0, 2, 1, 3, 4)
            b, c, t, h, w = x.shape
            y = self.conv(x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
            return y.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)

    chans = list(reversed(cfg.block_out_channels))
    tlevels = int(np.log2(cfg.temporal_compression_ratio))

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = Causal(zc, chans[0], 3)
            mid = tnn.Module()
            mid.resnets = tnn.ModuleList(
                [Res(chans[0], chans[0]) for _ in range(2)])
            self.mid_block = mid
            self.up_blocks = tnn.ModuleList()
            cin = chans[0]
            for bi, ch in enumerate(chans):
                ub = tnn.Module()
                ub.resnets = tnn.ModuleList()
                for ri in range(cfg.layers_per_block + 1):
                    ub.resnets.append(Res(cin if ri == 0 else ch, ch))
                if bi < len(chans) - 1:
                    ub.upsamplers = tnn.ModuleList(
                        [Up(ch, compress_time=bi < tlevels)])
                self.up_blocks.append(ub)
                cin = ch
            self.norm_out = SpatialNorm(chans[-1])
            self.conv_out = Causal(chans[-1], cfg.out_channels, 3)

        def forward(self, z):
            zq = z
            h = self.conv_in(z)
            for r in self.mid_block.resnets:
                h = r(h, zq)
            for ub in self.up_blocks:
                for r in ub.resnets:
                    h = r(h, zq)
                if hasattr(ub, "upsamplers"):
                    h = ub.upsamplers[0](h)
            h = F.silu(self.norm_out(h, zq))
            return self.conv_out(h)

    class Wrapper(tnn.Module):
        def __init__(self):
            super().__init__()
            self.decoder = Decoder()

    return Wrapper()


def test_vae_decoder_matches_torch():
    torch = pytest.importorskip("torch")

    from thinkdiff_tpu.models.cogvideox_vae import (
        CogVideoXVAEConfig, CogVideoXVAEDecoder, convert_cogvideox_vae,
    )

    cfg = CogVideoXVAEConfig.tiny()
    ref = _build_torch_cogvideox_vae(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_cogvideox_vae(sd)
    model = CogVideoXVAEDecoder(cfg)

    rs = np.random.RandomState(0)
    z = rs.randn(1, 3, 4, 4, cfg.latent_channels).astype(np.float32)
    with torch.no_grad():
        want = ref.decoder(
            torch.tensor(z).permute(0, 4, 1, 2, 3)
        ).permute(0, 2, 3, 4, 1).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(z)))
    assert got.shape == want.shape  # (1, 5, 8, 8, 3): 2x time (first kept)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
