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
