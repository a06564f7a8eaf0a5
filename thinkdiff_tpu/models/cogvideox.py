"""CogVideoX-style video diffusion transformer in JAX.

The reference composes ThinkDiff-CLIP conditions into diffusers'
``CogVideoXPipeline`` (CogVideoX-5b) for text+image -> video
(reference: scripts/test/test_blip_vision_t5_decoder_cogvideo.py:116-189,
first 65 vision tokens + T5 text embeds within a 226-token budget).

Architecture mirrored from the released model family: joint text+video
sequence, per-block "LayerNormZero" modulation (scale/shift/gate computed
separately for the text and video halves from the timestep embedding),
qk-layernormed attention with 3D RoPE over (t, y, x) patch positions,
gelu-tanh FFN, final AdaLN + patch unprojection, v-prediction.

Semantics follow diffusers' ``CogVideoXTransformer3DModel`` for the RoPE
family (CogVideoX-5b, the checkpoint the reference drives): video-first
6-way modulation chunks, a single shared affine LayerNorm per
LayerNormZero, LayerNorm (affine, eps 1e-6) qk-norm, timestep frequencies
at ``inner_dim``, an affine ``norm_final`` over the joint sequence, and an
AdaLayerNorm (shift-first) output head. Validated numerically against an
independent torch implementation of those published semantics in
tests/test_cogvideox.py (diffusers itself is absent from this image); the
2b variant (learned positional embeddings, no RoPE) is not modelled.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.models.flux import (
    MLPEmbedder, apply_rope_interleaved, timestep_embedding,
)
from thinkdiff_tpu.ops.flash_attention import flash_attention


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    in_channels: int = 16
    hidden_size: int = 3072          # 5b; 2b = 1920
    num_heads: int = 48              # 5b; 2b = 30
    num_layers: int = 42             # 5b; 2b = 30
    text_dim: int = 4096             # T5-xxl
    patch_size: int = 2
    time_embed_dim: int = 512
    mlp_ratio: float = 4.0
    rope_theta: float = 10000.0
    max_text_len: int = 226
    dtype: Any = jnp.float32
    # False | True/"int8" (weight-only) | "w8a8" — same frozen-weight
    # quantization modes as FLUX (models/flux.py); 5b bf16 weights (~11 GiB)
    # leave no activation headroom at the 49-frame 480p operating point on a
    # 16 GiB v5e, int8 halves them (see scripts/bench_cogvideo.py)
    quant_int8: Any = False
    # flash-attention tile sizes for the joint-attention call — the 42-layer
    # T~17.8k attention dominates the 5b denoise step, and the best tiling
    # at that shape differs from the kernel default (PERF.md round-3 sweep)
    attn_block_q: int = 512
    attn_block_k: int = 1024

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def cogvideox_5b(cls, **kw):
        # block_k 2048 measured 12% faster than the kernel default at the
        # 49f/480p joint-attention shape (B2 H48 T17776 D64): 155 -> 139 ms,
        # 56 TF/s; larger q tiles VMEM-OOM at D=64 (PERF.md round-3 sweep)
        return cls(**{**dict(dtype=jnp.bfloat16, attn_block_k=2048), **kw})

    @classmethod
    def tiny(cls, **kw):
        base = dict(in_channels=4, hidden_size=64, num_heads=4, num_layers=2,
                    text_dim=32, patch_size=2, time_embed_dim=32,
                    max_text_len=8)
        base.update(kw)
        return cls(**base)


def video_rope_cos_sin(t: int, h: int, w: int, head_dim: int,
                       theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3D rope tables over (t, y, x) patch grid -> (t*h*w, head_dim)."""
    dims = [head_dim // 4, (head_dim - head_dim // 4) // 2,
            (head_dim - head_dim // 4) // 2]
    # round to even
    dims = [d - d % 2 for d in dims]
    dims[0] += head_dim - sum(dims)
    grids = np.meshgrid(np.arange(t), np.arange(h), np.arange(w),
                        indexing="ij")
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(dims):
        omega = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        ang = grids[axis].reshape(-1, 1).astype(np.float64) * omega[None]
        cos_parts.append(np.repeat(np.cos(ang), 2, axis=-1))
        sin_parts.append(np.repeat(np.sin(ang), 2, axis=-1))
    return (jnp.asarray(np.concatenate(cos_parts, -1), jnp.float32),
            jnp.asarray(np.concatenate(sin_parts, -1), jnp.float32))


class CogVideoXBlock(nn.Module):
    cfg: CogVideoXConfig

    @nn.compact
    def __call__(self, txt, vid, temb, cos, sin):
        cfg = self.cfg
        d, h, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        from thinkdiff_tpu.models.t5 import QDense
        dense = lambda feat, name: QDense(feat, name=name, dtype=cfg.dtype,
                                          quant=cfg.quant_int8, use_bias=True)
        # CogVideoXLayerNormZero: ONE shared affine LayerNorm normalizes both
        # streams; the 6-way modulation is chunked VIDEO-first
        # (shift/scale/gate for video, then the same for text).
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name,
                                       dtype=cfg.dtype, param_dtype=cfg.dtype)
        st = txt.shape[1]

        ln1 = ln("norm1_ln")
        mod1 = dense(6 * d, "norm1_mod")(jax.nn.silu(temb))
        vs1, vc1, vg1, ts1, tc1, tg1 = jnp.split(mod1, 6, axis=-1)
        txt_n = ln1(txt) * (1 + tc1[:, None]) + ts1[:, None]
        vid_n = ln1(vid) * (1 + vc1[:, None]) + vs1[:, None]

        x = jnp.concatenate([txt_n, vid_n], axis=1)
        b, s, _ = x.shape
        q = dense(d, "to_q")(x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        k = dense(d, "to_k")(x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = dense(d, "to_v")(x).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        # qk-norm is an affine LayerNorm over head_dim, eps 1e-6 (diffusers
        # Attention(qk_norm="layer_norm", eps=1e-6)), applied BEFORE rope
        q = nn.LayerNorm(epsilon=1e-6, name="norm_q", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(q)
        k = nn.LayerNorm(epsilon=1e-6, name="norm_k", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(k)
        # rope applies only to the video tokens (text ids are position-free)
        qv = apply_rope_interleaved(q[:, :, st:], cos, sin)
        kv_ = apply_rope_interleaved(k[:, :, st:], cos, sin)
        q = jnp.concatenate([q[:, :, :st], qv], axis=2)
        k = jnp.concatenate([k[:, :, :st], kv_], axis=2)
        attn = flash_attention(q, k, v, None, None, False, hd ** -0.5,
                               block_q=cfg.attn_block_q,
                               block_k=cfg.attn_block_k)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        attn = dense(d, "to_out")(attn)
        txt = txt + tg1[:, None] * attn[:, :st]
        vid = vid + vg1[:, None] * attn[:, st:]

        ln2 = ln("norm2_ln")
        mod2 = dense(6 * d, "norm2_mod")(jax.nn.silu(temb))
        vs2, vc2, vg2, ts2, tc2, tg2 = jnp.split(mod2, 6, axis=-1)
        txt_n = ln2(txt) * (1 + tc2[:, None]) + ts2[:, None]
        vid_n = ln2(vid) * (1 + vc2[:, None]) + vs2[:, None]
        y = jnp.concatenate([txt_n, vid_n], axis=1)
        y = dense(int(d * cfg.mlp_ratio), "ff1")(y)
        y = jax.nn.gelu(y, approximate=True)
        y = dense(d, "ff2")(y)
        txt = txt + tg2[:, None] * y[:, :st]
        vid = vid + vg2[:, None] * y[:, st:]
        return txt, vid


class CogVideoXTransformer(nn.Module):
    cfg: CogVideoXConfig

    @nn.compact
    def __call__(self, latents, text_embeds, timestep):
        """latents: (B, T, H, W, C) latent frames; text_embeds: (B, S, text_dim)
        (aligned ThinkDiff tokens and/or T5 embeds); timestep (B,) ints.
        Returns v-prediction with the latents' shape."""
        cfg = self.cfg
        b, t, hgt, wdt, c = latents.shape
        p = cfg.patch_size
        from thinkdiff_tpu.models.t5 import QDense
        dense = lambda feat, name: QDense(feat, name=name, dtype=cfg.dtype,
                                          quant=cfg.quant_int8, use_bias=True)
        # patchify (p x p spatial)
        x = latents.reshape(b, t, hgt // p, p, wdt // p, p, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t * (hgt // p) * (wdt // p), p * p * c)
        vid = dense(cfg.hidden_size, "patch_embed")(x.astype(cfg.dtype))
        txt = dense(cfg.hidden_size, "text_embed")(text_embeds.astype(cfg.dtype))

        # timestep frequencies live at inner_dim (diffusers
        # Timesteps(inner_dim, flip_sin_to_cos=True, shift=0)), then
        # TimestepEmbedding(inner_dim -> time_embed_dim)
        temb = MLPEmbedder(cfg.time_embed_dim, cfg.dtype, name="time_embed")(
            timestep_embedding(
                timestep.astype(jnp.float32), cfg.hidden_size
            ).astype(cfg.dtype)
        )
        cos, sin = video_rope_cos_sin(t, hgt // p, wdt // p, cfg.head_dim,
                                      cfg.rope_theta)
        for i in range(cfg.num_layers):
            txt, vid = CogVideoXBlock(cfg, name=f"block_{i}")(
                txt, vid, temb, cos, sin)

        # norm_final: affine LN over the JOINT [text, video] sequence, then
        # the video half goes through AdaLayerNorm (shift FIRST, affine
        # inner LN) and the patch unprojection.
        x = jnp.concatenate([txt, vid], axis=1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(x)
        vid = x[:, txt.shape[1]:]
        mod = dense(2 * cfg.hidden_size, "norm_out_mod")(jax.nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        vid = nn.LayerNorm(epsilon=1e-5, name="norm_out_ln", dtype=cfg.dtype,
                           param_dtype=cfg.dtype)(vid)
        vid = vid * (1 + scale[:, None]) + shift[:, None]
        # our feature order is (ph, pw, c); the converter permutes the torch
        # (c, ph, pw) proj_out layout into this
        out = dense(p * p * c, "proj_out")(vid)
        out = out.reshape(b, t, hgt // p, wdt // p, p, p, c)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, hgt, wdt, c)
        return out


# ---------------------------------------------------------------------------
# v-prediction DDIM sampler with dynamic classifier-free guidance
# ---------------------------------------------------------------------------

def cosine_betas(num_train_steps: int = 1000, s: float = 0.008) -> np.ndarray:
    steps = np.arange(num_train_steps + 1, dtype=np.float64)
    f = np.cos((steps / num_train_steps + s) / (1 + s) * math.pi / 2) ** 2
    alphas_bar = f / f[0]
    betas = 1 - alphas_bar[1:] / alphas_bar[:-1]
    return np.clip(betas, 0, 0.999)


class CogVideoXSampler:
    """DDIM over v-prediction (CogVideoXDDIMScheduler semantics) with the
    pipeline's dynamic cfg: guidance ramps with a cosine over steps."""

    def __init__(self, cfg: CogVideoXConfig, params: Dict[str, Any],
                 num_train_steps: int = 1000, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # 5b transformer on a mesh: TP-shard the attention/MLP
            # projections over `model` like FluxSampler (the regex rules in
            # parallel/sharding.py match the same kernel name patterns)
            from thinkdiff_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.model = CogVideoXTransformer(cfg)
        betas = cosine_betas(num_train_steps)
        self.alphas_bar = np.cumprod(1.0 - betas)
        self.num_train_steps = num_train_steps

    def sample(self, text_embeds, frames: int = 4, height: int = 32,
               width: int = 32, num_steps: int = 50, guidance: float = 6.0,
               use_dynamic_cfg: bool = True, seed: int = 0):
        b = text_embeds.shape[0]
        rng = jax.random.PRNGKey(seed)
        lat = jax.random.normal(
            rng, (b, frames, height, width, self.cfg.in_channels), jnp.float32
        )
        null_text = jnp.zeros_like(jnp.asarray(text_embeds))
        step_idx = np.linspace(self.num_train_steps - 1, 0, num_steps).astype(int)

        @jax.jit
        def one_step(lat, ts, a_t, a_prev, g):
            v_cond = self.model.apply({"params": self.params}, lat,
                                      jnp.asarray(text_embeds), ts)
            v_uncond = self.model.apply({"params": self.params}, lat,
                                        null_text, ts)
            v = v_uncond + g * (v_cond - v_uncond)
            # v-pred -> x0/eps
            x0 = jnp.sqrt(a_t) * lat - jnp.sqrt(1 - a_t) * v
            eps = jnp.sqrt(a_t) * v + jnp.sqrt(1 - a_t) * lat
            return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps

        for i, t_cur in enumerate(step_idx):
            t_prev = step_idx[i + 1] if i + 1 < len(step_idx) else -1
            if use_dynamic_cfg:
                g = 1 + (guidance - 1) * (
                    1 - math.cos(math.pi * (num_steps - i) / num_steps)
                ) / 2
            else:
                g = guidance
            a_t = float(self.alphas_bar[t_cur])
            a_prev = float(self.alphas_bar[t_prev]) if t_prev >= 0 else 1.0
            lat = one_step(lat, jnp.full((b,), int(t_cur), jnp.int32),
                           jnp.float32(a_t), jnp.float32(a_prev),
                           jnp.float32(g))
        return lat


def convert_cogvideox(sd: Dict[str, np.ndarray], dtype=None) -> Dict[str, Any]:
    """diffusers CogVideoXTransformer3DModel key layout -> our params.

    Layout permutations handled here (numerics verified against the torch
    reference in tests/test_cogvideox.py::test_transformer_matches_torch):
    - ``patch_embed.proj`` is a Conv2d ``(D, C, p, p)`` in the 5b family ->
      our Dense over ``(p, p, C)``-flattened patches
    - ``proj_out`` emits features in ``(C, p, p)`` order (diffusers
      unpatchify) -> permuted into our ``(p, p, C)`` order
    """
    import re

    flat: Dict[str, np.ndarray] = {}

    def cast(a):
        return a.astype(dtype) if dtype is not None else a

    def put_linear(name, key, sd=sd):
        arr = sd[key + ".weight"]
        if arr.ndim == 2:
            arr = arr.T
        flat[name + "/kernel"] = cast(arr)
        if key + ".bias" in sd:
            flat[name + "/bias"] = cast(sd[key + ".bias"])

    def put_ln(name, key):
        flat[name + "/scale"] = cast(sd[key + ".weight"])
        flat[name + "/bias"] = cast(sd[key + ".bias"])

    pw = sd["patch_embed.proj.weight"]
    if pw.ndim == 4:  # Conv2d (D, C, ph, pw) -> (ph*pw*C, D) dense kernel
        dd, cc, p1, p2 = pw.shape
        flat["patch_embed/kernel"] = cast(
            pw.transpose(2, 3, 1, 0).reshape(p1 * p2 * cc, dd))
        flat["patch_embed/bias"] = cast(sd["patch_embed.proj.bias"])
        patch, cout = p1, cc
    else:  # 1.5-style Linear (not layout-verified; 5b is the target family)
        put_linear("patch_embed", "patch_embed.proj")
        patch, cout = None, None
    put_linear("text_embed", "patch_embed.text_proj")
    put_linear("time_embed/linear_1", "time_embedding.linear_1")
    put_linear("time_embed/linear_2", "time_embedding.linear_2")
    n = 1 + max((int(m.group(1)) for k in sd
                 if (m := re.match(r"transformer_blocks\.(\d+)\.", k))),
                default=-1)
    for i in range(n):
        hb, ob = f"transformer_blocks.{i}.", f"block_{i}"
        put_linear(f"{ob}/norm1_mod", hb + "norm1.linear")
        put_linear(f"{ob}/norm2_mod", hb + "norm2.linear")
        put_ln(f"{ob}/norm1_ln", hb + "norm1.norm")
        put_ln(f"{ob}/norm2_ln", hb + "norm2.norm")
        for p in ("to_q", "to_k", "to_v"):
            put_linear(f"{ob}/{p}", hb + f"attn1.{p}")
        put_linear(f"{ob}/to_out", hb + "attn1.to_out.0")
        put_ln(f"{ob}/norm_q", hb + "attn1.norm_q")
        put_ln(f"{ob}/norm_k", hb + "attn1.norm_k")
        put_linear(f"{ob}/ff1", hb + "ff.net.0.proj")
        put_linear(f"{ob}/ff2", hb + "ff.net.2")
    put_ln("norm_final", "norm_final")
    put_linear("norm_out_mod", "norm_out.linear")
    put_ln("norm_out_ln", "norm_out.norm")
    put_linear("proj_out", "proj_out")
    if patch is not None:  # (D, C*p*p in (C,p,p) order) -> (D, p*p*C)
        k = flat["proj_out/kernel"]
        d_in = k.shape[0]
        flat["proj_out/kernel"] = k.reshape(
            d_in, cout, patch, patch).transpose(0, 2, 3, 1).reshape(
            d_in, patch * patch * cout)
        flat["proj_out/bias"] = flat["proj_out/bias"].reshape(
            cout, patch, patch).transpose(1, 2, 0).reshape(-1)

    from thinkdiff_tpu.models.convert import _nest

    return _nest(flat)
