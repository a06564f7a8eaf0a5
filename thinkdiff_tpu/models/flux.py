"""FLUX.1 MMDiT transformer in JAX.

The denoising backbone the reference drives through diffusers'
``FluxPipeline`` (reference: thinkdiff/models/flux_prompt.py:1-16,
scripts/test/test_mllama_t5_decoder_flux.py:182-192). ThinkDiff conditions it
on *external* prompt embeds (aligned VLM/CLIP tokens) instead of T5-encoder
output; here that is simply the ``txt`` argument.

Architecture (FLUX.1-dev): 19 double-stream (img/txt) MMDiT blocks + 38
single-stream blocks, hidden 3072 = 24 heads x 128, AdaLayerNorm-Zero
modulation from (timestep + guidance + pooled-CLIP) embedding, joint
attention with interleaved-pair RoPE over (id, y, x) axes [16, 56, 56],
per-head RMS q/k norm, packed 2x2 latent patches (64 channels).

Weight layout mirrors diffusers' ``FluxTransformer2DModel`` module names via
convert_flux() so released safetensors convert directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.ops.flash_attention import flash_attention


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    hidden_size: int = 3072
    num_heads: int = 24
    num_double_layers: int = 19
    num_single_layers: int = 38
    mlp_ratio: float = 4.0
    joint_attention_dim: int = 4096   # T5 / aligned-token dim
    pooled_projection_dim: int = 768  # CLIP-L pooled
    axes_dims_rope: Sequence[int] = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embeds: bool = True      # dev=True, schnell=False
    dtype: Any = jnp.float32
    # weight-only int8 (kernel_q + kernel_scale leaves, ops/quant layout):
    # the 12B dev geometry fits a single 16 GB v5e in int8 (bf16 needs the
    # `model` mesh axis)
    quant_int8: bool = False
    # flash-attention tile sizes; 0 = auto. Auto uses ONE k tile spanning
    # the whole joint sequence when it fits scoped VMEM (at D=128 the qk
    # f32 tile is the limit: 512 x 4608 x 4B ≈ 9.4 MB of the 16 MB budget)
    # — measured 23% faster than the kernel default at the dev 1024²
    # shape (B1 H24 T4608 D128: 4.80 -> 3.89 ms, 67 TF/s; PERF.md round-3)
    attn_block_q: int = 512
    attn_block_k: int = 0

    # largest padded kv_len a single full-sequence k tile may span in auto
    # mode (beyond it the qk scratch blows the 16 MB scoped VMEM)
    _FULL_K_LIMIT = 6144

    def attn_blocks(self, kv_len: int):
        """(block_q, block_k) for a joint-attention call at this kv_len."""
        bk = self.attn_block_k
        if bk == 0:
            bk = kv_len if kv_len <= self._FULL_K_LIMIT else 1024
        return self.attn_block_q, bk

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def flux_dev(cls, **kw):
        return cls(**{**dict(dtype=jnp.bfloat16), **kw})

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            in_channels=16, hidden_size=64, num_heads=4,
            num_double_layers=2, num_single_layers=2,
            joint_attention_dim=32, pooled_projection_dim=24,
            axes_dims_rope=(4, 6, 6), guidance_embeds=True,
        )
        base.update(kw)
        return cls(**base)


# ---------------------------------------------------------------------------
# RoPE (interleaved-pair convention, diffusers use_real_unbind_dim=-1)
# ---------------------------------------------------------------------------

def flux_rope_cos_sin(ids: jnp.ndarray, axes_dims: Sequence[int],
                      theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ids (S, n_axes) -> cos/sin (S, head_dim), repeat-interleaved pairs."""
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(axes_dims):
        omega = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        angles = ids[:, i:i + 1].astype(jnp.float32) * omega[None]  # (S, dim/2)
        cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def apply_rope_interleaved(x, cos, sin):
    """x (..., S, D); cos/sin (S, D). Pairwise rotation."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
            ).astype(x.dtype)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       flip: bool = True):
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class MLPEmbedder(nn.Module):
    """Linear -> silu -> Linear (diffusers TimestepEmbedding / text_embedder)."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="linear_1", dtype=self.dtype,
                     param_dtype=self.dtype)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.hidden, name="linear_2", dtype=self.dtype,
                        param_dtype=self.dtype)(x)


class QKNorm(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k):
        from thinkdiff_tpu.ops.norms import rmsnorm

        qs = self.param("q_scale", nn.initializers.ones, (self.dim,))
        ks = self.param("k_scale", nn.initializers.ones, (self.dim,))
        return (rmsnorm(q.astype(self.dtype), qs.astype(self.dtype)),
                rmsnorm(k.astype(self.dtype), ks.astype(self.dtype)))


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


class DoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, temb, cos, sin):
        cfg = self.cfg
        d, h, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        from thinkdiff_tpu.models.t5 import QDense

        dense = lambda feat, name: QDense(feat, name=name, dtype=cfg.dtype,
                                          quant=cfg.quant_int8, use_bias=True)
        mod = jax.nn.silu(temb)
        img_mod = dense(6 * d, "img_mod")(mod)
        txt_mod = dense(6 * d, "txt_mod")(mod)
        (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2) = jnp.split(
            img_mod, 6, axis=-1)
        (t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = jnp.split(
            txt_mod, 6, axis=-1)

        ln = lambda name: nn.LayerNorm(use_bias=False, use_scale=False,
                                       epsilon=1e-6, name=name,
                                       dtype=cfg.dtype, param_dtype=cfg.dtype)
        img_n = modulate(ln("img_norm1")(img), i_shift1, i_scale1)
        txt_n = modulate(ln("txt_norm1")(txt), t_shift1, t_scale1)

        b, si, _ = img.shape
        st = txt.shape[1]

        def qkv(x, prefix):
            q = dense(d, f"{prefix}_q")(x)
            k = dense(d, f"{prefix}_k")(x)
            v = dense(d, f"{prefix}_v")(x)
            q = q.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
            return q, k, v

        iq, ik, iv = qkv(img_n, "img")
        tq, tk, tv = qkv(txt_n, "txt")
        iq, ik = QKNorm(hd, cfg.dtype, name="img_qknorm")(iq, ik)
        tq, tk = QKNorm(hd, cfg.dtype, name="txt_qknorm")(tq, tk)
        # joint sequence: [txt; img] (diffusers order)
        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        bq, bk = cfg.attn_blocks(q.shape[2])
        out = flash_attention(q, k, v, None, None, False, hd ** -0.5,
                              block_q=bq, block_k=bk)
        out = out.transpose(0, 2, 1, 3).reshape(b, st + si, d)
        txt_attn, img_attn = out[:, :st], out[:, st:]

        img = img + i_gate1[:, None] * dense(d, "img_proj")(img_attn)
        txt = txt + t_gate1[:, None] * dense(d, "txt_proj")(txt_attn)

        img_m = modulate(ln("img_norm2")(img), i_shift2, i_scale2)
        img_m = dense(int(d * cfg.mlp_ratio), "img_mlp1")(img_m)
        img_m = jax.nn.gelu(img_m, approximate=True)
        img = img + i_gate2[:, None] * dense(d, "img_mlp2")(img_m)

        txt_m = modulate(ln("txt_norm2")(txt), t_shift2, t_scale2)
        txt_m = dense(int(d * cfg.mlp_ratio), "txt_mlp1")(txt_m)
        txt_m = jax.nn.gelu(txt_m, approximate=True)
        txt = txt + t_gate2[:, None] * dense(d, "txt_mlp2")(txt_m)
        return img, txt


class SingleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, temb, cos, sin):
        cfg = self.cfg
        d, h, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        mlp_dim = int(d * cfg.mlp_ratio)
        from thinkdiff_tpu.models.t5 import QDense

        dense = lambda feat, name: QDense(feat, name=name, dtype=cfg.dtype,
                                          quant=cfg.quant_int8, use_bias=True)
        mod = dense(3 * d, "mod")(jax.nn.silu(temb))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        xn = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="norm", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(x),
            shift, scale,
        )
        b, s, _ = x.shape
        q = dense(d, "q")(xn).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        k = dense(d, "k")(xn).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = dense(d, "v")(xn).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        q, k = QKNorm(hd, cfg.dtype, name="qknorm")(q, k)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        bq, bk = cfg.attn_blocks(s)
        attn = flash_attention(q, k, v, None, None, False, hd ** -0.5,
                               block_q=bq, block_k=bk)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        mlp = jax.nn.gelu(dense(mlp_dim, "mlp")(xn), approximate=True)
        out = dense(d, "proj_out")(jnp.concatenate([attn, mlp], axis=-1))
        return x + gate[:, None] * out


class FluxTransformer(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, pooled, timestep, img_ids, txt_ids,
                 guidance=None):
        """img: (B, S_img, 64) packed latents; txt: (B, S_txt, joint_dim)
        external prompt embeds; pooled: (B, pooled_dim); timestep (B,) in
        [0, 1]; ids: (S, 3). Returns velocity prediction (B, S_img, 64)."""
        cfg = self.cfg
        d = cfg.hidden_size
        from thinkdiff_tpu.models.t5 import QDense

        dense = lambda feat, name: QDense(feat, name=name, dtype=cfg.dtype,
                                          quant=cfg.quant_int8, use_bias=True)
        img = dense(d, "x_embedder")(img.astype(cfg.dtype))
        txt = dense(d, "context_embedder")(txt.astype(cfg.dtype))

        temb = MLPEmbedder(d, cfg.dtype, name="timestep_embedder")(
            timestep_embedding(timestep * 1000.0, 256).astype(cfg.dtype)
        )
        if cfg.guidance_embeds:
            g = guidance if guidance is not None else jnp.ones_like(timestep) * 3.5
            temb = temb + MLPEmbedder(d, cfg.dtype, name="guidance_embedder")(
                timestep_embedding(g * 1000.0, 256).astype(cfg.dtype)
            )
        temb = temb + MLPEmbedder(d, cfg.dtype, name="text_embedder")(
            pooled.astype(cfg.dtype)
        )

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)  # (S_txt+S_img, 3)
        cos, sin = flux_rope_cos_sin(ids, cfg.axes_dims_rope, cfg.rope_theta)

        for i in range(cfg.num_double_layers):
            img, txt = DoubleBlock(cfg, name=f"double_{i}")(
                img, txt, temb, cos, sin)
        x = jnp.concatenate([txt, img], axis=1)
        for i in range(cfg.num_single_layers):
            x = SingleBlock(cfg, name=f"single_{i}")(x, temb, cos, sin)
        img = x[:, txt.shape[1]:]

        # final AdaLayerNormContinuous
        mod = dense(2 * d, "norm_out")(jax.nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        img = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                           name="final_norm", dtype=cfg.dtype,
                           param_dtype=cfg.dtype)(img)
        img = img * (1.0 + scale[:, None]) + shift[:, None]
        return dense(cfg.in_channels, "proj_out")(img)


# ---------------------------------------------------------------------------
# Latent packing + ids
# ---------------------------------------------------------------------------

def pack_latents(latents):
    """(B, H, W, C) -> (B, H/2*W/2, 4C) 2x2 patch packing."""
    b, hgt, wdt, c = latents.shape
    x = latents.reshape(b, hgt // 2, 2, wdt // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/2, W/2, C, 2, 2)
    return x.reshape(b, (hgt // 2) * (wdt // 2), c * 4)


def unpack_latents(packed, height: int, width: int):
    """(B, H/2*W/2, 4C) -> (B, H, W, C)."""
    b, s, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, height, width, c)


def make_img_ids(height: int, width: int) -> np.ndarray:
    """(H/2*W/2, 3) ids: (0, y, x) over the packed grid."""
    h2, w2 = height // 2, width // 2
    ids = np.zeros((h2, w2, 3), np.float32)
    ids[..., 1] = np.arange(h2)[:, None]
    ids[..., 2] = np.arange(w2)[None, :]
    return ids.reshape(-1, 3)


# ---------------------------------------------------------------------------
# diffusers weight conversion (FluxTransformer2DModel key layout)
# ---------------------------------------------------------------------------

def convert_flux(sd: Dict[str, np.ndarray], dtype=None) -> Dict[str, Any]:
    flat: Dict[str, np.ndarray] = {}

    def put(name, key, transpose=True):
        arr = sd[key]
        if transpose and arr.ndim == 2:
            arr = arr.T
        if dtype is not None:
            arr = arr.astype(dtype)
        flat[name] = arr

    def put_linear(name, key):
        put(f"{name}/kernel", key + ".weight")
        if key + ".bias" in sd:
            put(f"{name}/bias", key + ".bias", transpose=False)

    put_linear("x_embedder", "x_embedder")
    put_linear("context_embedder", "context_embedder")
    put_linear("timestep_embedder/linear_1",
               "time_text_embed.timestep_embedder.linear_1")
    put_linear("timestep_embedder/linear_2",
               "time_text_embed.timestep_embedder.linear_2")
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        put_linear("guidance_embedder/linear_1",
                   "time_text_embed.guidance_embedder.linear_1")
        put_linear("guidance_embedder/linear_2",
                   "time_text_embed.guidance_embedder.linear_2")
    put_linear("text_embedder/linear_1", "time_text_embed.text_embedder.linear_1")
    put_linear("text_embedder/linear_2", "time_text_embed.text_embedder.linear_2")

    n_double = 1 + max((int(k.split(".")[1]) for k in sd
                        if k.startswith("transformer_blocks.")), default=-1)
    for i in range(n_double):
        hb, ob = f"transformer_blocks.{i}.", f"double_{i}"
        put_linear(f"{ob}/img_mod", hb + "norm1.linear")
        put_linear(f"{ob}/txt_mod", hb + "norm1_context.linear")
        put_linear(f"{ob}/img_q", hb + "attn.to_q")
        put_linear(f"{ob}/img_k", hb + "attn.to_k")
        put_linear(f"{ob}/img_v", hb + "attn.to_v")
        put_linear(f"{ob}/txt_q", hb + "attn.add_q_proj")
        put_linear(f"{ob}/txt_k", hb + "attn.add_k_proj")
        put_linear(f"{ob}/txt_v", hb + "attn.add_v_proj")
        put(f"{ob}/img_qknorm/q_scale", hb + "attn.norm_q.weight", False)
        put(f"{ob}/img_qknorm/k_scale", hb + "attn.norm_k.weight", False)
        put(f"{ob}/txt_qknorm/q_scale", hb + "attn.norm_added_q.weight", False)
        put(f"{ob}/txt_qknorm/k_scale", hb + "attn.norm_added_k.weight", False)
        put_linear(f"{ob}/img_proj", hb + "attn.to_out.0")
        put_linear(f"{ob}/txt_proj", hb + "attn.to_add_out")
        put_linear(f"{ob}/img_mlp1", hb + "ff.net.0.proj")
        put_linear(f"{ob}/img_mlp2", hb + "ff.net.2")
        put_linear(f"{ob}/txt_mlp1", hb + "ff_context.net.0.proj")
        put_linear(f"{ob}/txt_mlp2", hb + "ff_context.net.2")

    n_single = 1 + max((int(k.split(".")[1]) for k in sd
                        if k.startswith("single_transformer_blocks.")),
                       default=-1)
    for i in range(n_single):
        hb, ob = f"single_transformer_blocks.{i}.", f"single_{i}"
        put_linear(f"{ob}/mod", hb + "norm.linear")
        put_linear(f"{ob}/q", hb + "attn.to_q")
        put_linear(f"{ob}/k", hb + "attn.to_k")
        put_linear(f"{ob}/v", hb + "attn.to_v")
        put(f"{ob}/qknorm/q_scale", hb + "attn.norm_q.weight", False)
        put(f"{ob}/qknorm/k_scale", hb + "attn.norm_k.weight", False)
        put_linear(f"{ob}/mlp", hb + "proj_mlp")
        put_linear(f"{ob}/proj_out", hb + "proj_out")

    put_linear("norm_out", "norm_out.linear")
    put_linear("proj_out", "proj_out")

    from thinkdiff_tpu.models.convert import _nest

    return _nest(flat)
