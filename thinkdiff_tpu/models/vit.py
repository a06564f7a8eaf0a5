"""CLIP-style vision transformer, covering both HF ``Blip2VisionModel``
(the frozen image encoder of ThinkDiff-CLIP — reference
thinkdiff/models/blip_vision_t5_decoder.py:383-391 uses
``Salesforce/blip2-flan-t5-xxl``'s vision tower) and ``CLIPVisionModel``.

Differences captured by config flags:
  - BLIP-2: no pre-layernorm, fused-qkv checkpoint (converter splits it),
    gelu MLP; CLIP: pre-layernorm, quick_gelu.
Attention runs through the shared flash-attention op; the sequence is short
(257 for 224px/patch14) so the win is mostly fusion, not memory.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from thinkdiff_tpu.ops.flash_attention import flash_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_layers: int = 39
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    hidden_act: str = "gelu"          # "gelu" | "quick_gelu"
    layer_norm_eps: float = 1e-6
    use_pre_norm: bool = False        # CLIP True, BLIP-2 False
    patch_bias: bool = True
    # EVA beit-style decomposed relative position bias (reference
    # eva_vit.py:86-108,270-282; vestigial — no active config sets either):
    # per-block table when use_rel_pos_bias, one shared table when
    # use_shared_rel_pos_bias.
    use_rel_pos_bias: bool = False
    use_shared_rel_pos_bias: bool = False
    dtype: Any = jnp.float32

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def act_fn(self):
        if self.hidden_act == "quick_gelu":
            return lambda x: x * jax.nn.sigmoid(1.702 * x)
        return lambda x: jax.nn.gelu(x, approximate=False)

    @classmethod
    def blip2_vision(cls, **kw):
        """Blip2VisionConfig defaults (blip2-flan-t5-xxl vision tower)."""
        return cls(**kw)

    @classmethod
    def clip_vit_l(cls, **kw):
        base = dict(hidden_size=1024, intermediate_size=4096, num_layers=24,
                    num_heads=16, patch_size=14, hidden_act="quick_gelu",
                    layer_norm_eps=1e-5, use_pre_norm=True)
        base.update(kw)
        return cls(**base)

    @classmethod
    def eva_vit_g(cls, **kw):
        """EVA-CLIP-g geometry (reference thinkdiff/models/eva_vit.py:415-441:
        patch 14, width 1408, depth 39, mlp_ratio 4.3637). Vestigial in the
        reference's active configs (BlipVisionT5Decoder uses the HF BLIP-2
        tower) but kept for BaseModel.init_vision_encoder parity."""
        base = dict(hidden_size=1408, intermediate_size=int(1408 * 4.3637),
                    num_layers=39, num_heads=16, patch_size=14,
                    hidden_act="gelu", use_pre_norm=False)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):
        base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                    num_heads=4, image_size=28, patch_size=14)
        base.update(kw)
        return cls(**base)


def rel_pos_index(grid_h: int, grid_w: int):
    """(N, N) int index into the (2H-1)(2W-1)+3 bias table, N = HW + 1.

    Reference semantics (eva_vit.py:92-106): patch pairs index by their 2D
    offset; the 3 extra rows are cls->token, token->cls, cls->cls. Computed
    in numpy at trace time — it is static model geometry, not data.
    """
    import numpy as np

    coords = np.stack(np.meshgrid(np.arange(grid_h), np.arange(grid_w),
                                  indexing="ij"))          # (2, H, W)
    flat = coords.reshape(2, -1)                            # (2, HW)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, HW, HW)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += grid_h - 1
    rel[:, :, 1] += grid_w - 1
    rel[:, :, 0] *= 2 * grid_w - 1
    n_dist = (2 * grid_h - 1) * (2 * grid_w - 1) + 3
    idx = np.zeros((grid_h * grid_w + 1,) * 2, np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = n_dist - 3
    idx[0:, 0] = n_dist - 2
    idx[0, 0] = n_dist - 1
    return idx, n_dist


class RelativePositionBias(nn.Module):
    """Table + gather producing a (heads, N, N) additive attention bias."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self):
        cfg = self.cfg
        g = cfg.image_size // cfg.patch_size
        idx, n_dist = rel_pos_index(g, g)
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros,
                           (n_dist, cfg.num_heads), cfg.dtype)
        bias = table[idx.reshape(-1)].reshape(
            idx.shape[0], idx.shape[1], cfg.num_heads)
        return bias.transpose(2, 0, 1)                      # (nH, N, N)


class ViTAttention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rel_pos_bias=None):
        cfg = self.cfg
        d = cfg.hidden_size
        head_dim = d // cfg.num_heads
        dense = lambda name: nn.Dense(d, use_bias=True, name=name,
                                      dtype=cfg.dtype, param_dtype=cfg.dtype)
        b, t, _ = x.shape
        q = dense("q_proj")(x).reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        if rel_pos_bias is not None:
            # dense formulation: the EVA sequence is short (257/577), and
            # the additive (nH, N, N) bias would defeat the flash kernel's
            # streaming anyway — XLA fuses bias+softmax in one pass.
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q.astype(jnp.float32),
                k.astype(jnp.float32)) * (head_dim ** -0.5)
            scores = scores + rel_pos_bias[None].astype(jnp.float32)
            p = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", p,
                             v.astype(jnp.float32)).astype(x.dtype)
        else:
            out = flash_attention(q, k, v, None, None, False, head_dim ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return dense("out_proj")(out)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rel_pos_bias=None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name,
                                       dtype=cfg.dtype, param_dtype=cfg.dtype)
        if cfg.use_rel_pos_bias:
            rel_pos_bias = RelativePositionBias(cfg, name="rel_pos_bias")()
        x = x + ViTAttention(cfg, name="attn")(ln("norm1")(x), rel_pos_bias)
        h = ln("norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     param_dtype=cfg.dtype, name="mlp_fc1")(h)
        h = cfg.act_fn(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     param_dtype=cfg.dtype, name="mlp_fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixel_values, interpolate_pos: bool = False):
        """pixel_values: (B, H, W, C) float, already normalized.
        Returns (B, 1 + H/P * W/P, hidden) last hidden states (post-norm),
        matching HF Blip2VisionModel.last_hidden_state."""
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=cfg.patch_bias, name="patch_embed",
            dtype=cfg.dtype, param_dtype=cfg.dtype,
        )(pixel_values.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (1, 1, cfg.hidden_size), cfg.dtype,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.num_positions, cfg.hidden_size), cfg.dtype,
        )
        x = x + pos[:, : x.shape[1]]
        if cfg.use_pre_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_norm",
                             dtype=cfg.dtype, param_dtype=cfg.dtype)(x)
        shared_bias = (RelativePositionBias(cfg, name="rel_pos_bias")()
                       if cfg.use_shared_rel_pos_bias else None)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, name=f"block_{i}")(x, shared_bias)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_norm",
                         dtype=cfg.dtype, param_dtype=cfg.dtype)(x)
        return x


def vision_downsample(tokens, factor: int):
    """CLS-preserving bilinear spatial pool of the patch grid
    (reference blip_vision_t5_decoder.py:393-410): keep token 0, reshape the
    rest to (g, g), bilinear-resize to (g/f, g/f)."""
    b, t, d = tokens.shape
    g = int(round((t - 1) ** 0.5))
    assert g * g == t - 1, f"non-square grid {t - 1}"
    cls_tok, grid = tokens[:, :1], tokens[:, 1:]
    grid = grid.reshape(b, g, g, d)
    new_g = g // factor
    grid = jax.image.resize(grid, (b, new_g, new_g, d), method="bilinear")
    return jnp.concatenate([cls_tok, grid.reshape(b, new_g * new_g, d)], axis=1)
