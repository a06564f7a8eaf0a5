"""CLIP-L text encoder with pooled output.

FLUX needs only the POOLED CLIP embedding (reference flux_prompt.py:88-94
computes ``pooled_prompt_embeds`` from the text prompt — an empty string at
ThinkDiff inference time). Numerics match HF ``CLIPTextModel``: causal
attention, quick_gelu MLP, final layernorm, pooled = hidden at the
eos/argmax token position.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.ops.flash_attention import flash_attention

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: Any = jnp.float32

    @classmethod
    def clip_l(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        base = dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, max_positions=16,
                    eos_token_id=99)
        base.update(kw)
        return cls(**base)


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (last_hidden (B,T,D), pooled (B,D))."""
        cfg = self.cfg
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding",
                       dtype=cfg.dtype, param_dtype=cfg.dtype)(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.hidden_size), cfg.dtype)
        x = tok + pos[None, :t]
        head_dim = cfg.hidden_size // cfg.num_heads
        for i in range(cfg.num_layers):
            name = f"layer_{i}"
            ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"{name}_norm1",
                               dtype=cfg.dtype, param_dtype=cfg.dtype)
            ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"{name}_norm2",
                               dtype=cfg.dtype, param_dtype=cfg.dtype)
            h = ln1(x)
            q = nn.Dense(cfg.hidden_size, name=f"{name}_q", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(h)
            k = nn.Dense(cfg.hidden_size, name=f"{name}_k", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(h)
            v = nn.Dense(cfg.hidden_size, name=f"{name}_v", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(h)
            q = q.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
            attn = flash_attention(q, k, v, None, None, True, head_dim ** -0.5)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
            x = x + nn.Dense(cfg.hidden_size, name=f"{name}_out",
                             dtype=cfg.dtype, param_dtype=cfg.dtype)(attn)
            h = ln2(x)
            h = nn.Dense(cfg.intermediate_size, name=f"{name}_fc1",
                         dtype=cfg.dtype, param_dtype=cfg.dtype)(h)
            h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
            x = x + nn.Dense(cfg.hidden_size, name=f"{name}_fc2",
                             dtype=cfg.dtype, param_dtype=cfg.dtype)(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_norm",
                         dtype=cfg.dtype, param_dtype=cfg.dtype)(x)
        # pooled: hidden at the first eos token (HF: argmax over ==eos)
        eos_mask = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        has_eos = eos_mask.sum(axis=1) > 0
        first_eos = jnp.argmax(eos_mask, axis=1)
        idx = jnp.where(has_eos, first_eos, t - 1)
        pooled = x[jnp.arange(b), idx]
        return x, pooled


def convert_clip_text(sd: Dict[str, np.ndarray], prefix: str = "text_model.",
                      dtype=None):
    flat: Dict[str, np.ndarray] = {}
    g = lambda k: sd[prefix + k]

    def put(name, arr, transpose=False):
        if transpose:
            arr = arr.T
        if dtype is not None:
            arr = arr.astype(dtype)
        flat[name] = arr

    put("token_embedding/embedding", g("embeddings.token_embedding.weight"))
    put("position_embedding", g("embeddings.position_embedding.weight"))
    put("final_norm/scale", g("final_layer_norm.weight"))
    put("final_norm/bias", g("final_layer_norm.bias"))
    import re

    n = 1 + max((int(m.group(1)) for k in sd
                 if (m := re.match(rf"{re.escape(prefix)}encoder\.layers\.(\d+)\.", k))),
                default=-1)
    for i in range(n):
        hb = f"encoder.layers.{i}."
        nm = f"layer_{i}"
        for hf, ours in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                         ("out_proj", "out")):
            put(f"{nm}_{ours}/kernel", g(hb + f"self_attn.{hf}.weight"), True)
            put(f"{nm}_{ours}/bias", g(hb + f"self_attn.{hf}.bias"))
        put(f"{nm}_norm1/scale", g(hb + "layer_norm1.weight"))
        put(f"{nm}_norm1/bias", g(hb + "layer_norm1.bias"))
        put(f"{nm}_norm2/scale", g(hb + "layer_norm2.weight"))
        put(f"{nm}_norm2/bias", g(hb + "layer_norm2.bias"))
        put(f"{nm}_fc1/kernel", g(hb + "mlp.fc1.weight"), True)
        put(f"{nm}_fc1/bias", g(hb + "mlp.fc1.bias"))
        put(f"{nm}_fc2/kernel", g(hb + "mlp.fc2.weight"), True)
        put(f"{nm}_fc2/bias", g(hb + "mlp.fc2.bias"))

    from thinkdiff_tpu.models.convert import _nest

    return _nest(flat)
