"""Rotary position embeddings: standard RoPE and Qwen2-VL's multimodal
3D M-RoPE (temporal/height/width sections).

Pure jnp — elementwise math that XLA fuses into the surrounding attention
projections; a Pallas kernel would add nothing here.

M-RoPE semantics follow Qwen2-VL: the head dim is split into three sections
(given by ``mrope_section`` halves, e.g. [16, 24, 24] for head_dim 128) and
each section takes its cos/sin from the t/h/w position ids respectively.
(reference behavior lives inside the vLLM fork / HF Qwen2-VL the reference
wraps at thinkdiff/models/mllama_vllm_generate_1.py:382-406.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_frequencies(head_dim: int, max_pos: int, theta: float = 10000.0,
                     dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(max_pos, head_dim//2) cos/sin tables."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    pos = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """Apply rotary embedding with the half-rotation convention.

    q, k: (..., T, head_dim); cos/sin: (T, head_dim//2) or broadcastable
    (..., T, head_dim//2).
    """
    cos2 = jnp.concatenate([cos, cos], axis=-1)
    sin2 = jnp.concatenate([sin, sin], axis=-1)
    q_out = q * cos2 + _rotate_half(q) * sin2
    k_out = k * cos2 + _rotate_half(k) * sin2
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def rope_from_positions(positions, head_dim: int, theta: float = 10000.0):
    """cos/sin for explicit integer positions (..., T) -> (..., T, head_dim//2)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs), jnp.sin(freqs)


def mrope_cos_sin(position_ids, head_dim: int,
                  mrope_section: Sequence[int], theta: float = 1000000.0):
    """Multimodal RoPE tables.

    position_ids: (3, B, T) stacked (t, h, w) positions.
    mrope_section: per-section sizes in *half* dims, sum == head_dim // 2.
    Returns cos/sin of shape (B, T, head_dim//2) with sections interleaved by
    position type.
    """
    assert position_ids.shape[0] == 3
    assert sum(mrope_section) == head_dim // 2
    cos_all, sin_all = rope_from_positions(position_ids, head_dim, theta)
    # cos_all: (3, B, T, head_dim//2); select section slices per axis type.
    chunks_cos, chunks_sin = [], []
    start = 0
    for i, size in enumerate(mrope_section):
        chunks_cos.append(cos_all[i % 3, ..., start:start + size])
        chunks_sin.append(sin_all[i % 3, ..., start:start + size])
        start += size
    return (jnp.concatenate(chunks_cos, axis=-1),
            jnp.concatenate(chunks_sin, axis=-1))


def apply_mrope(q, k, position_ids, mrope_section: Sequence[int],
                theta: float = 1000000.0):
    """q, k: (B, H, T, D); position_ids: (3, B, T)."""
    head_dim = q.shape[-1]
    cos, sin = mrope_cos_sin(position_ids, head_dim, mrope_section, theta)
    cos = cos[:, None, :, :]  # (B, 1, T, D/2) broadcasting over heads
    sin = sin[:, None, :, :]
    return apply_rope(q, k, cos, sin)
