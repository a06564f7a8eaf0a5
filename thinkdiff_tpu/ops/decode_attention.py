"""KV-cache attention for autoregressive decode.

Replaces vLLM's CUDA PagedAttention (the reference's generation engine —
SURVEY.md §2.9 item 1). This is the DENSE formulation: static-shape cache
attention with length masking, fully fused by XLA (the per-step FLOPs are
tiny; the bottleneck is HBM reads of the cache, which this formulation
streams once per step, bounded by the engine's 256-step attention-window
bucketing). The serving-scale path is ops/paged_attention.py — a Pallas
page-pool kernel with per-slot early exit — which also reuses this module
as its XLA gather oracle; scripts/bench_paged_attention.py measures the
two against each other on chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def decode_attention(q, k_cache, v_cache, cache_len, sm_scale=None):
    """Single-step (or few-step) attention against a static KV cache.

    q:        (B, H, Tq, D)  — Tq is 1 for decode, >1 for chunked prefill tails
    k_cache:  (B, Hkv, S, D) — S = static max context
    v_cache:  (B, Hkv, S, D)
    cache_len:(B,) int32     — number of valid positions per sequence; query i
              (0-indexed within Tq) attends to positions < cache_len - Tq + i + 1.
    """
    b, h, tq, d = q.shape
    _, hkv, s, _ = k_cache.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    group = h // hkv
    qg = q.reshape(b, hkv, group, tq, d)
    scores = jnp.einsum(
        "bkgqd,bksd->bkgqs", qg.astype(jnp.float32),
        k_cache.astype(jnp.float32),
    ) * sm_scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (tq, s), 1)
    qidx = jax.lax.broadcasted_iota(jnp.int32, (tq, s), 0)
    limit = cache_len[:, None, None] - tq + qidx[None] + 1  # (B, Tq, S)
    mask = pos[None] < limit
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqs,bksd->bkgqd", p, v_cache.astype(jnp.float32))
    return out.reshape(b, h, tq, d).astype(q.dtype)


def update_kv_cache(k_cache, v_cache, k_new, v_new, cache_len):
    """Write Tq new KV entries at position cache_len via dynamic_update_slice.

    Returns (k_cache, v_cache, new_len). All shapes static.
    """
    b = k_cache.shape[0]
    tq = k_new.shape[2]

    def write_one(cache, new, start):
        return jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype), (0, start, 0)
        )

    k_cache = jax.vmap(write_one)(k_cache, k_new, cache_len)
    v_cache = jax.vmap(write_one)(v_cache, v_new, cache_len)
    return k_cache, v_cache, cache_len + tq
