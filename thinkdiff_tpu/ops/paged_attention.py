"""Paged KV-cache attention (Pallas TPU) + page-pool update helpers.

The serving-scale replacement for vLLM's PagedAttention (the reference's
generation engine — thinkdiff/models/mllama_vllm_generate_1.py runs vLLM
with ``max_num_seqs: 256`` concurrent sequences, configs/
qwen2_vl_embed_ccsbu.yaml:30). A dense per-slot cache sized to the global
``prompt_bucket + max_tokens`` makes 256 slots HBM-infeasible and forces
every decode step to stream the worst-case window for ALL slots. This
module instead stores KV in fixed-size pages drawn from one shared pool:

  k_pool, v_pool : (P, Hkv, PAGE, D) — page id 0 is reserved as the TRASH
                   page (garbage writes from finished/padded slots land
                   there; it is never read as valid context).
  page_table     : (S, MP) int32 — ordered page ids per decode slot; rows
                   beyond a slot's ``ceil(len/PAGE)`` pages hold 0.
  lengths        : (S,) int32 — valid KV length per slot (including the
                   entry written this step).

Per-slot early exit: the decode kernel's grid is (slots, MP) with the page
dimension innermost; the k/v BlockSpec index map clamps out-of-range page
steps to the slot's LAST valid page, and the Pallas pipeline elides a DMA
whose block index equals the previous step's — so each slot costs only
``ceil(len/PAGE)`` page fetches of HBM bandwidth regardless of MP. Compute
for clamped steps is masked out via ``pl.when``.

A pure-XLA gather formulation with identical semantics is the DEFAULT
everywhere (it measured faster than the kernel at serving page counts —
see the dispatcher docstring); the Pallas kernel runs under
THINKDIFF_PAGED_PALLAS=1 and doubles as the on-chip numerics cross-check
target (scripts/bench_paged_attention asserts kernel == oracle).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thinkdiff_tpu.ops.decode_attention import decode_attention

NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


# =========================== XLA reference =================================


def paged_attention_xla(q, k_pool, v_pool, page_table, lengths,
                        sm_scale=None):
    """Gather-based formulation: materialize each slot's pages contiguously
    and reuse :func:`decode_attention`. Reads MP pages per slot (no early
    exit) — correct everywhere, used on CPU and as the test oracle.

    q: (S, H, D) -> (S, H, D)
    """
    s, h, d = q.shape
    _, hkv, page, _ = k_pool.shape
    mp = page_table.shape[1]
    k = jnp.take(k_pool, page_table, axis=0)      # (S, MP, Hkv, page, D)
    k = k.transpose(0, 2, 1, 3, 4).reshape(s, hkv, mp * page, d)
    v = jnp.take(v_pool, page_table, axis=0)
    v = v.transpose(0, 2, 1, 3, 4).reshape(s, hkv, mp * page, d)
    out = decode_attention(q[:, :, None], k, v, lengths, sm_scale)
    return out[:, :, 0]


# =========================== Pallas kernel =================================


def _paged_kernel(lens_ref, table_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch, *,
                  sm_scale: float, page: int, num_heads: int,
                  num_kv_heads: int, max_pages: int):
    s = pl.program_id(0)
    p = pl.program_id(1)
    length = lens_ref[s]
    npages = jnp.maximum(_cdiv(length, page), 1)

    @pl.when(p == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    @pl.when(p < npages)
    def _compute():
        group = num_heads // num_kv_heads
        q = q_ref[0].astype(jnp.float32) * sm_scale        # (H, D)
        # GQA without repeating KV: per kv head, score its query group.
        parts = []
        for hk in range(num_kv_heads):
            kh = k_ref[0, hk].astype(jnp.float32)          # (page, D)
            qh = q[hk * group:(hk + 1) * group]            # (g, D)
            parts.append(jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        scores = jnp.concatenate(parts, axis=0)            # (H, page)
        col = p * page + jax.lax.broadcasted_iota(
            jnp.int32, (num_heads, page), 1)
        scores = jnp.where(col < length, scores, NEG_INF)

        m_prev = m_scratch[:, :1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        pexp = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_scratch[:, :1] + jnp.sum(
            pexp, axis=-1, keepdims=True)
        pv_parts = []
        for hk in range(num_kv_heads):
            vh = v_ref[0, hk].astype(jnp.float32)          # (page, D)
            pv_parts.append(jnp.dot(
                pexp[hk * group:(hk + 1) * group], vh,
                preferred_element_type=jnp.float32))
        acc_scratch[:] = acc_scratch[:] * alpha + jnp.concatenate(
            pv_parts, axis=0)
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(p == max_pages - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)


def paged_attention_pallas(q, k_pool, v_pool, page_table, lengths,
                           sm_scale=None, interpret: bool = False):
    """q (S, H, D); pools (P, Hkv, PAGE, D); page_table (S, MP) int32;
    lengths (S,) int32 -> (S, H, D)."""
    s, h, d = q.shape
    _, hkv, page, _ = k_pool.shape
    mp = page_table.shape[1]
    if sm_scale is None:
        sm_scale = d ** -0.5

    def q_index(si, pi, lens, table):
        return (si, 0, 0)

    def kv_index(si, pi, lens, table):
        # Clamp beyond-range page steps to the slot's last valid page: the
        # pipeline skips the DMA when the block index repeats, which is the
        # early-exit mechanism (bandwidth ~ ceil(len/PAGE), not MP).
        npages = jnp.maximum((lens[si] + page - 1) // page, 1)
        return (table[si, jnp.minimum(pi, npages - 1)], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, mp),
        in_specs=[
            pl.BlockSpec((1, h, d), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page, d), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page, d), kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), q_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),   # running max
            pltpu.VMEM((h, 128), jnp.float32),   # running denom
            pltpu.VMEM((h, d), jnp.float32),     # output accumulator
        ],
    )
    kernel = functools.partial(
        _paged_kernel, sm_scale=sm_scale, page=page, num_heads=h,
        num_kv_heads=hkv, max_pages=mp)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, h, d), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32),
      q, k_pool, v_pool)


def paged_attention(q, k_pool, v_pool, page_table, lengths, sm_scale=None):
    """Dispatcher — picks the formulation that measured fastest on chip.

    Head-to-head per decode step (scripts/bench_paged_attention, 2B
    serving geometry H12/Hkv2/D128/page64, PERF.md round-3 table):

        slots   xla gather   pallas kernel
          16       773 us        810 us
          64       935 us       1189 us
         256      3524 us       2625 us

    At small slot counts XLA's one fused gather wins; at serving scale
    the gather's materialized (S, MP*page) copy grows past the kernel's
    per-page grid overhead and the early-exit DMA elision takes over.
    Crossover sits between 64 and 256 — dispatch on the traced slot
    count (static at trace time). THINKDIFF_PAGED_PALLAS=1 /
    THINKDIFF_PAGED_XLA=1 force one side for measurement.
    """
    if jax.default_backend() == "tpu":
        if os.environ.get("THINKDIFF_PAGED_PALLAS") == "1":
            use_pallas = True
        elif os.environ.get("THINKDIFF_PAGED_XLA") == "1":
            use_pallas = False
        else:
            use_pallas = q.shape[0] >= 128
        if use_pallas:
            return paged_attention_pallas(q, k_pool, v_pool, page_table,
                                          lengths, sm_scale)
    return paged_attention_xla(q, k_pool, v_pool, page_table, lengths,
                               sm_scale)


# =========================== pool updates ==================================


def paged_update_kv(k_pool, v_pool, k_new, v_new, page_table, cache_len):
    """Write ONE new KV entry per slot at position ``cache_len[s]``.

    k_new/v_new: (S, Hkv, 1, D) or (S, Hkv, D). Positions past a slot's
    allocation resolve to the trash page (table rows beyond its page count
    hold 0), so finished slots decoding garbage never corrupt live pages.
    Returns (k_pool, v_pool).
    """
    if k_new.ndim == 4:
        k_new = k_new[:, :, 0]
        v_new = v_new[:, :, 0]
    page = k_pool.shape[2]
    mp = page_table.shape[1]
    pg = jnp.minimum(cache_len // page, mp - 1)
    off = cache_len % page
    pids = jnp.take_along_axis(page_table, pg[:, None], axis=1)[:, 0]
    k_pool = k_pool.at[pids, :, off].set(k_new.astype(k_pool.dtype))
    v_pool = v_pool.at[pids, :, off].set(v_new.astype(v_pool.dtype))
    return k_pool, v_pool


def commit_pages(pool, dense, page_rows):
    """Scatter a dense prefill cache into the pool, page-row-wise.

    pool: (P, Hkv, PAGE, D); dense: (m, Hkv, pad, D) with pad % PAGE == 0;
    page_rows: (m * pad // PAGE,) int32 destination page ids, row-major in
    (slot, page) order — rows beyond a slot's page count point at the trash
    page 0. Returns the updated pool.
    """
    m, hkv, pad, d = dense.shape
    page = pool.shape[2]
    rows = dense.reshape(m, hkv, pad // page, page, d)
    rows = rows.transpose(0, 2, 1, 3, 4).reshape(
        m * (pad // page), hkv, page, d)
    return pool.at[page_rows].set(rows.astype(pool.dtype))
