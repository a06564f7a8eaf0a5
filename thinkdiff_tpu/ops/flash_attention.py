"""Pallas TPU flash attention (forward) with a recompute backward.

Replaces the attention math the reference gets from external CUDA libraries
(vLLM PagedAttention, torch sdpa inside HF models — reference
thinkdiff/models/*.py all delegate attention to those deps).

Design:
  - online-softmax blockwise forward, grid (batch*heads, q_blocks, k_blocks)
    with the k dimension innermost so VMEM scratch (m, l, acc) carries across
    k blocks for a fixed q block (TPU grids execute sequentially).
  - GQA without materializing repeated KV heads: the k/v BlockSpec index maps
    fold the query head onto its KV group.
  - optional additive bias (for T5 relative position bias / padding masks),
    broadcast over batch and/or heads via index-map arithmetic.
  - causal masking computed from iota inside the kernel (no bias tensor).
  - backward = blockwise recompute in plain XLA (memory-light enough for the
    training sequence lengths in this framework, <=512; inference paths never
    differentiate). A Pallas backward is a later perf pass.

Shapes: q (B, Hq, Tq, D); k, v (B, Hkv, Tk, D); Hq % Hkv == 0.
bias: broadcastable to (B, Hq, Tq, Tk) (leading dims may be 1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    q_len: int, kv_len: int, num_k_blocks: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def _compute():
        q = q_ref[0].astype(jnp.float32) * sm_scale          # (bq, d)
        k = k_ref[0].astype(jnp.float32)                      # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (bq, bk)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)

        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col < kv_len
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, row >= col)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]                             # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)            # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)                       # (bq, 1)
        l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0].astype(jnp.float32)                      # (bk, d)
        pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    if causal:
        # Skip fully-masked key blocks above the diagonal.
        @pl.when(ki * block_k <= qi * block_q + (block_q - 1))
        def _():
            _compute()
    else:
        _compute()

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)


def _flash_attention_forward(
    q, k, v, bias, *, causal: bool, sm_scale: float,
    block_q: int, block_k: int,
):
    batch, num_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    assert num_heads % num_kv_heads == 0
    group = num_heads // num_kv_heads

    def _round16(v):
        return -(-v // 16) * 16

    block_q = min(block_q, _round16(max(q_len, 16)))
    block_k = min(block_k, _round16(max(kv_len, 16)))
    q_pad = _cdiv(q_len, block_q) * block_q - q_len
    k_pad = _cdiv(kv_len, block_k) * block_k - kv_len
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, k_pad), (0, 0)))

    tq, tk = q_len + q_pad, kv_len + k_pad
    num_q_blocks, num_k_blocks = tq // block_q, tk // block_k

    # Flatten batch*heads into grid dim 0; KV heads resolved via index maps.
    q_spec = pl.BlockSpec(
        (1, block_q, head_dim),
        lambda bh, qi, ki: (bh, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_index = lambda bh, qi, ki: ((bh % num_heads) // group + (bh // num_heads) * num_kv_heads, ki, 0)
    k_spec = pl.BlockSpec((1, block_k, head_dim), kv_index, memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, head_dim), kv_index, memory_space=pltpu.VMEM)

    q_r = q.reshape(batch * num_heads, tq, head_dim)
    k_r = k.reshape(batch * num_kv_heads, tk, head_dim)
    v_r = v.reshape(batch * num_kv_heads, tk, head_dim)

    in_specs = [q_spec, k_spec, v_spec]
    inputs = [q_r, k_r, v_r]
    if bias is not None:
        bb, bh_, bq_, bk_ = bias.shape
        if bq_ != tq or bk_ != tk:
            bias = jnp.pad(
                bias,
                ((0, 0), (0, 0), (0, tq - bq_), (0, tk - bk_)),
                constant_values=0.0,
            )
        bias_r = bias.reshape(bb * bh_, tq, tk)
        b_batch, b_heads = bb, bh_

        def bias_index(bh, qi, ki):
            b = bh // num_heads
            h = bh % num_heads
            idx = (b % b_batch) * b_heads + (h % b_heads)
            return (idx, qi, ki)

        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), bias_index, memory_space=pltpu.VMEM)
        )
        inputs.append(bias_r)
        kernel = functools.partial(
            _fwd_kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, q_len=q_len, kv_len=kv_len,
            num_k_blocks=num_k_blocks,
        )
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, a_s):
            _fwd_kernel(
                q_ref, k_ref, v_ref, None, o_ref, m_s, l_s, a_s,
                sm_scale=sm_scale, causal=causal,
                block_q=block_q, block_k=block_k, q_len=q_len, kv_len=kv_len,
                num_k_blocks=num_k_blocks,
            )

    out = pl.pallas_call(
        kernel,
        grid=(batch * num_heads, num_q_blocks, num_k_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, head_dim), lambda bh, qi, ki: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch * num_heads, tq, head_dim), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * tq * tk * head_dim,
            bytes_accessed=(q_r.size + k_r.size + v_r.size) * q.dtype.itemsize,
            transcendentals=batch * num_heads * tq * tk,
        ),
    )(*inputs)

    out = out.reshape(batch, num_heads, tq, head_dim)
    if q_pad:
        out = out[:, :, :q_len]
    return out


def mha_reference(q, k, v, bias=None, causal: bool = False,
                  sm_scale: Optional[float] = None):
    """Naive attention in plain XLA — numerics reference + CPU/backward path."""
    *_, q_len, head_dim = q.shape
    kv_len = k.shape[-2]
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    num_heads, num_kv_heads = q.shape[1], k.shape[1]
    if num_kv_heads != num_heads:
        rep = num_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
        s = jnp.where(row >= col, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def flash_attention(
    q, k, v, bias=None, causal: bool = False,
    sm_scale: Optional[float] = None, block_q: int = 512, block_k: int = 1024,
):
    """Flash attention; pallas on TPU unless the whole score tensor is small
    (naive XLA is slightly faster there AND the memory cost is trivial —
    at training scale naive's materialized (B,H,Tq,Tk) f32 probs, saved for
    backward, OOM a 16 GB chip)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    scores_elems = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    big = scores_elems >= (1 << 22) and q.shape[-2] >= 64 and k.shape[-2] >= 64
    if big and jax.default_backend() in ("tpu", "axon"):
        return _flash_attention_forward(
            q, k, v, bias, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k,
        )
    return mha_reference(q, k, v, bias, causal=causal, sm_scale=sm_scale)


def _fwd_rule(q, k, v, bias, causal, sm_scale, block_q, block_k):
    out = flash_attention(q, k, v, bias, causal, sm_scale, block_q, block_k)
    return out, (q, k, v, bias)


def _bwd_rule(causal, sm_scale, block_q, block_k, res, g):
    q, k, v, bias = res

    def ref(q, k, v, bias):
        return mha_reference(q, k, v, bias, causal=causal, sm_scale=sm_scale)

    if bias is None:
        _, vjp = jax.vjp(lambda q, k, v: ref(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(ref, q, k, v, bias)
    return vjp(g)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
