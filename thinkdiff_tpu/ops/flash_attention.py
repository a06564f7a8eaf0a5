"""Pallas TPU flash attention, forward + backward.

Replaces the attention math the reference gets from external CUDA libraries
(vLLM PagedAttention, torch sdpa inside HF models — reference
thinkdiff/models/*.py all delegate attention to those deps).

Design:
  - online-softmax blockwise forward, grid (batch*heads, q_blocks, k_blocks)
    with the k dimension innermost so VMEM scratch (m, l, acc) carries across
    k blocks for a fixed q block (TPU grids execute sequentially); the
    forward also emits the row logsumexp for the backward.
  - GQA without materializing repeated KV heads: the k/v BlockSpec index maps
    fold the query head onto its KV group.
  - optional additive bias (T5 relative position bias), broadcast over batch
    and/or heads via index-map arithmetic — and a SEPARATE ``kv_mask``
    (B, Tk) validity input, so callers never materialize a broadcast
    (B, H, Tq, Tk) mask tensor (that bias alone is ~134 MB of HBM traffic
    per layer at the aligner operating point).
  - causal masking computed from iota inside the kernel (no bias tensor).
  - backward = two Pallas kernels (FlashAttention-2 style): a dq kernel
    (k innermost) and a dk/dv kernel (q innermost), both recomputing p from
    the saved logsumexp; dbias falls back to an XLA recompute VJP — in this
    framework the bias never depends on trainable params (T5 rel-bias is
    frozen), so that path only triggers for full-T5 finetuning.

Shapes: q (B, Hq, Tq, D); k, v (B, Hkv, Tk, D); Hq % Hkv == 0.
bias: broadcastable to (B, Hq, Tq, Tk) (leading dims may be 1).
kv_mask: (B, Tk) int, 1 = valid key position.
q/kv_segment_ids: (B, Tq)/(B, Tk) int — sequence-packing support (t5x
convention): position i may attend j only when their ids are EQUAL. Use
ids >= 1 for real tokens and 0 for padding (padded KV then never matches a
real query). Carried as two (B, T) row vectors — per-pair packing masks
never materialize, same reasoning as kv_mask.
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


def _round16(v: int) -> int:
    return -(-v // 16) * 16


# =========================== forward ========================================


LOG2E = 1.4426950408889634  # log2(e): softmax runs in the exp2 domain
LN2 = 0.6931471805599453


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref, qseg_ref, kseg_ref,
    o_ref, lse_ref, m_scratch, l_scratch, acc_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    q_len: int, kv_len: int, num_k_blocks: int,
):
    """Forward block step. Two VPU-diet properties (measured at the
    CogVideoX shape B2 H48 T17776 D64, where softmax VPU work — not the
    depth-halved MXU — is the wall; PERF.md round-4 kernel table):

      - exp2 domain: log2(e) is folded into the q prescale, so the online
        softmax uses the native exp2 op and the running max/rescale never
        pay the base conversion; the emitted logsumexp is converted back
        to natural log once per row.
      - lazy tail masking: when the only mask is the pad-to-block-multiple
        kv boundary (no kv_mask/segments/causal — every diffusion
        inference call), interior k blocks skip the iota/compare/where
        entirely; only the final k block pays it.
    """
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def _compute(boundary: bool):
        # keep bf16 operands bf16: the MXU multiplies bf16 natively with
        # f32 accumulation; upcasting first would force multi-pass f32
        # matmuls. sm_scale*log2e is folded into the (cheap) q prescale.
        q = q_ref[0] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)  # (bq, d)
        k = k_ref[0]                                               # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (bq, bk)
        if bias_ref is not None:
            # bias is pre-scaled by log2(e) once in the wrapper (exp2 domain)
            s = s + bias_ref[0].astype(jnp.float32)

        need_mask = boundary or mask_ref is not None \
            or qseg_ref is not None or causal
        if need_mask:
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = col < kv_len
            if mask_ref is not None:
                mask = jnp.logical_and(mask, mask_ref[0] > 0)  # (1, bk) bcast
            if qseg_ref is not None:
                # packing: (bq, 1) == (1, bk) — same-segment pairs only
                mask = jnp.logical_and(mask, qseg_ref[0].T == kseg_ref[0])
            if causal:
                row = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                mask = jnp.logical_and(mask, row >= col)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]                             # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)            # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)                               # (bq, bk)
        alpha = jnp.exp2(m_prev - m_new)                      # (bq, 1)
        l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0]                                          # (bk, d)
        pv = jnp.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    # Interior blocks skip boundary masking; only blocks that can contain
    # the kv_len boundary (the last one — or every block when the other
    # masks are active anyway) pay the iota/compare/where.
    always_mask = mask_ref is not None or qseg_ref is not None or causal
    tail_pad = kv_len != num_k_blocks * block_k

    def _step(boundary):
        if causal:
            # Skip fully-masked key blocks above the diagonal.
            @pl.when(ki * block_k <= qi * block_q + (block_q - 1))
            def _():
                _compute(boundary)
        else:
            _compute(boundary)

    if always_mask or not tail_pad:
        _step(always_mask or tail_pad)
    else:
        @pl.when(ki < num_k_blocks - 1)
        def _interior():
            _step(False)

        @pl.when(ki == num_k_blocks - 1)
        def _tail():
            _step(True)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            # exp2-domain running max -> natural-log lse for the backward
            lse = m_scratch[:, :1] * LN2 + jnp.log(l_safe)    # (bq, 1)
            # emit COMPACT (1, 1, bq) rows — one small relayout per q
            # block. The previous (BH, tq, 128)-broadcast output buffer
            # cost 128x the HBM under TPU (8,128) tiling; at B32 H64 T128
            # x 48 attention ops those buffers alone were ~3 GB and OOMed
            # the w8a8 batch-32 training step (the scheduler keeps many
            # alive at once). The middle singleton keeps the block legal
            # (equal-to-array rule) at 8-sublane padding only.
            lse_ref[...] = lse.T[None]


def _pad_qkv(q, k, v, block_q, block_k):
    q_len, kv_len = q.shape[2], k.shape[2]
    q_pad = _cdiv(q_len, block_q) * block_q - q_len
    k_pad = _cdiv(kv_len, block_k) * block_k - kv_len
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
    return q, k, v, q_pad, k_pad


def _bias_inputs(bias, num_heads, tq, tk, block_q, block_k, grid_order="qk"):
    """-> (spec, reshaped bias) with broadcast-aware index map. grid_order:
    'qk' = grid (bh, qi, ki); 'kq' = grid (bh, ki, qi)."""
    bb, bh_, bq_, bk_ = bias.shape
    if bq_ != tq or bk_ != tk:
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, tq - bq_), (0, tk - bk_)),
            constant_values=0.0,
        )
    bias_r = bias.reshape(bb * bh_, tq, tk)

    def index(bh, *rest):
        # grids: fwd (bh, qi, ki); dq (bh, qi, sweep, ki); dkv (bh, ki, qi)
        qi, ki = (rest[0], rest[-1]) if grid_order == "qk" else (rest[-1], rest[0])
        bidx = bh // num_heads
        h = bh % num_heads
        return ((bidx % bb) * bh_ + (h % bh_), qi, ki)

    spec = pl.BlockSpec((1, block_q, block_k), index, memory_space=pltpu.VMEM)
    return spec, bias_r


def _row_vec_inputs(vec, num_heads, t, block, axis, grid_order="qk"):
    """(B, T) int row vector -> ((1, 1, block) spec, (B, 1, T) array).
    The singleton sublane dim keeps the block legal under TPU tiling (last
    two dims must divide (8, 128) or equal the array dims). ``axis``: which
    grid position indexes this vector ('q' or 'k')."""
    if vec.shape[1] != t:
        vec = jnp.pad(vec, ((0, 0), (0, t - vec.shape[1])))
    vec = vec.reshape(vec.shape[0], 1, t)

    def index(bh, *rest):
        # grids: fwd/dq 'qk' = (bh, qi[, sweep], ki); dkv 'kq' = (bh, ki, qi)
        if axis == "k":
            i = rest[-1] if grid_order == "qk" else rest[0]
        else:
            i = rest[0] if grid_order == "qk" else rest[-1]
        return (bh // num_heads, 0, i)

    spec = pl.BlockSpec((1, 1, block), index, memory_space=pltpu.VMEM)
    return spec, vec.astype(jnp.int32)


def _mask_inputs(kv_mask, num_heads, tk, block_k, grid_order="qk"):
    return _row_vec_inputs(kv_mask, num_heads, tk, block_k, "k", grid_order)


def _flash_attention_forward(
    q, k, v, bias, kv_mask=None, q_seg=None, kv_seg=None, *, causal: bool,
    sm_scale: float, block_q: int, block_k: int, return_lse: bool = False,
):
    batch, num_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    assert num_heads % num_kv_heads == 0
    group = num_heads // num_kv_heads

    block_q = min(block_q, _round16(max(q_len, 16)))
    block_k = min(block_k, _round16(max(kv_len, 16)))
    q, k, v, q_pad, k_pad = _pad_qkv(q, k, v, block_q, block_k)
    tq, tk = q_len + q_pad, kv_len + k_pad
    num_q_blocks, num_k_blocks = tq // block_q, tk // block_k

    # Flatten batch*heads into grid dim 0; KV heads resolved via index maps.
    q_spec = pl.BlockSpec(
        (1, block_q, head_dim), lambda bh, qi, ki: (bh, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_index = lambda bh, qi, ki: (
        (bh % num_heads) // group + (bh // num_heads) * num_kv_heads, ki, 0)
    k_spec = pl.BlockSpec((1, block_k, head_dim), kv_index, memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, head_dim), kv_index, memory_space=pltpu.VMEM)

    q_r = q.reshape(batch * num_heads, tq, head_dim)
    k_r = k.reshape(batch * num_kv_heads, tk, head_dim)
    v_r = v.reshape(batch * num_kv_heads, tk, head_dim)

    in_specs = [q_spec, k_spec, v_spec]
    inputs = [q_r, k_r, v_r]
    has_bias = bias is not None
    has_mask = kv_mask is not None
    has_seg = q_seg is not None
    assert has_seg == (kv_seg is not None), "segment ids come in pairs"
    if has_bias:
        # pre-scale once: the forward softmax runs in the exp2 domain
        spec, bias_r = _bias_inputs(bias.astype(jnp.float32) * LOG2E,
                                    num_heads, tq, tk, block_q, block_k)
        in_specs.append(spec)
        inputs.append(bias_r)
    if has_mask:
        spec, mask_r = _mask_inputs(kv_mask, num_heads, tk, block_k)
        in_specs.append(spec)
        inputs.append(mask_r)
    if has_seg:
        spec, qs_r = _row_vec_inputs(q_seg, num_heads, tq, block_q, "q")
        in_specs.append(spec)
        inputs.append(qs_r)
        spec, ks_r = _row_vec_inputs(kv_seg, num_heads, tk, block_k, "k")
        in_specs.append(spec)
        inputs.append(ks_r)

    def kernel(*refs):
        i = 3
        b_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        m_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        qs_ref = refs[i] if has_seg else None
        ks_ref = refs[i + 1] if has_seg else None
        i += 2 if has_seg else 0
        o_ref = refs[i]
        lse_ref = refs[i + 1] if return_lse else None
        scr = refs[i + 1 + (1 if return_lse else 0):]
        _fwd_kernel(
            refs[0], refs[1], refs[2], b_ref, m_ref, qs_ref, ks_ref,
            o_ref, lse_ref, *scr, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, q_len=q_len, kv_len=kv_len,
            num_k_blocks=num_k_blocks,
        )

    out_specs = [pl.BlockSpec(
        (1, block_q, head_dim), lambda bh, qi, ki: (bh, qi, 0),
        memory_space=pltpu.VMEM,
    )]
    out_shapes = [jax.ShapeDtypeStruct((batch * num_heads, tq, head_dim), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec(
            (1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi),
            memory_space=pltpu.VMEM,
        ))
        out_shapes.append(
            jax.ShapeDtypeStruct((batch * num_heads, 1, tq), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(batch * num_heads, num_q_blocks, num_k_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
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

    out = outs[0].reshape(batch, num_heads, tq, head_dim)
    if q_pad:
        out = out[:, :, :q_len]
    if return_lse:
        return out, outs[1]                  # compact (BH, 1, tq) residual
    return out


# =========================== backward =======================================


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, bias_ref, mask_ref,
    qseg_ref, kseg_ref, dq_ref, delta_ref, dq_scratch, delta_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    kv_len: int, num_k_blocks: int,
):
    """Two sweeps over k for each q block (grid dim 2): sweep 0 accumulates
    delta = rowsum(p * dp) (the FA2 delta, computed WITHOUT saving the
    attention output as a residual — delta = sum_d dO*O = rowsum(p*dp));
    sweep 1 computes ds and dq. delta is also emitted for the dk/dv kernel."""
    qi = pl.program_id(1)
    sweep = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(jnp.logical_and(sweep == 0, ki == 0))
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)
        delta_scratch[:] = jnp.zeros_like(delta_scratch)

    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * sm_scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if mask_ref is not None:
            mask = jnp.logical_and(mask, mask_ref[0] > 0)
        if qseg_ref is not None:
            mask = jnp.logical_and(mask, qseg_ref[0].T == kseg_ref[0])
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, row >= col)
        s = jnp.where(mask, s, NEG_INF)

        lse = lse_ref[0].T                                     # (bq, 1)
        p = jnp.exp(s - lse)                                   # (bq, bk)
        do = do_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (bq, bk)

        @pl.when(sweep == 0)
        def _accum_delta():
            d = jnp.sum(p * dp, axis=-1, keepdims=True)        # (bq, 1)
            delta_scratch[:] = delta_scratch[:] + jnp.broadcast_to(
                d, delta_scratch.shape)

        @pl.when(sweep == 1)
        def _accum_dq():
            delta = delta_scratch[:, :1]                       # (bq, 1)
            ds = p * (dp - delta)
            dq_scratch[:] = dq_scratch[:] + sm_scale * jnp.dot(
                ds, k, preferred_element_type=jnp.float32)

    if causal:
        @pl.when(ki * block_k <= qi * block_q + (block_q - 1))
        def _():
            _compute()
    else:
        _compute()

    @pl.when(jnp.logical_and(sweep == 0, ki == num_k_blocks - 1))
    def _emit_delta():
        delta_ref[...] = delta_scratch[:, :1].T[None]          # (1, 1, bq)

    @pl.when(jnp.logical_and(sweep == 1, ki == num_k_blocks - 1))
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref, mask_ref,
    qseg_ref, kseg_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    kv_len: int, num_q_blocks: int,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * sm_scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (bq, bk)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if mask_ref is not None:
            mask = jnp.logical_and(mask, mask_ref[0] > 0)
        if qseg_ref is not None:
            mask = jnp.logical_and(mask, qseg_ref[0].T == kseg_ref[0])
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, row >= col)
        s = jnp.where(mask, s, NEG_INF)

        lse = lse_ref[0].T                                     # (bq, 1)
        p = jnp.exp(s - lse)                                   # (bq, bk)
        do = do_ref[0].astype(jnp.float32)                     # (bq, d)
        dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (bk, d)
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0].T                                 # (bq, 1)
        ds = p * (dp - delta)                                  # (bq, bk)
        dk_scratch[:] = dk_scratch[:] + sm_scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (bk, d)

    if causal:
        @pl.when(qi * block_q + (block_q - 1) >= ki * block_k)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_attention_backward(
    q, k, v, bias, kv_mask, q_seg, kv_seg, lse, g, *, causal: bool,
    sm_scale: float, block_q: int, block_k: int,
):
    """FlashAttention-2 backward: dq kernel (two sweeps over k: delta then
    dq) + dk/dv kernel (q innermost); p recomputed from the saved row
    logsumexp. The attention OUTPUT is not a residual — delta comes from
    rowsum(p*dp) inside the dq kernel, saving (B,H,Tq,D) of HBM per layer."""
    batch, num_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    group = num_heads // num_kv_heads

    block_q = min(block_q, _round16(max(q_len, 16)))
    block_k = min(block_k, _round16(max(kv_len, 16)))
    q, k, v, q_pad, k_pad = _pad_qkv(q, k, v, block_q, block_k)
    g_p = jnp.pad(g, ((0, 0), (0, 0), (0, q_pad), (0, 0))) if q_pad else g
    tq, tk = q_len + q_pad, kv_len + k_pad
    num_q_blocks, num_k_blocks = tq // block_q, tk // block_k

    q_r = q.reshape(batch * num_heads, tq, head_dim)
    k_r = k.reshape(batch * num_kv_heads, tk, head_dim)
    v_r = v.reshape(batch * num_kv_heads, tk, head_dim)
    do_r = g_p.reshape(batch * num_heads, tq, head_dim)
    assert lse.shape == (batch * num_heads, 1, tq), lse.shape

    kv_index_qk = lambda bh, qi, sw, ki: (
        (bh % num_heads) // group + (bh // num_heads) * num_kv_heads, ki, 0)
    kv_index_kq = lambda bh, ki, qi: (
        (bh % num_heads) // group + (bh // num_heads) * num_kv_heads, ki, 0)

    # row vectors (lse/delta) stay COMPACT (BH, 1, tq): a 128-lane
    # broadcast copy costs 128x HBM under (8,128) tiling (measured OOM at
    # w8a8 batch 32); kernels pay one small relayout per block instead
    row_spec_qk = pl.BlockSpec(
        (1, 1, block_q), lambda bh, qi, sw, ki: (bh, 0, qi),
        memory_space=pltpu.VMEM)
    row_spec_kq = pl.BlockSpec(
        (1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi),
        memory_space=pltpu.VMEM)

    has_bias = bias is not None
    has_mask = kv_mask is not None
    has_seg = q_seg is not None

    # ---- dq (+ delta, emitted for the dk/dv kernel) ----
    in_specs = [
        pl.BlockSpec((1, block_q, head_dim),
                     lambda bh, qi, sw, ki: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, head_dim), kv_index_qk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, head_dim), kv_index_qk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, head_dim),
                     lambda bh, qi, sw, ki: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        row_spec_qk,
    ]
    inputs = [q_r, k_r, v_r, do_r, lse]
    if has_bias:
        spec, bias_r = _bias_inputs(bias, num_heads, tq, tk, block_q, block_k, "qk")
        in_specs.append(spec)
        inputs.append(bias_r)
    if has_mask:
        spec, mask_r = _mask_inputs(kv_mask, num_heads, tk, block_k, "qk")
        in_specs.append(spec)
        inputs.append(mask_r)
    if has_seg:
        spec, qs_r = _row_vec_inputs(q_seg, num_heads, tq, block_q, "q", "qk")
        in_specs.append(spec)
        inputs.append(qs_r)
        spec, ks_r = _row_vec_inputs(kv_seg, num_heads, tk, block_k, "k", "qk")
        in_specs.append(spec)
        inputs.append(ks_r)

    def dq_kernel(*refs):
        i = 5
        b_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        m_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        qs_ref = refs[i] if has_seg else None
        ks_ref = refs[i + 1] if has_seg else None
        i += 2 if has_seg else 0
        _dq_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4],
            b_ref, m_ref, qs_ref, ks_ref,
            refs[i], refs[i + 1], refs[i + 2], refs[i + 3],
            sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
            num_k_blocks=num_k_blocks,
        )

    dq, delta = pl.pallas_call(
        dq_kernel,
        grid=(batch * num_heads, num_q_blocks, 2, num_k_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, block_q, head_dim), lambda bh, qi, sw, ki: (bh, qi, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, block_q), lambda bh, qi, sw, ki: (bh, 0, qi),
                memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch * num_heads, tq, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch * num_heads, 1, tq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, head_dim), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * batch * num_heads * tq * tk * head_dim,
            bytes_accessed=2 * (q_r.size + k_r.size + v_r.size + do_r.size)
            * q.dtype.itemsize,
            transcendentals=2 * batch * num_heads * tq * tk,
        ),
    )(*inputs)

    # ---- dk/dv (per QUERY head; groups summed in XLA — group=1 on all
    # training paths here, so the extra buffer only exists under GQA) ----
    in_specs = [
        pl.BlockSpec((1, block_q, head_dim), lambda bh, ki, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, head_dim), kv_index_kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, head_dim), kv_index_kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, head_dim), lambda bh, ki, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        row_spec_kq, row_spec_kq,
    ]
    inputs = [q_r, k_r, v_r, do_r, lse, delta]  # delta: dq kernel's output
    if has_bias:
        spec, bias_r = _bias_inputs(bias, num_heads, tq, tk, block_q, block_k, "kq")
        in_specs.append(spec)
        inputs.append(bias_r)
    if has_mask:
        spec, mask_r = _mask_inputs(kv_mask, num_heads, tk, block_k, "kq")
        in_specs.append(spec)
        inputs.append(mask_r)
    if has_seg:
        spec, qs_r = _row_vec_inputs(q_seg, num_heads, tq, block_q, "q", "kq")
        in_specs.append(spec)
        inputs.append(qs_r)
        spec, ks_r = _row_vec_inputs(kv_seg, num_heads, tk, block_k, "k", "kq")
        in_specs.append(spec)
        inputs.append(ks_r)

    def dkv_kernel(*refs):
        i = 6
        b_ref = refs[i] if has_bias else None
        i += 1 if has_bias else 0
        m_ref = refs[i] if has_mask else None
        i += 1 if has_mask else 0
        qs_ref = refs[i] if has_seg else None
        ks_ref = refs[i + 1] if has_seg else None
        i += 2 if has_seg else 0
        _dkv_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], refs[5],
            b_ref, m_ref, qs_ref, ks_ref,
            refs[i], refs[i + 1], refs[i + 2], refs[i + 3],
            sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
            num_q_blocks=num_q_blocks,
        )

    kv_spec = pl.BlockSpec(
        (1, block_k, head_dim), lambda bh, ki, qi: (bh, ki, 0),
        memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(batch * num_heads, num_k_blocks, num_q_blocks),
        in_specs=in_specs,
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch * num_heads, tk, head_dim), k.dtype),
            jax.ShapeDtypeStruct((batch * num_heads, tk, head_dim), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, head_dim), jnp.float32),
            pltpu.VMEM((block_k, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * batch * num_heads * tq * tk * head_dim,
            bytes_accessed=(q_r.size + k_r.size + v_r.size + do_r.size)
            * q.dtype.itemsize,
            transcendentals=batch * num_heads * tq * tk,
        ),
    )(*inputs)

    dq = dq.reshape(batch, num_heads, tq, head_dim)[:, :, :q_len]
    dk = dk.reshape(batch, num_kv_heads, group, tk, head_dim)
    dv = dv.reshape(batch, num_kv_heads, group, tk, head_dim)
    dk = dk.sum(axis=2)[:, :, :kv_len].astype(k.dtype)
    dv = dv.sum(axis=2)[:, :, :kv_len].astype(v.dtype)
    return dq, dk, dv


# =========================== reference + dispatch ===========================


def mha_reference(q, k, v, bias=None, kv_mask=None, causal: bool = False,
                  sm_scale: Optional[float] = None, q_segment_ids=None,
                  kv_segment_ids=None):
    """Naive attention in plain XLA — numerics reference + CPU/small path."""
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
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, NEG_INF)
    if q_segment_ids is not None:
        same = (q_segment_ids[:, None, :, None]
                == kv_segment_ids[:, None, None, :])
        s = jnp.where(same, s, NEG_INF)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
        s = jnp.where(row >= col, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _use_pallas(q, k) -> bool:
    """Pallas on TPU unless the whole score tensor is small (naive XLA is
    slightly faster there AND its memory cost is trivial — at training scale
    naive's materialized (B,H,Tq,Tk) f32 probs, saved for backward, OOM a
    16 GB chip)."""
    scores_elems = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    big = scores_elems >= (1 << 22) and q.shape[-2] >= 64 and k.shape[-2] >= 64
    return big and jax.default_backend() in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention(
    q, k, v, bias=None, kv_mask=None, causal: bool = False,
    sm_scale: Optional[float] = None, block_q: int = 512, block_k: int = 1024,
    q_segment_ids=None, kv_segment_ids=None,
):
    """Flash attention with a Pallas forward AND backward on TPU.

    kv_mask (B, Tk) carries key validity separately from the additive bias so
    callers never materialize a (B, H, Tq, Tk) mask tensor. q/kv_segment_ids
    ((B, Tq)/(B, Tk), real tokens >= 1, padding 0) add same-segment masking
    for packed sequences at the same O(B*T) cost.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if _use_pallas(q, k):
        return _flash_attention_forward(
            q, k, v, bias, kv_mask, q_segment_ids, kv_segment_ids,
            causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k,
        )
    return mha_reference(q, k, v, bias, kv_mask, causal=causal,
                         sm_scale=sm_scale, q_segment_ids=q_segment_ids,
                         kv_segment_ids=kv_segment_ids)


def _fwd_rule(q, k, v, bias, kv_mask, causal, sm_scale, block_q, block_k,
              q_segment_ids, kv_segment_ids):
    # symbolic_zeros=True wraps diff-args as CustomVJPPrimal: .value is the
    # array, .perturbed says whether its gradient is actually needed — used
    # to decide whether dbias must be computed (it never is for the in-tree
    # training paths: T5 rel-bias tables are frozen).
    # None args pass through unwrapped (empty pytrees)
    unwrap = lambda x: x.value if hasattr(x, "value") else x
    bias_perturbed = bool(getattr(bias, "perturbed", False))
    q, k, v = unwrap(q), unwrap(k), unwrap(v)
    bias, kv_mask = unwrap(bias), unwrap(kv_mask)
    q_seg, kv_seg = unwrap(q_segment_ids), unwrap(kv_segment_ids)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if _use_pallas(q, k) and not bias_perturbed:
        out, lse = _flash_attention_forward(
            q, k, v, bias, kv_mask, q_seg, kv_seg, causal=causal,
            sm_scale=sm_scale, block_q=block_q, block_k=block_k,
            return_lse=True,
        )
        # NOTE: `out` is deliberately NOT a residual (saves (B,H,Tq,D) HBM
        # per layer); the backward reconstructs delta inside the dq kernel.
        return out, (q, k, v, bias, kv_mask, q_seg, kv_seg, lse)
    out = flash_attention(q, k, v, bias, kv_mask, causal, sm_scale,
                          block_q, block_k, q_seg, kv_seg)
    return out, (q, k, v, bias, kv_mask, q_seg, kv_seg, None)


# Backward block sizes are halved vs forward: the backward keeps ~3 (bq, bk)
# f32 temporaries (p, dp, ds) live in VMEM at once.
def _bwd_blocks(block_q: int, block_k: int):
    return min(block_q, 256), min(block_k, 512)


def _use_pallas_bwd(q_len: int, kv_len: int) -> bool:
    """The Pallas backward wins at LONG sequences (naive recompute's
    transient (B,H,Tq,Tk) f32 probs blow HBM and its flops scale T^2); at
    short sequences (aligner training: Tq=Tk<=128, attention ~1% of step
    flops) the fused XLA recompute is measurably faster — switching the
    backward to Pallas at the aligner operating point cost 21% end-to-end
    (84.7 -> 66.6 samples/s, w8a8 batch 16). The recompute's transient
    probs are schedulable (unlike the forward's former fat lse buffers,
    which accumulated across all 48 attention ops — see the compact-lse
    note in _fwd_kernel)."""
    return q_len * kv_len >= (1 << 17)  # e.g. 512x256+


def _bwd_rule(causal, sm_scale, block_q, block_k, res, g):
    q, k, v, bias, kv_mask, q_seg, kv_seg, lse = res
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if hasattr(g, "aval") and isinstance(
        g, jax.custom_derivatives.SymbolicZero
    ):
        zero = lambda x: None if x is None else jnp.zeros_like(x)
        return (zero(q), zero(k), zero(v), zero(bias), None, None, None)

    if lse is None or not _use_pallas_bwd(q.shape[2], k.shape[2]):
        # short-sequence/CPU path — or bias itself needs a gradient (full-T5
        # finetuning): recompute VJP through the naive reference.
        def ref(q, k, v, bias):
            return mha_reference(q, k, v, bias, kv_mask, causal=causal,
                                 sm_scale=sm_scale, q_segment_ids=q_seg,
                                 kv_segment_ids=kv_seg)

        _, vjp = jax.vjp(ref, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
        return dq, dk, dv, (None if bias is None else dbias), None, None, None

    bq, bk = _bwd_blocks(block_q, block_k)
    dq, dk, dv = _flash_attention_backward(
        q, k, v, bias, kv_mask, q_seg, kv_seg, lse, g, causal=causal,
        sm_scale=sm_scale, block_q=bq, block_k=bk,
    )
    # bias was not perturbed on this path (checked in _fwd_rule), so its
    # cotangent is exactly zero.
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias, None, None, None


flash_attention.defvjp(_fwd_rule, _bwd_rule, symbolic_zeros=True)
