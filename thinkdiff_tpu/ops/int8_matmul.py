"""Pallas int8 weight-only matmul for skinny activations (decode gemv).

XLA's int8->bf16 convert does not fuse into narrow matvecs (measured 528 ms
vs 7 ms per decode step for the 2B decoder), so the decode path needs a
kernel that streams int8 weights at HBM bandwidth and dequantizes in VMEM.

y (R, N) = x (R, K) @ Wq (K, N) * scale (N,)   with R small (1..16 rows).

Grid over N blocks; K is streamed in VMEM-sized chunks inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(x_ref, w_ref, s_ref, o_ref, *, block_k: int, k_total: int):
    """x (R, K) f32/bf16; w block (K, BN) int8; s (BN,); o (R, BN)."""
    num_k = _cdiv(k_total, block_k)

    def body(i, acc):
        k0 = i * block_k
        x_blk = x_ref[:, pl.ds(k0, block_k)].astype(jnp.float32)
        w_blk = w_ref[pl.ds(k0, block_k), :].astype(jnp.float32)
        return acc + jax.lax.dot_general(
            x_blk, w_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros((x_ref.shape[0], o_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(0, num_k, body, acc)
    o_ref[:, :] = (acc * s_ref[0, :].astype(jnp.float32)[None]).astype(o_ref.dtype)


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def int8_matmul(x, w_q, scale, out_dtype=None, block_n: int = 0,
                block_k: int = 0):
    """x (..., K) @ int8 w_q (K, N) * scale (N,) -> (..., N).

    NEVER pads/copies the weight (inside a decode scan that would re-copy
    every weight every step): block sizes are chosen as exact divisors of
    (K, N). Falls back to plain XLA for non-128-aligned dims.
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w_q.shape[1]
    if not block_n or n % block_n:
        block_n = _pick_block(n, (1024, 896, 768, 640, 512, 384, 256, 128))
    if not block_k or k % block_k:
        block_k = _pick_block(k, (1024, 896, 768, 640, 512, 384, 256, 128))
    if not block_n or not block_k:
        return int8_matmul_reference(x, w_q, scale, out_dtype)

    x2 = x.reshape(-1, k)
    r = x2.shape[0]
    r_pad = _cdiv(r, 8) * 8 - r  # rows: pad activations only (tiny)
    if r_pad:
        x2 = jnp.pad(x2, ((0, r_pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, k_total=k),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((r + r_pad, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r + r_pad, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + r_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (r + r_pad) * k * n,
            bytes_accessed=k * n + (r + r_pad) * k * 2,
            transcendentals=0,
        ),
    )(x2, w_q, scale.reshape(1, -1))
    out = out[:r]
    return out.reshape(*lead, n)


def int8_matmul_reference(x, w_q, scale, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    y = jnp.dot(x.astype(jnp.float32), w_q.astype(jnp.float32))
    return (y * scale.astype(jnp.float32)[None]).astype(out_dtype)


# ===================== tiled wide matmul (training path) =====================
#
# XLA does NOT fuse the int8->bf16 weight convert into large dots either on
# this toolchain: each frozen-weight use materializes a bf16 copy, adding a
# params-proportional fixed cost (~67 ms/step measured at the aligner
# operating point, batch 16). These kernels stream int8 straight from HBM
# for both the forward (x @ W) and the input-gradient (g @ W^T) — frozen
# weights have no dW — cutting the weight traffic to the int8 bytes.


def _wide_fwd_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, num_k: int):
    """grid (nR, nN, nK) k innermost: o(bR,bN) = sum_k x(bR,bK) @ w(bK,bN)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16 MXU dot with f32 accumulation: an f32 dot would run the MXU at
    # multi-pass rate; int8->bf16 convert is VPU-cheap per tile
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == num_k - 1)
    def _fin():
        s = s_ref[0, :].astype(jnp.float32)
        o_ref[...] = (acc_ref[:] * s[None]).astype(o_ref.dtype)


def _wide_bwd_kernel(g_ref, w_ref, s_ref, o_ref, acc_ref, *, num_n: int):
    """grid (nR, nK, nN) n innermost: dx(bR,bK) = sum_n (g*s)(bR,bN) @ w(bK,bN)^T."""
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = (g_ref[...].astype(jnp.float32)
         * s_ref[0, :].astype(jnp.float32)[None]).astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ni == num_n - 1)
    def _fin():
        o_ref[...] = acc_ref[:].astype(o_ref.dtype)


def _wide_blocks(r, k, n):
    # Row blocks as LARGE as VMEM allows: every extra row block re-streams
    # the whole weight from HBM. bR=2048, bN<=512: acc 4 MB f32 + x 2 MB.
    block_r = min(2048, _cdiv(r, 8) * 8)
    block_n = _pick_block(n, (512, 384, 256, 128))
    block_k = _pick_block(k, (512, 384, 256, 128))
    return block_r, block_k, block_n


def _int8_matmul_wide_fwd(x2, w_q, scale, out_dtype):
    r, k = x2.shape
    n = w_q.shape[1]
    block_r, block_k, block_n = _wide_blocks(r, k, n)
    r_pad = _cdiv(r, block_r) * block_r - r
    if r_pad:
        x2 = jnp.pad(x2, ((0, r_pad), (0, 0)))
    grid = ((r + r_pad) // block_r, n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_wide_fwd_kernel, num_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + r_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_r, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (r + r_pad) * k * n,
            bytes_accessed=k * n + (r + r_pad) * k * 2 + (r + r_pad) * n * 2,
            transcendentals=0,
        ),
    )(x2, w_q, scale.reshape(1, -1))
    return out[:r] if r_pad else out


def _int8_matmul_wide_bwd(g2, w_q, scale, out_dtype):
    r, n = g2.shape
    k = w_q.shape[0]
    block_r, block_k, block_n = _wide_blocks(r, k, n)
    r_pad = _cdiv(r, block_r) * block_r - r
    if r_pad:
        g2 = jnp.pad(g2, ((0, r_pad), (0, 0)))
    grid = ((r + r_pad) // block_r, k // block_k, n // block_n)
    out = pl.pallas_call(
        functools.partial(_wide_bwd_kernel, num_n=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, block_n), lambda i, j, nn: (i, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, nn: (j, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, nn: (0, nn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, block_k), lambda i, j, nn: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + r_pad, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_r, block_k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (r + r_pad) * k * n,
            bytes_accessed=k * n + (r + r_pad) * n * 2 + (r + r_pad) * k * 2,
            transcendentals=0,
        ),
    )(g2, w_q, scale.reshape(1, -1))
    return out[:r] if r_pad else out


def _wide_supported(k: int, n: int) -> bool:
    return bool(_pick_block(n, (512, 384, 256, 128))
                and _pick_block(k, (512, 384, 256, 128)))


@jax.custom_vjp
def int8_matmul_wide(x, w_q, scale):
    """x (..., K) @ int8 w_q (K, N) * scale (N,) -> (..., N), streaming the
    weight in int8 for BOTH forward and input-gradient (frozen weight: no
    dW). Falls back to the XLA reference off-TPU / for unsupported dims."""
    lead, k = x.shape[:-1], x.shape[-1]
    if (jax.default_backend() not in ("tpu", "axon")
            or not _wide_supported(k, w_q.shape[1])):
        return int8_matmul_reference(x, w_q, scale, x.dtype)
    out = _int8_matmul_wide_fwd(x.reshape(-1, k), w_q, scale, x.dtype)
    return out.reshape(*lead, w_q.shape[1])


def _wide_fwd_rule(x, w_q, scale):
    return int8_matmul_wide(x, w_q, scale), (x, w_q, scale)


def _wide_bwd_rule(res, g):
    x, w_q, scale = res
    lead, k = x.shape[:-1], x.shape[-1]
    n = w_q.shape[1]
    if (jax.default_backend() not in ("tpu", "axon")
            or not _wide_supported(k, n)):
        dx = jnp.dot(
            g.astype(jnp.float32) * scale.astype(jnp.float32),
            w_q.astype(jnp.float32).T,
        ).astype(x.dtype).reshape(x.shape)
    else:
        dx = _int8_matmul_wide_bwd(
            g.reshape(-1, n), w_q, scale, x.dtype
        ).reshape(x.shape)
    # frozen weight: dW/dscale are never consumed (and would be huge)
    return dx, None, None


int8_matmul_wide.defvjp(_wide_fwd_rule, _wide_bwd_rule)


# ======================= fused s8 x s8 matmul (w8a8) ========================
#
# True int8 MXU path with the dequant epilogue FUSED: the int32 accumulator
# lives in VMEM scratch and is scaled (per-row activation scale x per-column
# weight scale) on the final K step of each output tile — the (M, N) int32
# intermediate never touches HBM. This is the round-4 verdict's named lever:
# the XLA w8a8 dot at training shapes (rows <= 2048) pays an unfused
# int32-accumulate + dequant epilogue (PERF.md "MFU ceiling analysis", 41%
# of s8 peak). Activation quantization stays an XLA pre-pass (per-row absmax
# needs full K before tiling; it is one bandwidth-bound read of x that XLA
# fuses with the producer).


def _s8_fwd_kernel(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref, *,
                   num_k: int):
    """grid (nR, nN, nK) k innermost; x (bR,bK) s8, w (bK,bN) s8,
    sx (bR,) f32 per-row act scales, s (bN,) f32 per-col weight scales."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(ki == num_k - 1)
    def _fin():
        sx = sx_ref[0, :].astype(jnp.float32)
        s = s_ref[0, :].astype(jnp.float32)
        o_ref[...] = (acc_ref[:].astype(jnp.float32)
                      * sx[:, None] * s[None]).astype(o_ref.dtype)


def _s8_blocks(r, k, n, contract="k"):
    # int8 min tile is (32, 128); acc (bR, bN or bR, bK) int32 scratch.
    # The CONTRACTION dim wants the largest block VMEM allows: fewer grid
    # steps per output tile amortizes Mosaic's per-step overhead (measured
    # qkv m=1024: bk 512 -> 4096 moves 83.7 -> 96.2 TF/s). At bR=512,
    # b_contract=4096, b_out=512: tiles 2+2 MB s8 + 1 MB acc (+ double
    # buffering) fit comfortably.
    block_r = min(512, max(32, _cdiv(r, 32) * 32))
    big = (4096, 2048, 1024, 512, 384, 256, 128)
    small = (512, 384, 256, 128)
    if contract == "k":
        block_k = _pick_block(k, big)
        block_n = _pick_block(n, small)
    else:  # bwd: contraction over n
        block_n = _pick_block(n, big)
        block_k = _pick_block(k, small)
    return block_r, block_k, block_n


def _s8_matmul_fused(xq, sx, w_q, scale, out_dtype):
    """xq (R, K) int8, sx (R,) f32, w_q (K, N) int8, scale (N,) f32."""
    r, k = xq.shape
    n = w_q.shape[1]
    block_r, block_k, block_n = _s8_blocks(r, k, n)
    r_pad = _cdiv(r, block_r) * block_r - r
    if r_pad:
        xq = jnp.pad(xq, ((0, r_pad), (0, 0)))
        sx = jnp.pad(sx, (0, r_pad))
    grid = ((r + r_pad) // block_r, n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_s8_fwd_kernel, num_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i, j, kk: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + r_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_r, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (r + r_pad) * k * n,
            bytes_accessed=k * n + (r + r_pad) * k + (r + r_pad) * n * 2,
            transcendentals=0,
        ),
    )(xq, sx.reshape(1, -1), w_q, scale.reshape(1, -1))
    return out[:r] if r_pad else out


def _s8_bwd_kernel(g_ref, sg_ref, w_ref, o_ref, acc_ref, *, num_n: int):
    """grid (nR, nK, nN) n innermost; dx(bR,bK) = sum_n g(bR,bN) @ w(bK,bN)^T
    with g pre-quantized s8 rows (weight scales already folded into g)."""
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        g_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(ni == num_n - 1)
    def _fin():
        sg = sg_ref[0, :].astype(jnp.float32)
        o_ref[...] = (acc_ref[:].astype(jnp.float32)
                      * sg[:, None]).astype(o_ref.dtype)


def _s8_matmul_fused_bwd(gq, sg, w_q, out_dtype):
    """gq (R, N) int8 (scale-folded grads), sg (R,) f32, w_q (K, N) int8
    -> dx (R, K)."""
    r, n = gq.shape
    k = w_q.shape[0]
    block_r, block_k, block_n = _s8_blocks(r, k, n, contract="n")
    r_pad = _cdiv(r, block_r) * block_r - r
    if r_pad:
        gq = jnp.pad(gq, ((0, r_pad), (0, 0)))
        sg = jnp.pad(sg, (0, r_pad))
    grid = ((r + r_pad) // block_r, k // block_k, n // block_n)
    out = pl.pallas_call(
        functools.partial(_s8_bwd_kernel, num_n=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, block_n), lambda i, j, nn: (i, nn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i, j, nn: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, nn: (j, nn),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, block_k), lambda i, j, nn: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + r_pad, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_r, block_k), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (r + r_pad) * k * n,
            bytes_accessed=k * n + (r + r_pad) * n + (r + r_pad) * k * 2,
            transcendentals=0,
        ),
    )(gq, sg.reshape(1, -1), w_q)
    return out[:r] if r_pad else out


def s8_supported(k: int, n: int) -> bool:
    return bool(_pick_block(n, (512, 384, 256, 128))
                and _pick_block(k, (512, 384, 256, 128)))


# ================== fused QUANTIZE + s8 matmul (fwd, K <= 4096) =============
#
# When the whole contraction dim fits one VMEM block (d_model=4096 at the
# training shapes: qkv/kv/q/o/wi), the per-row absmax activation quant can
# run IN-kernel instead of as an XLA pre-pass: x streams in as bf16 once per
# row-tile, is quantized into an int8 scratch on the first N step, and the
# int8 copy + scales are reused for every N tile. Removes the separate
# absmax read+quant-write+re-read of x per projection (profiled ~8 ms/step
# of abs_reduce fusions + the xq HBM round-trip, PERF.md round-5 roofline).


def _s8_fwd_qx_kernel(x_ref, w_ref, s_ref, o_ref, xq_scr, sx_scr):
    """grid (nR, nN) n innermost; x (bR, K) bf16/f32, w (K, bN) s8,
    s (1, bN) f32; scratches xq (bR, K) s8, sx (bR, 128) f32."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quant():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1)
        sx = jnp.maximum(amax, 1e-30) / 127.0   # == quant._absmax_quant_rows
        xq_scr[...] = jnp.clip(jnp.round(xf / sx[:, None]),
                               -127, 127).astype(jnp.int8)
        sx_scr[...] = jnp.broadcast_to(sx[:, None], sx_scr.shape)

    acc = jax.lax.dot_general(
        xq_scr[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    s = s_ref[0, :].astype(jnp.float32)
    o_ref[...] = (acc.astype(jnp.float32)
                  * sx_scr[:, 0][:, None] * s[None]).astype(o_ref.dtype)


def s8_qx_supported(r: int, k: int, n: int) -> bool:
    """Single-K-block geometry: K 128-aligned and <= 4096 (VMEM: bf16 x
    tile + int8 scratch + double-buffered weight tiles at bR<=256)."""
    return bool(k <= 4096 and k % 128 == 0
                and _pick_block(n, (512, 384, 256, 128)))


def _s8_matmul_fused_qx(x, w_q, scale, out_dtype):
    """x (R, K) float (UNquantized), w_q (K, N) int8, scale (N,) f32.
    Quantize-in-kernel variant of _s8_matmul_fused; numerics identical to
    _absmax_quant_rows + s8 dot + epilogue."""
    r, k = x.shape
    n = w_q.shape[1]
    # bR 512 (= _s8_blocks): halving bR doubles the full-weight restreams
    # (w blocks re-fetch per row-tile) — measured 188.7 vs 195.6 samples/s
    # at bR 256. The N tile shrinks to 256 instead: bn only sets the
    # epilogue granularity (K is a single block), and bR=512/bn=512
    # overflows the 16 MB VMEM budget by 1.6 MB (compile-checked).
    block_r = min(512, max(32, _cdiv(r, 32) * 32))
    block_n = _pick_block(n, (256, 128))
    r_pad = _cdiv(r, block_r) * block_r - r
    if r_pad:
        x = jnp.pad(x, ((0, r_pad), (0, 0)))
    grid = ((r + r_pad) // block_r, n // block_n)
    out = pl.pallas_call(
        _s8_fwd_qx_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + r_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_r, k), jnp.int8),
                        pltpu.VMEM((block_r, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (r + r_pad) * k * n,
            bytes_accessed=k * n + (r + r_pad) * k * 2 + (r + r_pad) * n * 2,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, -1))
    return out[:r] if r_pad else out
