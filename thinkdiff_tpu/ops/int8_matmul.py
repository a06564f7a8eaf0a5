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
