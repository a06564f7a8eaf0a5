"""Microbench: the w8a8 training dots at the bench's packed operating point
(rows = 4 x 256 decoder tokens, flan-t5-xxl geometry) — XLA s8 dot with
unfused epilogue vs the fused Pallas s8 kernel vs bf16.

Shapes (fwd; bwd contracts N):
  qkv fused     (1024, 4096)  @ (4096, 12288)
  cross kv      (1024, 4096)  @ (4096,  8192)
  attn out      (1024, 4096)  @ (4096,  4096)
  wi gate-up    (1024, 4096)  @ (4096, 20480)
  wo            (1024, 10240) @ (10240, 4096)
  lm_head chunk (128,  4096)  @ (4096, 32128)

Usage: python scripts/bench_s8_matmul.py [--iters 30] [--rows 1024]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

S8_PEAK_TFS = 394.0   # v5e int8
BF16_PEAK_TFS = 197.0

SHAPES = [
    ("qkv", 4096, 12288),
    ("cross_kv", 4096, 8192),
    ("attn_out", 4096, 4096),
    ("wi_gate_up", 4096, 20480),
    ("wo", 10240, 4096),
]


def timeit(fn, args, iters):
    """Device-loop timing: `iters` serialized evaluations inside ONE jit
    (carry-dependent scan), so per-dispatch tunnel RTT (~1.5 ms on axon)
    amortizes to nothing and the number is device compute throughput."""

    @jax.jit
    def loop(*a):
        def body(c, _):
            # carry feeds the input -> iterations serialize; the op runs on
            # a value numerically equal to a[0]
            y = fn(a[0] + (c * 0).astype(a[0].dtype), *a[1:])
            return y[0, 0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(loop(*args))  # warm/compile
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--head-rows", type=int, default=128)
    args = ap.parse_args()

    from thinkdiff_tpu.ops.int8_matmul import (
        _s8_matmul_fused, _s8_matmul_fused_bwd,
    )
    from thinkdiff_tpu.ops.quant import _absmax_quant_rows

    rs = np.random.RandomState(0)
    rows_for = lambda name: args.head_rows if name == "lm_head" else args.rows
    shapes = SHAPES + [("lm_head", 4096, 32128)]

    @jax.jit
    def xla_w8a8(x, q, s):
        xq, sx = _absmax_quant_rows(x)
        acc = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx[:, None]
                * s[None].astype(jnp.float32)).astype(x.dtype)

    @jax.jit
    def xla_s8_raw(xq, q):
        return jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def bf16_dot(xb, wb):
        return jax.lax.dot_general(xb, wb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)

    @jax.jit
    def pallas_w8a8(x, q, s):
        xq, sx = _absmax_quant_rows(x)
        return _s8_matmul_fused(xq, sx, q, s, x.dtype)

    @jax.jit
    def xla_bwd(dy, q, s):
        g = dy.astype(jnp.float32) * s[None].astype(jnp.float32)
        gq, sg = _absmax_quant_rows(g)
        acc = jax.lax.dot_general(gq, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sg[:, None]).astype(dy.dtype)

    @jax.jit
    def pallas_bwd(dy, q, s):
        g = dy.astype(jnp.float32) * s[None].astype(jnp.float32)
        gq, sg = _absmax_quant_rows(g)
        return _s8_matmul_fused_bwd(gq, sg, q, dy.dtype)

    only = set(a for a in (ap.parse_known_args()[1] or []) if a)
    print(f"{'shape':<12} {'M':>5} {'K':>6} {'N':>6} "
          f"{'bf16':>7} {'xla_w8a8':>9} {'s8_raw':>7} {'pallas':>7} "
          f"{'pl_TF/s':>8} {'%s8peak':>7} | {'xla_bwd':>8} {'pl_bwd':>7}",
          flush=True)
    for name, k, n in shapes:
        if only and name not in only:
            continue
        m = rows_for(name)
        x = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
        q = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rs.rand(n) * 0.01 + 1e-3, jnp.float32)
        xb = x
        wb = (q.astype(jnp.bfloat16) * s[None].astype(jnp.bfloat16))
        xq, _ = _absmax_quant_rows(x)
        dy = jnp.asarray(rs.randn(m, n), jnp.bfloat16)

        # numerics sanity
        ref = np.asarray(xla_w8a8(x, q, s), np.float32)
        got = np.asarray(pallas_w8a8(x, q, s), np.float32)
        err = np.max(np.abs(ref - got)) / max(1e-9, np.max(np.abs(ref)))
        assert err < 2e-2, (name, err)
        refb = np.asarray(xla_bwd(dy, q, s), np.float32)
        gotb = np.asarray(pallas_bwd(dy, q, s), np.float32)
        errb = np.max(np.abs(refb - gotb)) / max(1e-9, np.max(np.abs(refb)))
        assert errb < 2e-2, (name, errb)

        flops = 2.0 * m * k * n

        def rep(tag, t):
            print(f"  {name:<12} {tag:<9} {t*1e3:8.3f} ms  "
                  f"{flops/t/1e12:7.1f} TF/s  "
                  f"{100*flops/t/1e12/S8_PEAK_TFS:5.1f}% s8peak", flush=True)

        t_bf = timeit(bf16_dot, (xb, wb), args.iters); rep("bf16", t_bf)
        t_xla = timeit(xla_w8a8, (x, q, s), args.iters); rep("xla_w8a8", t_xla)
        t_raw = timeit(xla_s8_raw, (xq, q), args.iters); rep("s8_raw", t_raw)
        t_pl = timeit(pallas_w8a8, (x, q, s), args.iters); rep("pallas", t_pl)
        t_xb = timeit(xla_bwd, (dy, q, s), args.iters); rep("xla_bwd", t_xb)
        t_pb = timeit(pallas_bwd, (dy, q, s), args.iters); rep("pl_bwd", t_pb)


if __name__ == "__main__":
    main()
