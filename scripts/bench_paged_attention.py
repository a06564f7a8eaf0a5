"""Paged-attention kernel vs dense decode attention, measured on chip.

The verdict-7 table: at the serving operating point (Qwen2-VL-2B geometry,
H=12 Hkv=2 D=128, kv page 64) compare, per decode step across all slots:

  dense   — ops/decode_attention.decode_attention over a per-slot dense
            cache padded to the worst case (what the engine's non-paged
            path streams every step),
  paged/xla    — gather formulation (ops/paged_attention.paged_attention_xla),
  paged/pallas — the Pallas kernel with per-slot early exit (DMA elided for
            page steps past ceil(len/PAGE)).

Device-only timing (inputs live on device; one scan of ITERS steps per
timed call) so the 1-vCPU tunnel host stays out of the number. Also
cross-checks Pallas vs the XLA oracle ON CHIP — the unit tests only cover
CPU/interpret mode.

Usage: python -m scripts.bench_paged_attention --slots 16 64 256
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench(fn, args, iters, inner, kwargs=None):
    import jax

    kw = kwargs or {}
    fn = functools.partial(fn, **kw)
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda l: float(np.asarray(jax.device_get(l)).astype(np.float32).sum()
                        * 0 + 1), out)  # block after compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.device_get(out)).astype(np.float32).sum())
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.ops.decode_attention import decode_attention
    from thinkdiff_tpu.ops.paged_attention import (
        paged_attention_pallas, paged_attention_xla)

    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[16, 64, 256])
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=1280,
                    help="worst-case context (prompt bucket + max_tokens)")
    ap.add_argument("--mean-len", type=int, default=420,
                    help="typical live context (448^2 image ~330 vis tokens"
                         " + text + generated)")
    ap.add_argument("--inner", type=int, default=32,
                    help="decode steps per timed scan")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    h, hkv, d, page = args.heads, args.kv_heads, args.head_dim, args.page
    mp = -(-args.max_len // page)
    rs = np.random.RandomState(0)
    on_tpu = jax.default_backend() != "cpu"
    rows = []

    for s in args.slots:
        # realistic ragged lengths around the operating point
        lengths = np.clip(
            rs.normal(args.mean_len, args.mean_len / 4, s), page,
            args.max_len).astype(np.int32)
        n_pages = 1 + int(np.sum(-(-lengths // page)))  # + trash page
        table = np.zeros((s, mp), np.int32)
        nxt = 1
        for i, ln in enumerate(lengths):
            for pg in range(-(-int(ln) // page)):
                table[i, pg] = nxt
                nxt += 1
        q = jnp.asarray(rs.randn(s, h, d) * 0.1, jnp.bfloat16)
        k_pool = jnp.asarray(rs.randn(n_pages, hkv, page, d) * 0.1,
                             jnp.bfloat16)
        v_pool = jnp.asarray(rs.randn(n_pages, hkv, page, d) * 0.1,
                             jnp.bfloat16)
        table_j = jnp.asarray(table)
        lens_j = jnp.asarray(lengths)

        # dense comparison cache: every slot padded to max_len
        k_dense = jnp.asarray(
            rs.randn(s, hkv, args.max_len, d) * 0.1, jnp.bfloat16)
        v_dense = jnp.asarray(
            rs.randn(s, hkv, args.max_len, d) * 0.1, jnp.bfloat16)

        def scan_of(step):
            # caches/tables are explicit jit ARGUMENTS, not closed-over
            # constants: embedded constants ship inside the compile payload,
            # which the axon remote-compile tunnel caps (HTTP 413 at the
            # 256-slot dense cache)
            def body(c, _, **kw):
                return step(c, **kw), None
            return jax.jit(lambda q0, **kw: jax.lax.scan(
                functools.partial(body, **kw), q0, None,
                length=args.inner)[0])

        dense_fn = scan_of(lambda qq, k=None, v=None: decode_attention(
            qq[:, :, None], k, v, lens_j)[:, :, 0].astype(qq.dtype))
        xla_fn = scan_of(lambda qq, k=None, v=None: paged_attention_xla(
            qq, k, v, table_j, lens_j).astype(qq.dtype))
        row = {"slots": s, "mp": mp, "live_pages": n_pages - 1}
        t, _ = bench(dense_fn, (q,), args.iters, args.inner,
                     dict(k=k_dense, v=v_dense))
        row["dense_us"] = round(t * 1e6, 1)
        t, o_xla = bench(xla_fn, (q,), args.iters, args.inner,
                         dict(k=k_pool, v=v_pool))
        row["paged_xla_us"] = round(t * 1e6, 1)
        if on_tpu:
            pl_fn = scan_of(lambda qq, k=None, v=None: paged_attention_pallas(
                qq, k, v, table_j, lens_j).astype(qq.dtype))
            t, o_pl = bench(pl_fn, (q,), args.iters, args.inner,
                            dict(k=k_pool, v=v_pool))
            row["paged_pallas_us"] = round(t * 1e6, 1)
            # on-chip numerics: one un-scanned step vs the XLA oracle
            a = np.asarray(jax.device_get(paged_attention_pallas(
                q, k_pool, v_pool, table_j, lens_j))).astype(np.float32)
            b = np.asarray(jax.device_get(paged_attention_xla(
                q, k_pool, v_pool, table_j, lens_j))).astype(np.float32)
            err = float(np.max(np.abs(a - b)))
            row["pallas_vs_xla_maxerr"] = round(err, 5)
            assert err < 0.03, f"on-chip kernel mismatch: {err}"
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    print(json.dumps({
        "metric": "paged_decode_attention_us_per_step",
        "geometry": f"H{h}/Hkv{hkv}/D{d}/page{page}/maxlen{args.max_len}",
        "backend": jax.default_backend(),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
