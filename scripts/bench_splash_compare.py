"""Compare the in-tree Pallas flash kernel vs jax's stock splash-attention
at the long-T diffusion-transformer shapes (CogVideoX-5b joint attention,
FLUX dev joint attention) on ONE chip.

Rationale: the CogVideoX 5b denoise step is dominated by 42 layers of
B2 H48 T17776 D64 attention; the in-tree kernel plateaus ~56 bf16-TF/s
there (PERF.md round-3 tiling sweep). jax ships a heavily-tuned TPU
splash-attention kernel (jax.experimental.pallas.ops.tpu.splash_attention)
— if it beats ours at this shape we should dispatch to it for the
full-visibility (no bias / no kv_mask / no segment) inference case.

Prints one JSON line per (shape, kernel, blocks) with ms and TF/s.

Usage:
  python -m scripts.bench_splash_compare            # both shapes
  python -m scripts.bench_splash_compare --shape cogvideox
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

SHAPES = {
    # B, H, T, D, default (block_q, block_k) from the model configs
    "cogvideox": (2, 48, 17776, 64, (512, 2048)),
    "flux": (1, 24, 4608, 128, (512, 4608)),
    # head-packing PROBE (VERDICT r3 item 4): two D=64 heads folded into
    # one D=128 pass. The fold is NOT valid attention math — the QK
    # contraction would sum the two heads' scores — so this measures only
    # the speed a D=128 layout would deliver at the CogVideoX sequence
    # length (same total flops as `cogvideox`). A correct fold needs
    # block-diagonal K/V, which re-introduces the exact 50% MXU waste it
    # tries to remove (zeros fill the extra depth), so it cannot win.
    "cogvideox_packed_probe": (2, 24, 17776, 128, (512, 2048)),
}


def bench(fn, args, iters=8):
    # block via a scalar device_get: block_until_ready returns early on
    # the axon tunnel (see .claude/skills/verify — repo-wide gotcha)
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=list(SHAPES) + ["all"], default="all")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-splash", action="store_true",
                    help="skip the jax splash-attention sweep (its round-3 "
                         "numbers are in PERF.md; use this to re-measure "
                         "only the in-tree kernel after a change)")
    args = ap.parse_args()

    from thinkdiff_tpu.ops.flash_attention import flash_attention

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )
        have_splash = True
    except Exception as e:  # pragma: no cover
        print(f"splash unavailable: {e}", file=sys.stderr)
        have_splash = False

    names = list(SHAPES) if args.shape == "all" else [args.shape]
    for name in names:
        B, H, T, D, (bq, bk) = SHAPES[name]
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(B, H, T, D) * 0.05, jnp.bfloat16)
        k = jnp.asarray(rs.randn(B, H, T, D) * 0.05, jnp.bfloat16)
        v = jnp.asarray(rs.randn(B, H, T, D) * 0.05, jnp.bfloat16)
        flops = 4 * B * H * T * T * D  # qk^T + av, 2 flops/MAC each

        ours = jax.jit(functools.partial(
            flash_attention, causal=False, sm_scale=D ** -0.5,
            block_q=bq, block_k=bk))
        dt = bench(lambda a, b, c: ours(a, b, c), (q, k, v), args.iters)
        print(json.dumps({"shape": name, "kernel": "in-tree",
                          "blocks": [bq, bk], "ms": round(dt * 1e3, 1),
                          "tflops_per_sec": round(flops / dt / 1e12, 1)}))

        if not have_splash or args.no_splash:
            continue
        # splash wants padded T multiples of its block sizes; sweep a few.
        # Real use must MASK the padded keys — measure with segment ids
        # (real tokens seg 1, padding seg 0), the correct-numerics config.
        for sbq, sbkv in [(512, 1024), (512, 2048), (1024, 2048),
                          (1024, 1024), (512, 4096)]:
            step = max(sbq, sbkv)  # powers of two: lcm == max
            Tp = ((T + step - 1) // step) * step
            pad = Tp - T
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            try:
                mask = sm.MultiHeadMask(
                    [sm.FullMask((Tp, Tp)) for _ in range(H)])
                block_sizes = sk.BlockSizes(
                    block_q=min(sbq, Tp), block_kv=min(sbkv, Tp),
                    block_kv_compute=min(sbkv, Tp),
                    block_q_dkv=min(sbq, Tp), block_kv_dkv=min(sbkv, Tp),
                    block_kv_dkv_compute=min(sbkv, Tp),
                )
                kernel = sk.make_splash_mha(
                    mask=mask, head_shards=1, q_seq_shards=1,
                    block_sizes=block_sizes)
                seg1 = jnp.asarray(
                    np.concatenate([np.ones(T, np.int32),
                                    np.zeros(pad, np.int32)]))
                segs = sk.SegmentIds(q=seg1, kv=seg1)
                fn = jax.jit(jax.vmap(kernel, in_axes=(0, 0, 0, None)))
                dt = bench(lambda a, b, c: fn(a, b, c, segs), (qp, kp, vp),
                           args.iters)
                # flops accounting uses the REAL T (padding is waste)
                print(json.dumps({
                    "shape": name, "kernel": "splash+seg",
                    "blocks": [sbq, sbkv], "pad_to": Tp,
                    "ms": round(dt * 1e3, 1),
                    "tflops_per_sec": round(flops / dt / 1e12, 1)}))
            except Exception as e:
                print(json.dumps({"shape": name, "kernel": "splash",
                                  "blocks": [sbq, sbkv],
                                  "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
