"""Decode-step microbench: time ONLY the jitted KV-cache decode scan.

The whole-engine bench (scripts/bench_embed_engine.py) includes host-side
prepare + vision phases that vary up to 5x with this shared-core VM's CPU
throttling (PERF.md round-2 postmortem); this bench isolates the device
decode loop — the number that actually compares bf16 vs int8 serving — by
timing a jitted `chunk`-step scan over the Qwen2-VL decoder with a
prefilled cache, synced via float() (block_until_ready returns early on
the axon tunnel).

Usage: python -m scripts.bench_decode_step [--batch 8] [--steps 64]
         [--quant none|int8|w8a8] [--fused auto|on|off] [--cache-len 256]

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def run_one(quant_name: str, fused_name: str, args) -> dict:
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.models.qwen2_vl import Qwen2VLConfig, Qwen2VLModel
    from thinkdiff_tpu.ops.quant import quantize_leaves_on_device

    quant = {"none": False, "int8": True, "w8a8": "w8a8"}[quant_name]
    fused = {"auto": bool(quant), "on": True, "off": False}[fused_name]
    cfg = Qwen2VLConfig.qwen2_vl_2b(quant_int8=quant, fused_proj=fused)
    lm = Qwen2VLModel(cfg)
    rng = jax.random.PRNGKey(0)
    # device-side init (host random + 35 MB/s tunnel is the slow path)
    init = lambda r: lm.init(
        r, input_ids=jnp.zeros((1, 4), jnp.int32),
        position_ids=jnp.zeros((3, 1, 4), jnp.int32))["params"]
    if quant:
        shapes = jax.eval_shape(init, rng)
        params = quantize_leaves_on_device(shapes, w8a8=quant == "w8a8")
    else:
        params = jax.jit(init)(rng)

    b, hd = args.batch, cfg.head_dim
    window = args.cache_len + args.steps
    caches = [(jnp.zeros((b, cfg.num_kv_heads, window, hd), cfg.dtype),
               jnp.zeros((b, cfg.num_kv_heads, window, hd), cfg.dtype))
              for _ in range(cfg.num_layers)]
    cache_len0 = jnp.full((b,), args.cache_len, jnp.int32)
    pos0 = jnp.full((3, b), args.cache_len, jnp.int32)
    tok0 = jnp.ones((b,), jnp.int32)

    @jax.jit
    def decode_scan(params, caches, tok, cache_len, pos, rng):
        def step(carry, r):
            caches, tok, cache_len, pos = carry
            logits, _, caches = lm.apply(
                {"params": params}, input_ids=tok[:, None],
                position_ids=pos[:, :, None], caches=caches,
                cache_len=cache_len, attn_window=window)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (caches, nxt, cache_len + 1, pos + 1), nxt

        (caches, tok, cache_len, pos), toks = jax.lax.scan(
            step, (caches, tok, cache_len, pos),
            jnp.arange(args.steps))
        return toks

    t0 = time.perf_counter()
    toks = decode_scan(params, caches, tok0, cache_len0, pos0, rng)
    _ = int(np.asarray(toks)[0, 0])  # sync (incl. compile)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        toks = decode_scan(params, caches, tok0, cache_len0, pos0, rng)
        _ = int(np.asarray(toks)[0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    out = {
        "bench": "decode_step", "quant": quant_name, "fused": fused,
        "batch": b, "steps": args.steps, "cache_len": args.cache_len,
        "s_per_step_ms": round(best / args.steps * 1e3, 3),
        "tok_per_s": round(b * args.steps / best, 1),
        "compile_s": round(compile_s, 1),
        "runs_s": [round(t, 3) for t in times],
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--cache-len", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "w8a8", "all"])
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"])
    args = ap.parse_args()
    if args.quant == "all":
        for q, f in (("none", "off"), ("none", "on"),
                     ("w8a8", "off"), ("w8a8", "on"), ("int8", "on")):
            run_one(q, f, args)
    else:
        run_one(args.quant, args.fused, args)


if __name__ == "__main__":
    main()
