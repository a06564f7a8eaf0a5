"""Benchmark: Qwen2-VL embedding-engine throughput (imgs/sec) at the
reference precompute operating point (Qwen2-VL-2B, ~256-token prompts with
one image, 256 generated tokens, temp 0.6/top_p 0.9 — reference
configs/qwen2_vl_embed_ccsbu.yaml). Random weights; throughput only.

Quiet-window protocol (the authoritative numbers recorded in PERF.md):
  - per-iteration wall times are recorded individually; the report emits
    BOTH the median (expected throughput) and the best iteration (the
    quiet-window number — on a shared-core host the median is polluted by
    CPU throttling that does not exist on a production TPU host, PERF.md
    round-2 postmortem);
  - generation lengths are emulated from the CC-SBU completion mix
    (normal(mean 80, sd 40), clipped to [8, max_tokens]) via the engine's
    stop hook, seeded — identical across modes and runs;
  - --json writes one machine-readable line with every knob + both numbers.

Modes: static (one fixed batch), continuous (dense-cache slot pool),
paged (page-pool KV, serving scale — slots up to max_num_seqs=256).

Usage:
  python -m scripts.bench_embed_engine --mode paged --slots 64 --n 256
  python -m scripts.bench_embed_engine --mode continuous --batch 16
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16,
                        help="static batch size / dense slot count")
    parser.add_argument("--slots", type=int, default=0,
                        help="decode slot count (default: --batch)")
    parser.add_argument("--max-tokens", type=int, default=256)
    parser.add_argument("--image-size", type=int, default=448)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--mode", choices=["static", "continuous", "paged"],
                        default="static")
    parser.add_argument("--n", type=int, default=0,
                        help="request count for continuous/paged mode "
                             "(default 4x slots)")
    parser.add_argument("--page-size", type=int, default=64)
    parser.add_argument("--chunk", type=int, default=32)
    parser.add_argument("--quant", choices=["none", "int8", "w8a8"],
                        default="none",
                        help="frozen-weight quantization of the LM stack "
                             "(int8: weight-only Pallas decode gemv; w8a8: "
                             "s8xs8 XLA dots, halved decode weight reads)")
    parser.add_argument("--fused", choices=["auto", "on", "off"],
                        default="auto",
                        help="fused qkv/gate_up projection groups (auto: "
                             "on when quantized, matching the engine's "
                             "from_config default)")
    parser.add_argument("--mean-len", type=int, default=80,
                        help="emulated generation-length mean (the CC-SBU "
                             "caption workload finishes at EOS well before "
                             "max_tokens; random weights never sample EOS, "
                             "so lengths are emulated via the stop hook). "
                             "0 = fixed max_tokens for every request (the "
                             "reference LVLM eval shape min=max tokens)")
    parser.add_argument("--json", type=str, default="",
                        help="append one JSON result line to this file")
    parser.add_argument("--prefill-chunk", type=int, default=0,
                        help="chunked prefill size (power of two >= 64; "
                             "0 = bucketed one-shot prefill)")
    parser.add_argument("--model", choices=["2b", "7b"], default="2b",
                        help="geometry: Qwen2-VL-2B (precompute operating "
                             "point) or 7B (the LVLM inference serving "
                             "point — configs/test_thinkdiff_lvlm_*.yaml)")
    parser.add_argument("--refill-batch", type=int, default=0,
                        help="cap refill prefill groups to this many rows "
                             "(0 = engine default)")
    parser.add_argument("--preadmit", type=int, default=0,
                        help="prefill-ahead wave size (paged only): "
                             "pre-prefill this many queued requests at "
                             "full-row geometry so refills are page-table "
                             "updates, not rows<=16 prefills")
    parser.add_argument("--eos-lag", type=int, default=0,
                        help="pipelined EOS accounting depth (paged, "
                             "value-reading workloads): resolve chunk c's "
                             "tokens after chunk c+L is dispatched so the "
                             "sync overlaps device compute. 0 = off")
    parser.add_argument("--overlap-prepare", action="store_true",
                        help="streaming admission: prepare batch i+1 "
                             "(engine.prepare_requests) in a worker thread "
                             "while batch i decodes (paged mode)")
    parser.add_argument("--sampler", choices=["exact", "gumbel"],
                        default="exact",
                        help="gumbel = fused lm_head+Gumbel-max Pallas "
                             "kernel (ops/fused_sample): full-softmax "
                             "temperature sampling, logits never touch HBM")
    parser.add_argument("--vision-quant", choices=["none", "int8", "w8a8"],
                        default="none",
                        help="vision-tower quantization (decoder quant is "
                             "--quant); vision is the widest engine compute "
                             "so w8a8's s8 MXU rate applies where it pays")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tests.test_embed_engine import FakeTokenizer  # fake tokenizer ok for throughput
    from thinkdiff_tpu.engines.embed_engine import EmbedEngine
    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower,
    )

    quant = {"none": False, "int8": True, "w8a8": "w8a8"}[args.quant]
    fused = {"auto": bool(quant), "on": True, "off": False}[args.fused]
    mk = (Qwen2VLConfig.qwen2_vl_7b if args.model == "7b"
          else Qwen2VLConfig.qwen2_vl_2b)
    vquant = {"none": False, "int8": True, "w8a8": "w8a8"}[args.vision_quant]
    cfg = mk(quant_int8=quant, fused_proj=fused, vision_quant=vquant)
    print(f"fused_proj={fused}")
    # tiny-vocab trick is NOT used: keep the real 151936 vocab (lm_head cost
    # matters). Random init at full geometry.
    rng = jax.random.PRNGKey(0)
    print(f"initializing Qwen2-VL-{args.model.upper()} geometry "
          f"(random weights, quant={args.quant})...")
    vision = Qwen2VisionTower(cfg.vision)
    lm = Qwen2VLModel(cfg)
    vp = jax.jit(lambda r: vision.init(
        r, jnp.zeros((4, cfg.vision.patch_dim), cfg.vision.dtype),
        jnp.zeros((4, cfg.vision.head_dim // 2)),
        jnp.zeros((4, cfg.vision.head_dim // 2)), None,
    )["params"])(rng)
    lp = jax.jit(lambda r: lm.init(
        r, input_ids=jnp.zeros((1, 4), jnp.int32),
        position_ids=jnp.zeros((3, 1, 4), jnp.int32),
    )["params"])(rng)

    tok = FakeTokenizer()
    slots = args.slots or args.batch
    engine = EmbedEngine(
        cfg, {"vision": vp, "lm": lp}, tok,
        max_prompt_len=1024, max_tokens=args.max_tokens, min_tokens=1,
        temperature=0.6, top_p=0.9, ignore_eos=True, eos_ids=[],
        min_pixels=56 * 56, max_pixels=1280 * 28 * 28,
        max_num_seqs=max(slots, 16), kv_page_size=args.page_size,
        prefill_chunk=args.prefill_chunk or None,
        preadmit_wave=args.preadmit,
        eos_lag=args.eos_lag,
        sampler=args.sampler,
    )
    rs = np.random.RandomState(0)
    imgs = [Image.fromarray(
        (rs.rand(args.image_size, args.image_size, 3) * 255).astype("uint8"))
        for _ in range(min(args.batch, 16))]

    iter_times = []
    if args.mode in ("continuous", "paged"):
        n = args.n or slots * 4
        if args.mean_len <= 0:
            # min_tokens = max_tokens eval shape (the reference's LVLM
            # inference point: configs/test_thinkdiff_lvlm_*.yaml sets
            # min=max=128 with ignore_eos). Constructor ignore_eos=True
            # stands and no stop hook is installed, so the engine's
            # dispatch-only decode loop (lazy_tokens) applies — the 7B
            # median/best gap was host-sync, not device work (PERF.md).
            lengths = np.full(n, args.max_tokens, dtype=int)
        else:
            lengths = np.clip(rs.normal(args.mean_len, args.mean_len // 2, n)
                              .astype(int), 8, args.max_tokens)
            engine.ignore_eos = False
            engine.eos_ids = [2]
            # count-only stop hook (values unread): the length emulation
            # composes with the lazy/pipelined token accounting
            engine.stop_len_fn = lambda req, m: m >= lengths[req]
        imgs_n = [imgs[i % len(imgs)] for i in range(n)]
        req = {"images": imgs_n,
               "answers": ["Describe the image concisely."] * n}
        paged = args.mode == "paged"
        print(f"{args.mode}: n={n} slots={slots} page={args.page_size} "
              f"emulated mean len {lengths.mean():.0f} / {args.max_tokens}")
        t0 = time.perf_counter()
        result = engine.generate_many(req, seed=0, slots=slots,
                                      chunk=args.chunk, paged=paged,
                                      refill_batch=args.refill_batch)
        print(f"first pass (compile+run): {time.perf_counter() - t0:.1f}s")
        phase_log = []
        ex = fut = None
        if args.overlap_prepare and paged:
            # streaming admission: batch i+1's prepare (PIL resize, vision
            # dispatch, prompt build) runs in a worker thread while batch
            # i decodes — steady-state serving, same prepared inputs
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(1)
            fut = ex.submit(engine.prepare_requests, req)
        for i in range(args.iters):
            t0 = time.perf_counter()
            prep = None
            if fut is not None:
                prep = fut.result()
                fut = (ex.submit(engine.prepare_requests, req)
                       if i + 1 < args.iters else None)
            result = engine.generate_many(req, seed=i + 1, slots=slots,
                                          chunk=args.chunk, paged=paged,
                                          refill_batch=args.refill_batch,
                                          preprepared=prep)
            iter_times.append(time.perf_counter() - t0)
            phase_log.append(dict(engine.last_phase_stats))
            print(f"  iter {i}: {iter_times[-1]:.1f}s phases="
                  f"{engine.last_phase_stats}")
        if ex is not None:
            ex.shutdown(wait=False)
        n_tokens = sum(len(t) for t in result.output_token_ids)
        per_batch = n
    else:
        batch = {"images": imgs[:args.batch] * (args.batch // len(imgs) or 1),
                 "answers": ["Describe the image concisely."] * args.batch}
        batch["images"] = [imgs[i % len(imgs)] for i in range(args.batch)]
        print("compiling (first batch)...")
        t0 = time.perf_counter()
        result = engine.generate(batch, seed=0)
        print(f"first batch (compile+run): {time.perf_counter() - t0:.1f}s, "
              f"gen len {len(result.output_token_ids[0])}")
        for i in range(args.iters):
            t0 = time.perf_counter()
            result = engine.generate(batch, seed=i + 1)
            iter_times.append(time.perf_counter() - t0)
        n_tokens = sum(len(t) for t in result.output_token_ids)
        per_batch = args.batch

    med = float(np.median(iter_times))
    best = float(np.min(iter_times))
    print(f"iters: {['%.2f' % t for t in iter_times]} s")
    print(f"median: {med:.2f} s -> {per_batch / med:.2f} imgs/s, "
          f"{n_tokens / med:.0f} gen tok/s")
    print(f"best (quiet window): {best:.2f} s -> {per_batch / best:.2f} "
          f"imgs/s, {n_tokens / best:.0f} gen tok/s")
    record = {
        "bench": "embed_engine", "mode": args.mode, "slots": slots,
        "n": per_batch, "max_tokens": args.max_tokens,
        "image_size": args.image_size, "quant": args.quant,
        "fused": fused, "page_size": args.page_size,
        "chunk": args.chunk, "mean_len": args.mean_len,
        "prefill_chunk": args.prefill_chunk, "model": args.model,
        "vision_quant": args.vision_quant,
        "preadmit": args.preadmit,
        "refill_batch": args.refill_batch,
        "eos_lag": args.eos_lag,
        "sampler": args.sampler,
        "overlap_prepare": bool(args.overlap_prepare),
        "phases_best": (phase_log[int(np.argmin(iter_times))]
                        if args.mode in ("continuous", "paged") and phase_log
                        else None),
        "iters_s": [round(t, 3) for t in iter_times],
        "imgs_per_s_median": round(per_batch / med, 3),
        "imgs_per_s_best": round(per_batch / best, 3),
        "gen_tok_per_s_median": round(n_tokens / med, 1),
        "gen_tok_per_s_best": round(n_tokens / best, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(record))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
