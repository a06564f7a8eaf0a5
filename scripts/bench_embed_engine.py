"""Benchmark: Qwen2-VL embedding-engine throughput (imgs/sec) at the
reference precompute operating point (Qwen2-VL-2B, ~256-token prompts with
one image, 256 generated tokens, temp 0.6/top_p 0.9 — reference
configs/qwen2_vl_embed_ccsbu.yaml). Random weights; throughput only.

Usage: python -m scripts.bench_embed_engine [--batch 16] [--max-tokens 256]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--max-tokens", type=int, default=256)
    parser.add_argument("--image-size", type=int, default=448)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--mode", choices=["static", "continuous"],
                        default="static")
    parser.add_argument("--n", type=int, default=0,
                        help="request count for continuous mode "
                             "(default 4x batch)")
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
                             "so lengths are emulated via the stop hook)")
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
    cfg = Qwen2VLConfig.qwen2_vl_2b(quant_int8=quant, fused_proj=fused)
    print(f"fused_proj={fused}")
    # tiny-vocab trick is NOT used: keep the real 151936 vocab (lm_head cost
    # matters). Random init at full geometry.
    rng = jax.random.PRNGKey(0)
    print(f"initializing Qwen2-VL-2B geometry (random weights, "
          f"quant={args.quant})...")
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
    engine = EmbedEngine(
        cfg, {"vision": vp, "lm": lp}, tok,
        max_prompt_len=1024, max_tokens=args.max_tokens, min_tokens=1,
        temperature=0.6, top_p=0.9, ignore_eos=True, eos_ids=[],
        min_pixels=56 * 56, max_pixels=1280 * 28 * 28,
    )
    rs = np.random.RandomState(0)
    imgs = [Image.fromarray(
        (rs.rand(args.image_size, args.image_size, 3) * 255).astype("uint8"))
        for _ in range(args.batch)]
    batch = {"images": imgs,
             "answers": ["Describe the image concisely."] * args.batch}

    if args.mode == "continuous":
        n = args.n or args.batch * 4
        lengths = np.clip(rs.normal(args.mean_len, args.mean_len // 2, n)
                          .astype(int), 8, args.max_tokens)
        engine.ignore_eos = False
        engine.eos_ids = [2]
        engine.stop_fn = lambda req, toks: len(toks) >= lengths[req]
        imgs_n = [imgs[i % args.batch] for i in range(n)]
        req = {"images": imgs_n,
               "answers": ["Describe the image concisely."] * n}
        print(f"continuous: n={n} slots={args.batch} emulated mean len "
              f"{lengths.mean():.0f} / max {args.max_tokens}")
        t0 = time.perf_counter()
        result = engine.generate_many(req, seed=0, slots=args.batch)
        dt0 = time.perf_counter() - t0
        print(f"first pass (compile+run): {dt0:.1f}s")
        t0 = time.perf_counter()
        for i in range(args.iters):
            result = engine.generate_many(req, seed=i + 1, slots=args.batch)
        dt = (time.perf_counter() - t0) / args.iters / (n / args.batch)
        n_tokens = sum(len(t) for t in result.output_token_ids) \
            * args.batch // n
        args_batch = args.batch
        print(f"continuous {n} reqs: {dt * n / args.batch:.2f} s total -> "
              f"{n / (dt * n / args.batch):.2f} imgs/s")
    else:
        print("compiling (first batch)...")
        t0 = time.perf_counter()
        result = engine.generate(batch, seed=0)
        print(f"first batch (compile+run): {time.perf_counter() - t0:.1f}s, "
              f"gen len {len(result.output_token_ids[0])}")

        t0 = time.perf_counter()
        for i in range(args.iters):
            result = engine.generate(batch, seed=i + 1)
        dt = (time.perf_counter() - t0) / args.iters
        n_tokens = sum(len(t) for t in result.output_token_ids)
    print(f"batch {args.batch}: {dt:.2f} s/batch -> "
          f"{args.batch / dt:.2f} imgs/s, "
          f"{n_tokens / dt:.0f} gen tok/s")


if __name__ == "__main__":
    main()
