"""Parametrized aligner-training bench — the experiment twin of bench.py.

Same workload (w8a8 frozen flan-t5-xxl decoder geometry, bucketed N(60,25)
lengths — see bench.py docstring for the realism/baseline derivation), with
the memory/batch levers exposed so chip A/B runs are one flag away:

  python scripts/bench_aligner.py --batch 32 --chunked-ce 32 --remat-ffn

Prints the same one-line JSON as bench.py plus the config echo on stderr.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunked-ce", type=int, default=32,
                    help="tokens per lm_head/CE chunk; 0 = monolithic")
    ap.add_argument("--remat-ffn", action="store_true")
    ap.add_argument("--fused-proj", action="store_true")
    ap.add_argument("--quant", default="int8_dyn",
                    choices=["none", "int8", "int8_dyn"])
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--n-batches", type=int, default=16)
    ap.add_argument("--packed", action="store_true",
                    help="sequence packing: --batch becomes the ROW count; "
                         "--pack-cap tokens per row on both axes")
    ap.add_argument("--pack-cap", type=int, default=256)
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import (BASELINE_SAMPLES_PER_SEC_PER_A100, build_batches,
                       build_batches_packed)
    from thinkdiff_tpu.core.config import ConfigNode
    from thinkdiff_tpu.engines.trainer import Trainer
    from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder
    from thinkdiff_tpu.parallel.mesh import make_mesh

    t5_over = dict(
        vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240,
        num_layers=1, num_decoder_layers=24, num_heads=64, dropout_rate=0.0,
        remat_ffn=bool(args.remat_ffn),
        fused_proj=bool(args.fused_proj),
    )
    model = MllamaT5EmbedDecoder(ConfigNode({
        "dtype": "bfloat16", "load_pretrained": False,
        "quantize_frozen": None if args.quant == "none" else args.quant,
        "chunked_ce": args.chunked_ce,
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "vlm_hidden_size": 3584, "t5_config": t5_over,
    }))
    run_cfg = {
        "lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-4,
        "min_lr": 8e-5, "warmup_lr": 1e-6, "warmup_steps": 2000,
        "max_epoch": 40, "iters_per_epoch": 5000, "weight_decay": 0.05,
    }
    trainer = Trainer(model, run_cfg, mesh=make_mesh())
    state = trainer.init_state()

    rs = np.random.RandomState(0)
    n_dev = len(jax.devices())
    if args.packed:
        batches, n_packed = build_batches_packed(
            rs, args.n_batches, args.batch * n_dev, args.pack_cap,
            args.pack_cap, 3584, t5_over["vocab_size"])
    else:
        batches = build_batches(
            rs, args.n_batches, args.batch * n_dev, 3584,
            t5_over["vocab_size"])
    batches = [trainer.prepare_batch(b) for b in batches]
    rng = jax.random.PRNGKey(0)

    t_c0 = time.perf_counter()
    for b in batches:
        state, metrics = trainer.train_step(state, b, rng)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(args.passes):
        for b in batches:
            state, metrics = trainer.train_step(state, b, rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    if args.packed:
        n_samples = args.passes * n_packed
    else:
        n_samples = args.passes * len(batches) * args.batch * n_dev
    sps = n_samples / dt / n_dev
    print(json.dumps({
        "metric": "lvlm_aligner_train_samples_per_sec_per_chip",
        "value": round(sps, 2), "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC_PER_A100, 3),
        "config": {"batch": args.batch, "chunked_ce": args.chunked_ce,
                   "remat_ffn": args.remat_ffn, "fused_proj": args.fused_proj,
                   "quant": args.quant, "packed": args.packed,
                   "pack_cap": args.pack_cap if args.packed else None},
        "compile_s": round(compile_s, 1), "measure_s": round(dt, 1),
    }))


if __name__ == "__main__":
    main()
