"""Benchmark driver — prints ONE JSON line.

Round-1 metric: LVLM aligner training throughput (samples/sec/chip) at the
reference operating point (flan-t5-xxl-shaped frozen decoder, split len 128,
label len 128 — configs/train_thinkdiff_lvlm_ccsbu.yaml).

Baseline estimate: the paper reports 5 h on 4x A100 for 40 epochs x 5000
iters at batch 32/GPU (README.md:27 + train config). Interpreted per-GPU:
200k optimizer steps x 32 samples / (5 h x 4 GPUs) ~= 89 samples/sec per
A100. ``vs_baseline`` = ours_per_chip / 89.
"""

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_A100 = 200_000 * 32 / (5 * 3600) / 4  # ~88.9


def main():
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.core.config import ConfigNode
    from thinkdiff_tpu.engines.trainer import Trainer
    from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder
    from thinkdiff_tpu.parallel.mesh import make_mesh

    # flan-t5-xxl decoder geometry (d_model 4096, 24 decoder layers, d_ff
    # 10240, 64 heads); encoder never built in this variant. Qwen2-VL-7B
    # hidden size 3584.
    t5_over = dict(
        vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240,
        num_layers=1, num_decoder_layers=24, num_heads=64, dropout_rate=0.0,
    )
    batch_size = 8
    split_len, txt_len = 128, 128

    model = MllamaT5EmbedDecoder(ConfigNode({
        "dtype": "bfloat16", "load_pretrained": False,
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "vlm_hidden_size": 3584, "t5_config": t5_over,
    }))
    run_cfg = {
        "lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-4,
        "min_lr": 8e-5, "warmup_lr": 1e-6, "warmup_steps": 2000,
        "max_epoch": 40, "iters_per_epoch": 5000, "weight_decay": 0.05,
    }
    mesh = make_mesh()  # all local devices, data-parallel
    trainer = Trainer(model, run_cfg, mesh=mesh)
    state = trainer.init_state()

    rs = np.random.RandomState(0)
    n_dev = len(jax.devices())
    b = batch_size * n_dev
    batch = trainer.prepare_batch({
        "embeds": rs.randn(b, split_len, 3584).astype(np.float32),
        "embed_mask": np.ones((b, split_len), np.int32),
        "labels": rs.randint(1, 32000, (b, txt_len)).astype(np.int32),
    })
    rng = jax.random.PRNGKey(0)

    # warmup/compile. NOTE: block via device_get — on the axon TPU platform
    # jax.block_until_ready returns before execution finishes.
    state, metrics = trainer.train_step(state, batch, rng)
    float(metrics["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, batch, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    samples_per_sec_per_chip = b / dt / n_dev
    print(json.dumps({
        "metric": "lvlm_aligner_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec_per_chip, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(
            samples_per_sec_per_chip / BASELINE_SAMPLES_PER_SEC_PER_A100, 3
        ),
    }))


if __name__ == "__main__":
    main()
