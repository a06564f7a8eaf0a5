"""Child process for tests/test_multihost.py — one rank of a 2-process
CPU 'pod'. Each rank feeds ONLY its half of the global batch through
Trainer.prepare_batch (the multi-host seam: per-host loader shards ->
jax.make_array_from_process_local_data), runs one jitted GSPMD train step,
and prints the global loss. Both ranks must print the identical loss, and
it must equal the single-process loss on the full batch."""

import sys

RANK = int(sys.argv[1])
PORT = sys.argv[2]

import jax

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
    process_id=RANK,
)

import numpy as np

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.engines.trainer import Trainer
from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder
from thinkdiff_tpu.parallel.mesh import make_mesh

TINY_T5 = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_decoder_layers=2, num_heads=4, dropout_rate=0.0)


def main():
    assert jax.process_count() == 2, jax.process_count()
    model = MllamaT5EmbedDecoder(ConfigNode({
        "dtype": "float32", "load_pretrained": False,
        "vlm_hidden_size": 24, "t5_config": TINY_T5}), seed=0)
    run_cfg = {
        "lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-3,
        "min_lr": 1e-4, "warmup_lr": 1e-5, "warmup_steps": 0,
        "max_epoch": 1, "iters_per_epoch": 4, "weight_decay": 0.05,
    }
    trainer = Trainer(model, run_cfg, mesh=make_mesh())
    state = trainer.init_state()

    # the SAME deterministic global batch on both ranks; each rank keeps
    # only its slice (what a rank-sharded loader would deliver)
    rs = np.random.RandomState(0)
    full = {
        "embeds": rs.randn(8, 6, 24).astype(np.float32),
        "embed_mask": np.ones((8, 6), np.int32),
        "labels": rs.randint(1, 128, (8, 6)).astype(np.int32),
    }
    half = {k: v[RANK * 4:(RANK + 1) * 4] for k, v in full.items()}
    batch = trainer.prepare_batch(half)
    for k, v in batch.items():
        assert v.shape == full[k].shape, (k, v.shape)  # global, not local

    rng = jax.random.PRNGKey(0)
    state, metrics = trainer.train_step(state, batch, rng)
    state, metrics = trainer.train_step(state, batch, rng)
    print(f"MULTIHOST_LOSS {float(metrics['loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
