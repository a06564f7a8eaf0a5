"""Child for tests/test_multihost.py::test_two_process_precompute — one
rank of a 2-process CPU 'pod' running the PRECOMPUTE path: wids-indexed
image shards -> per-rank loader shard -> tiny engine generate -> per-rank
output shard range (runners/runner_process_data.py:37-40). Each process
owns its own engine instance (the multi-host serving model: rank-sharded
data, one engine per host). The parent merges both ranks' shards and
asserts exactly-once coverage."""

import sys

RANK = int(sys.argv[1])
PORT = sys.argv[2]
TMP = sys.argv[3]

import jax

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
    process_id=RANK,
)

import yaml


def main():
    assert jax.process_count() == 2, jax.process_count()
    import thinkdiff_tpu.data  # noqa: F401
    import thinkdiff_tpu.models  # noqa: F401
    import thinkdiff_tpu.runners  # noqa: F401
    import thinkdiff_tpu.tasks  # noqa: F401
    from tests.test_precompute_e2e import _tiny_engine
    from thinkdiff_tpu.core.config import Config
    from thinkdiff_tpu.core.registry import registry
    from thinkdiff_tpu.engines.embed_engine import MllamaVllmGenerateModel
    from thinkdiff_tpu.tasks import setup_task

    cfg_dict = {
        "model": {"arch": "mllama-vllm-generate-1",
                  "vllm_config": {"embedding_layer_name": "model.norm"}},
        "datasets": {
            "cc_sbu_mllama_vllm_process_wids": {
                "batch_size": 2,
                "build_info": {"storage": f"{TMP}/wids_index.json"},
            },
        },
        "run": {
            "task": "image_text_process_data",
            "runner": "runner_process_data",
            "output_shard_path": [f"{TMP}/embed", "%06d.tar", 0],
            "seed": 0, "log_freq": 1,
        },
    }
    cfg_path = f"{TMP}/pre_rank{RANK}.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    cfg = Config(cfg_path=cfg_path)
    task = setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = MllamaVllmGenerateModel(cfg.model_cfg, engine=_tiny_engine())
    runner = registry.get_runner_class("runner_process_data")(
        cfg=cfg, task=task, model=model, datasets=datasets)
    stats = runner.train()
    print(f"PRECOMPUTE_RANK {RANK} n={stats['num_samples']}", flush=True)


if __name__ == "__main__":
    main()
