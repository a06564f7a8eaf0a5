"""Embedding precompute CLI (reference:
scripts/generate_embedding_webdataset.py:72-99): run the VLM engine over a
wids-indexed image dataset and export WebDataset embedding shards.

Usage:
  python -m scripts.generate_embedding_webdataset \\
      --cfg-path configs/qwen2_vl_embed_ccsbu.yaml
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.common import bootstrap, parse_args  # noqa: E402


def main():
    args = parse_args("ThinkDiff-TPU embedding precompute")
    cfg, task = bootstrap(args)

    from thinkdiff_tpu.core.registry import registry

    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    runner_cls = registry.get_runner_class(
        cfg.run_cfg.get("runner", "runner_process_data")
    )
    runner = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                        job_id=args.job_id)
    stats = runner.train()
    print(stats)


if __name__ == "__main__":
    main()
