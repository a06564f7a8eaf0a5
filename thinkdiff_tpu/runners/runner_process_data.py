"""Single-epoch data-processing driver (reference:
thinkdiff/runners/runner_process_data.py:50-155): drives the precompute task
over an indexed wids dataset and writes embedding shards."""

from __future__ import annotations

import logging
from typing import Any, Dict

from thinkdiff_tpu.core.distributed import get_rank, get_world_size
from thinkdiff_tpu.core.registry import registry

logger = logging.getLogger(__name__)


@registry.register_runner("runner_process_data")
class RunnerProcessData:
    def __init__(self, cfg, task, model, datasets, job_id=None):
        self.config = cfg
        self.task = task
        self.model = model
        self.datasets = datasets
        run = cfg.run_cfg
        self.output_shard_path = list(run.get("output_shard_path"))
        self.seed = int(run.get("seed", 42))
        self.log_freq = int(run.get("log_freq", 1))
        self.max_batches = run.get("max_batches", None)

    def train(self) -> Dict[str, Any]:
        """Exactly one pass (reference runner_process_data.py:150-155)."""
        for name, splits in self.datasets.items():
            for split, bundle in splits.items():
                loader = bundle.get_loader(
                    rank=get_rank(), world_size=get_world_size(),
                    seed=self.seed, epoch=0,
                )
                # Multi-host: each process writes its own shard range.
                shard_path = list(self.output_shard_path)
                if get_world_size() > 1:
                    shard_path[2] = int(shard_path[2]) + get_rank() * 100000
                return self.task.process_epoch(
                    self.model, loader, shard_path,
                    log_freq=self.log_freq, max_batches=self.max_batches,
                )
        raise RuntimeError("No datasets to process")
