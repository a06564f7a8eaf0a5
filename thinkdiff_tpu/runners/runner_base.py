"""Epoch training driver (reference: thinkdiff/runners/runner_base.py:38-682).

Owns: output dir, mesh + Trainer, dataloader construction from
DatasetBundles, resume/checkpoint, the epoch loop, JSON-lines stat logging.
DDP wrapping / samplers / AMP plumbing from the reference are subsumed by the
GSPMD trainer.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.core.distributed import (
    barrier, get_rank, get_world_size, is_main_process,
)
from thinkdiff_tpu.core.registry import registry
from thinkdiff_tpu.engines.checkpoint import CheckpointManager
from thinkdiff_tpu.engines.trainer import Trainer
from thinkdiff_tpu.parallel.mesh import mesh_from_config

logger = logging.getLogger(__name__)


@registry.register_runner("runner_base")
class RunnerBase:
    def __init__(self, cfg, task, model, datasets, job_id: Optional[str] = None):
        self.config = cfg
        self.task = task
        self.model = model
        self.datasets = datasets
        self.job_id = job_id or "job"

        run = cfg.run_cfg
        self.max_epoch = int(run.get("max_epoch", 1))
        self.iters_per_epoch = int(run.get("iters_per_epoch", 1000))
        self.log_freq = int(run.get("log_freq", 50))
        self.seed = int(run.get("seed", 42))
        self.accum_grad_iters = int(run.get("accum_grad_iters", 1))
        self.evaluate_only = bool(run.get("evaluate", False))
        self.resume_ckpt_path = run.get("resume_ckpt_path", None)
        self.train_splits = list(run.get("train_splits", ["train"]))
        self.valid_splits = list(run.get("valid_splits", []))
        self.test_splits = list(run.get("test_splits", []))

        lib_root = registry.get_path("repo_root") or "."
        self.output_dir = os.path.join(
            lib_root, str(run.get("output_dir", "output")), self.job_id
        )
        self.result_dir = os.path.join(self.output_dir, "result")
        if is_main_process():
            os.makedirs(self.result_dir, exist_ok=True)

        self.mesh = mesh_from_config(run)
        self.trainer = Trainer(model, run, mesh=self.mesh)
        self.ckpt = CheckpointManager(self.output_dir)
        self.start_epoch = 0
        self.state = None

    # -- data ---------------------------------------------------------------
    def train_loader(self, epoch: int):
        """All train bundles; multiple datasets are ratio-mixed through
        MultiIterLoader (reference runner_base.py:181-274 + sample_ratio,
        dataloader_utils.py:15-43)."""
        loaders, ratios = [], []
        for name, splits in self.datasets.items():
            for split in self.train_splits:
                if split in splits:
                    bundle = splits[split]
                    batch = bundle.batch_size or int(
                        self.config.run_cfg.get("batch_size_train", 32)
                    )
                    loaders.append(bundle.get_loader(
                        batch_size=batch, rank=get_rank(),
                        world_size=get_world_size(), seed=self.seed,
                        epoch=epoch,
                    ))
                    ratios.append(
                        float(getattr(bundle, "sample_ratio", 1.0) or 1.0))
        if not loaders:
            raise RuntimeError("No train split found in datasets")
        if len(loaders) == 1:
            return loaders[0]
        from thinkdiff_tpu.data.pipeline import MultiIterLoader

        logger.info("Mixing %d train datasets with ratios %s",
                    len(loaders), ratios)
        return MultiIterLoader(
            [iter(ld) for ld in loaders], ratios, seed=self.seed + epoch)

    # -- training -----------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        start_time = time.time()
        best_agg = -1e18
        self.task.inject_tokenizers(self.model, self.datasets)
        self.state = self.trainer.init_state()
        if self.resume_ckpt_path:
            self._load_checkpoint(self.resume_ckpt_path)
        self.log_config()

        stats_all = {}
        for epoch in range(self.start_epoch, self.max_epoch):
            if not self.evaluate_only:
                logger.info("Start training epoch %d", epoch)
                loader = self.train_loader(epoch)
                self.state, stats = self.task.train_epoch(
                    epoch, self.trainer, self.state, loader,
                    iters_per_epoch=self.iters_per_epoch,
                    log_freq=self.log_freq,
                    accum_grad_iters=self.accum_grad_iters,
                    seed=self.seed,
                    wandb_log=bool(self.config.run_cfg.get("wandb_log", False)),
                    profile_dir=self.config.run_cfg.get("profile_dir", None),
                )
                self.log_stats(stats, split_name="train", epoch=epoch)
                stats_all = stats
                if is_main_process():
                    self.ckpt.save(
                        self.state, epoch, config=self.config.to_dict()
                    )
                    # update the model object's view of trainable params
                    self.model.load_trainable(self.state["params"])

            for split in self.valid_splits:
                for name, splits in self.datasets.items():
                    if split in splits:
                        # use_dist_eval_sampler=False -> every process sees
                        # the full eval set (reference runner_base.py:353-354,
                        # 546-560); True (default) shards it by rank.
                        dist_eval = bool(self.config.run_cfg.get(
                            "use_dist_eval_sampler", True))
                        loader = splits[split].get_loader(
                            rank=get_rank() if dist_eval else 0,
                            world_size=get_world_size() if dist_eval else 1,
                            seed=self.seed, epoch=epoch,
                        )
                        val = self.task.evaluation(
                            self.trainer, self.state, loader,
                            max_batches=self.config.run_cfg.get(
                                "max_eval_batches", None),
                            best_metric=self.config.run_cfg.get(
                                "best_metric", "loss"))
                        self.log_stats(val, split_name=split, epoch=epoch)
                        if val["agg_metrics"] > best_agg and is_main_process():
                            best_agg = val["agg_metrics"]
                            self.ckpt.save(self.state, epoch, is_best=True,
                                           config=self.config.to_dict())
            barrier()
            if self.evaluate_only:
                break

        # Final test-split evaluation from the best checkpoint (reference
        # runner_base.py:415-440: post-training evaluate with
        # skip_reload=False on test splits). In evaluate-only mode the
        # caller-provided checkpoint is evaluated as-is.
        if self.test_splits:
            self.evaluate(cur_epoch="best", skip_reload=self.evaluate_only)

        total = time.time() - start_time
        logger.info("Training time %.1f s", total)
        return stats_all

    def evaluate(self, cur_epoch="best", skip_reload: bool = False) -> Dict[str, Any]:
        """Evaluate every test split, reloading the best checkpoint first
        unless ``skip_reload`` (reference runner_base.py:415-440)."""
        results: Dict[str, Any] = {}
        if not skip_reload and cur_epoch == "best":
            self._reload_best_model()
        for split in self.test_splits:
            for name, splits in self.datasets.items():
                if split not in splits:
                    continue
                dist_eval = bool(self.config.run_cfg.get(
                    "use_dist_eval_sampler", True))
                loader = splits[split].get_loader(
                    rank=get_rank() if dist_eval else 0,
                    world_size=get_world_size() if dist_eval else 1,
                    seed=self.seed, epoch=0,
                )
                val = self.task.evaluation(
                    self.trainer, self.state, loader,
                    max_batches=self.config.run_cfg.get(
                        "max_eval_batches", None),
                    best_metric=self.config.run_cfg.get(
                        "best_metric", "loss"))
                self.log_stats(val, split_name=split, epoch=cur_epoch)
                results[split] = val
        barrier()
        return results

    def _reload_best_model(self) -> bool:
        """Load checkpoint_best's trainable params into the live state
        (reference _reload_best_model runner_base.py:625-643 — model
        weights only; optimizer state stays as-is)."""
        for ext in (".orbax", ".msgpack"):
            path = self.ckpt._path("best") + ext
            if os.path.exists(path):
                restored = self.ckpt.load(path, self.state)
                self.state = {
                    **self.state,
                    "params": jax.tree.map(
                        jax.numpy.asarray, restored["model"]),
                }
                self.model.load_trainable(self.state["params"])
                logger.info("Reloaded best checkpoint for final evaluation")
                return True
        logger.warning("No best checkpoint found; evaluating current state")
        return False

    # -- checkpoint ---------------------------------------------------------
    def _load_checkpoint(self, path: str):
        restored = self.ckpt.load(path, self.state)
        self.state = {
            "params": jax.tree.map(jax.numpy.asarray, restored["model"]),
            "opt_state": restored["opt_state"],
            "step": jax.numpy.asarray(restored["step"], jax.numpy.int32),
        }
        self.start_epoch = int(restored.get("epoch", 0)) + 1

    # -- logging ------------------------------------------------------------
    def log_config(self):
        if is_main_process():
            with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(self.config.to_dict(), default=str) + "\n")

    def log_stats(self, stats: Dict[str, Any], split_name: str, epoch: int):
        if is_main_process():
            entry = {f"{split_name}_{k}": v for k, v in stats.items()}
            entry["epoch"] = epoch
            with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(entry, default=str) + "\n")


@registry.register_runner("runner_clip_t5")
class RunnerClipT5(RunnerBase):
    """The reference's runner_clip_t5 only differed in collate_fn plumbing
    (reference runner_clip_t5.py:64-79); that distinction doesn't exist here,
    so it's a registered alias."""
