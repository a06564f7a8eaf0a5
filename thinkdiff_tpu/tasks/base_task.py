"""Tasks: the train/eval loop bodies (reference:
thinkdiff/tasks/base_task.py:19-313).

The hot loop is re-shaped for TPU: instead of per-iter host work
(cuda moves, manual lr stepping, scaler dance — reference :219-263), the task
pulls collated numpy batches from the loader, shards them onto the mesh, and
calls one fused jitted train step. Everything else (metric smoothing, logging
cadence, accum semantics) matches the reference.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.core.distributed import get_rank, get_world_size, is_main_process
from thinkdiff_tpu.core.logging import MetricLogger, SmoothedValue
from thinkdiff_tpu.core.registry import registry

logger = logging.getLogger(__name__)


def setup_task(cfg):
    name = cfg.run_cfg.task
    task_cls = registry.get_task_class(name)
    if task_cls is None:
        raise KeyError(f"Unknown task '{name}'")
    return task_cls.setup_task(cfg=cfg)


class BaseTask:
    def __init__(self, **kwargs):
        self.inst_id_key = "instance_id"

    @classmethod
    def setup_task(cls, **kwargs):
        return cls()

    def build_model(self, cfg):
        model_cfg = cfg.model_cfg
        model_cls = registry.get_model_class(model_cfg.arch)
        if model_cls is None:
            raise KeyError(f"Unknown model arch '{model_cfg.arch}'")
        model = model_cls.from_config(model_cfg)
        model.load_checkpoint_from_config(model_cfg)
        return model

    def build_datasets(self, cfg) -> Dict[str, Any]:
        """{dataset_name: {split: DatasetBundle}} via registry builders
        (reference base_task.py:37-67)."""
        datasets = {}
        model_cfg = getattr(cfg, "model_cfg", None)
        for name, ds_cfg in cfg.datasets_cfg.items():
            builder_cls = registry.get_builder_class(name)
            if builder_cls is None:
                raise KeyError(f"Unknown dataset builder '{name}'")
            # model section threaded through: the reference declares
            # collation knobs (max_txt_len, split modes, tokenizer probs) on
            # the model config (see BaseDatasetBuilder.knob).
            builder = builder_cls(ds_cfg, model_cfg=model_cfg)
            splits = builder.build_datasets()
            # multi-dataset mixing weight (reference base_task.py:61-62 sets
            # .sample_ratio on the train dataset; consumed by MultiIterLoader)
            if "sample_ratio" in ds_cfg and "train" in splits:
                splits["train"].sample_ratio = float(ds_cfg["sample_ratio"])
            datasets[name] = splits
        # eval-only section (reference config.py evaluation_datasets;
        # runner_base.py:513-595 builds loaders for every split)
        eval_cfg = getattr(cfg, "evaluation_datasets_cfg", None) or {}
        for name, ds_cfg in (
            eval_cfg.items() if hasattr(eval_cfg, "items") else []
        ):
            builder_cls = registry.get_builder_class(name)
            if builder_cls is None:
                raise KeyError(f"Unknown eval dataset builder '{name}'")
            builder = builder_cls(ds_cfg, model_cfg=model_cfg)
            built = builder.build_datasets()
            datasets[name] = {"eval": built.get("eval", built.get("train"))}
        return datasets

    def inject_tokenizers(self, model, datasets):
        t5_tok = getattr(model, "t5_tokenizer", None)
        if t5_tok is None and hasattr(model, "get_t5_tokenizer"):
            t5_tok = model.get_t5_tokenizer()
        vlm_decode = model.__dict__.get("vlm_decode_fn")
        if vlm_decode is None and hasattr(model, "get_vlm_decode_fn"):
            vlm_decode = model.get_vlm_decode_fn()
        for splits in datasets.values():
            for bundle in splits.values():
                bundle.set_tokenizers(t5_tok, vlm_decode)

    # -- the hot loop --------------------------------------------------------
    def train_epoch(self, epoch: int, trainer, state, data_loader,
                    iters_per_epoch: int, log_freq: int = 50,
                    accum_grad_iters: int = 1, seed: int = 42,
                    wandb_log: bool = False, profile_dir: Optional[str] = None):
        if profile_dir and epoch == 0:
            # jax.profiler trace of the first iters (TPU-native replacement
            # for the reference's cuda max-mem reporting, SURVEY.md §5)
            jax.profiler.start_trace(profile_dir)
        metric_logger = MetricLogger(delimiter="  ")
        metric_logger.add_meter("lr", SmoothedValue(window_size=50, fmt="{value:.6f}"))
        metric_logger.add_meter("loss", SmoothedValue(window_size=50, fmt="{value:.4f}"))
        header = f"Train: data epoch: [{epoch}]"
        rng = jax.random.PRNGKey(seed + get_rank())

        # Gradient accumulation lives INSIDE the jitted step
        # (optax.MultiSteps, core/optim.py:make_optimizer) — the task loop
        # only owes the reference's per-OPTIMIZER-step wandb cadence
        # (reference base_task.py:258-261 logs after scaler.step, i.e. every
        # accum_grad_iters micro iters).
        data_iter = iter(data_loader)
        inner = metric_logger.log_every(range(iters_per_epoch), log_freq, header)
        pending = None  # async dispatch: read metrics one step late
        pending_i = 0

        def flush(metrics, i):
            loss, lr = float(metrics["loss"]), float(metrics["lr"])
            metric_logger.update(loss=loss, lr=lr)
            if wandb_log and (i + 1) % max(accum_grad_iters, 1) == 0:
                self._wandb_step(loss, lr)

        for _i in inner:
            batch = next(data_iter)
            batch = trainer.prepare_batch(batch)
            state, metrics = trainer.train_step(state, batch, rng)
            if pending is not None:
                flush(pending, pending_i)
            pending, pending_i = metrics, _i
        if pending is not None:
            flush(pending, pending_i)
        if profile_dir and epoch == 0:
            jax.profiler.stop_trace()
        metric_logger.synchronize_between_processes()
        logger.info("Averaged stats: %s", metric_logger.global_avg())
        stats = {
            k: "{:.6f}".format(m.global_avg) for k, m in metric_logger.meters.items()
        }
        return state, stats

    @staticmethod
    def _wandb_step(loss: float, lr: float):
        """Per-optimizer-step wandb log, rank 0 only (reference
        base_task.py:260-261)."""
        if is_main_process():
            from thinkdiff_tpu.core.logging import wandb_log as _wlog

            _wlog({"loss": loss, "lr": lr})

    def evaluation(self, trainer, state, data_loader,
                   max_batches: Optional[int] = None,
                   best_metric: str = "loss"):
        """Eval-split pass. ``best_metric`` selects what ``agg_metrics``
        carries (the runner keeps the checkpoint with the highest value):

        - ``"loss"`` (default): -mean(loss) — the reference's behavior
          (its base_task agg_metrics is loss-derived).
        - ``"token_acc"``: token-weighted teacher-forced next-token
          accuracy via the model's ``eval_metrics_fn`` (falls back to
          loss if the model has none). Opt-in: ``run.best_metric``.
        """
        losses = []
        correct = total = 0.0
        want_acc = best_metric == "token_acc"
        for i, batch in enumerate(data_loader):
            if max_batches is not None and i >= max_batches:
                break
            batch = trainer.prepare_batch(batch)
            stats = trainer.eval_metrics_step(state, batch) if want_acc else None
            if stats is not None:
                loss, n_ok, n_tok = (float(x) for x in stats)
                losses.append(loss)
                correct += n_ok
                total += n_tok
            else:
                want_acc = False
                losses.append(float(trainer.eval_step(state, batch)))
        out = {"agg_metrics": -float(np.mean(losses)) if losses else 0.0,
               "loss": float(np.mean(losses)) if losses else 0.0}
        if want_acc and total:
            out["token_acc"] = correct / total
            out["agg_metrics"] = out["token_acc"]
        return out


def save_result(result, result_dir: str, filename: str,
                remove_duplicate: str = "") -> str:
    """Distributed result merge: each process writes its own JSON, process 0
    concatenates after a barrier (reference base_task.py:274-312)."""
    import json

    from thinkdiff_tpu.core.distributed import barrier

    os.makedirs(result_dir, exist_ok=True)
    rank_file = os.path.join(result_dir, f"{filename}_rank{get_rank()}.json")
    with open(rank_file, "w") as f:
        json.dump(result, f)
    barrier()
    final_file = os.path.join(result_dir, f"{filename}.json")
    if is_main_process():
        merged = []
        for rank in range(get_world_size()):
            with open(os.path.join(result_dir,
                                   f"{filename}_rank{rank}.json")) as f:
                merged += json.load(f)
        if remove_duplicate:
            seen, deduped = set(), []
            for item in merged:
                key = item.get(remove_duplicate)
                if key not in seen:
                    seen.add(key)
                    deduped.append(item)
            merged = deduped
        with open(final_file, "w") as f:
            json.dump(merged, f)
        logger.info("result file saved to %s", final_file)
    barrier()
    return final_file


@registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    """Aligner pretraining; evaluation is a no-op in the reference
    (reference image_text_pretrain.py:17-18)."""
