"""Optimizers + LR schedules, optax-native.

The reference mutates optimizer param_group LRs per step
(reference: thinkdiff/common/optims.py:13-119). Here the schedules are pure
``step -> lr`` functions fed to optax (so the whole update stays inside the
jitted train step), wrapped in registry classes keeping the reference names
``linear_warmup_cosine_lr`` / ``linear_warmup_step_lr`` and the
epoch-structured constructor signature.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import optax

from thinkdiff_tpu.core.registry import registry


def linear_warmup_cosine_schedule(
    init_lr: float, min_lr: float, warmup_lr: float,
    warmup_steps: int, total_steps: int,
):
    """Linear warmup (warmup_lr -> init_lr) then cosine decay to min_lr,
    matching the reference's warmup_lr_schedule + cosine_lr_schedule math
    (reference optims.py:99-116)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (init_lr - warmup_lr) * jnp.minimum(
            step / jnp.maximum(warmup_steps, 1), 1.0
        )
        decay_steps = jnp.maximum(total_steps, 1)
        cos = (init_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * jnp.minimum(step, decay_steps) / decay_steps)
        ) + min_lr
        return jnp.where(step < warmup_steps, warm, cos) if warmup_steps > 0 else cos

    return schedule


def linear_warmup_step_schedule(
    init_lr: float, min_lr: float, warmup_lr: float,
    warmup_steps: int, steps_per_epoch: int, decay_rate: float = 1.0,
):
    """Linear warmup then per-epoch step decay init_lr * decay_rate**epoch,
    floored at min_lr (reference optims.py:13-53,107-119)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (init_lr - warmup_lr) * jnp.minimum(
            step / jnp.maximum(warmup_steps, 1), 1.0
        )
        epoch = jnp.floor(step / jnp.maximum(steps_per_epoch, 1))
        stepped = jnp.maximum(init_lr * (decay_rate ** epoch), min_lr)
        return jnp.where(step < warmup_steps, warm, stepped) if warmup_steps > 0 else stepped

    return schedule


class _SchedulerBase:
    """Registry wrapper keeping the reference constructor surface."""

    def __init__(self, optimizer=None, max_epoch=1, iters_per_epoch=1000,
                 min_lr=0.0, init_lr=1e-4, warmup_steps=0, warmup_start_lr=-1,
                 **kwargs):
        self.max_epoch = int(max_epoch)
        self.iters_per_epoch = int(iters_per_epoch)
        self.min_lr = float(min_lr)
        self.init_lr = float(init_lr)
        self.warmup_steps = int(warmup_steps)
        self.warmup_start_lr = float(warmup_start_lr if warmup_start_lr >= 0 else init_lr)
        self.kwargs = kwargs
        self.schedule = self.build()

    def build(self):
        raise NotImplementedError

    def __call__(self, step):
        return self.schedule(step)


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
class LinearWarmupCosineLRScheduler(_SchedulerBase):
    def build(self):
        return linear_warmup_cosine_schedule(
            init_lr=self.init_lr, min_lr=self.min_lr,
            warmup_lr=self.warmup_start_lr, warmup_steps=self.warmup_steps,
            total_steps=self.max_epoch * self.iters_per_epoch,
        )


@registry.register_lr_scheduler("linear_warmup_step_lr")
class LinearWarmupStepLRScheduler(_SchedulerBase):
    def build(self):
        return linear_warmup_step_schedule(
            init_lr=self.init_lr, min_lr=self.min_lr,
            warmup_lr=self.warmup_start_lr, warmup_steps=self.warmup_steps,
            steps_per_epoch=self.iters_per_epoch,
            decay_rate=float(self.kwargs.get("lr_decay_rate", 1.0)),
        )


def make_schedule_from_config(run_cfg: Dict[str, Any]):
    name = run_cfg.get("lr_sched", "linear_warmup_cosine_lr")
    cls = registry.get_lr_scheduler_class(name)
    if cls is None:
        raise KeyError(f"Unknown lr_sched '{name}'")
    sched = cls(
        max_epoch=run_cfg.get("max_epoch", 1),
        iters_per_epoch=run_cfg.get("iters_per_epoch", 1000),
        min_lr=run_cfg.get("min_lr", 0.0),
        init_lr=run_cfg.get("init_lr", 1e-4),
        warmup_steps=run_cfg.get("warmup_steps", 0),
        warmup_start_lr=run_cfg.get("warmup_lr", -1),
        lr_decay_rate=run_cfg.get("lr_decay_rate", 1.0),
    )
    return sched.schedule


def weight_decay_mask(params) -> Any:
    """True where weight decay applies: ndim >= 2 and not a norm/bias param
    (reference runner_base.py:99-129 splits p.ndim < 2 / bias / ln / bn into
    the no-decay group)."""
    import jax

    def keep(path, p):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        name = "/".join(str(n) for n in names).lower()
        if p.ndim < 2:
            return False
        for bad in ("bias", "norm", "ln", "embedding", "scale"):
            if bad in name:
                return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(run_cfg: Dict[str, Any], params=None):
    """AdamW with decay/no-decay masking + optional global-norm clip,
    mirroring the reference optimizer construction
    (reference runner_base.py:99-129) and grad-clip option
    (reference base_task.py:247-251)."""
    schedule = make_schedule_from_config(run_cfg)
    wd = float(run_cfg.get("weight_decay", 0.05))
    beta2 = float(run_cfg.get("beta2", 0.999))
    mask = weight_decay_mask(params) if params is not None else None
    accum = int(run_cfg.get("accum_grad_iters", 1))
    # warmup_steps / max_epoch*iters_per_epoch are micro-iteration units (the
    # reference steps the LR every micro-iter, base_task.py:235). MultiSteps
    # advances the inner optimizer's count once per accum micro-iters, so the
    # schedule the inner adamw sees must be stretched back to micro units.
    inner_schedule = (
        (lambda step: schedule(step * accum)) if accum > 1 else schedule
    )
    tx = optax.adamw(
        learning_rate=inner_schedule, b1=0.9, b2=beta2,
        weight_decay=wd, mask=mask,
    )
    if run_cfg.get("use_clip_grad_norm", False):
        tx = optax.chain(
            optax.clip_by_global_norm(float(run_cfg.get("max_grad_norm", 1.0))), tx
        )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    # The returned schedule stays in micro-step units (trainer metrics["lr"]
    # is computed from the micro-step counter, matching the reference's
    # per-iter LR logging).
    return tx, schedule
