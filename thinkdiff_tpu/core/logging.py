"""Host-side metric smoothing + progress logging.

Same roles as the reference's SmoothedValue/MetricLogger
(reference: thinkdiff/common/logger.py:19-181) with cross-process sync done
via a tiny jitted psum over the CPU mesh instead of torch.distributed
all_reduce. GPU-memory reporting is replaced by TPU HBM stats when available.
"""

from __future__ import annotations

import datetime
import logging
import time
from collections import defaultdict, deque

import jax
import numpy as np

from thinkdiff_tpu.core.distributed import get_rank, get_world_size


class SmoothedValue:
    """Track a series of values; expose window-smoothed and global averages."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """all-reduce [count, total] across hosts (reference logger.py:37-48)."""
        if get_world_size() <= 1:
            return
        from jax.experimental import multihost_utils

        arr = np.array([self.count, self.total], dtype=np.float64)
        arr = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(arr[0])
        self.total = float(arr[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


def _device_memory_mb() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / (1024.0 * 1024.0)
    except Exception:
        pass
    return 0.0


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = v.item()
            self.meters[k].update(v)

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def global_avg(self):
        return self.delimiter.join(
            f"{n}: {m.global_avg:.4f}" for n, m in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = ""):
        logger = logging.getLogger(__name__)
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        space_fmt = f":{len(str(total))}d" if total else ""
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = datetime.timedelta(
                        seconds=int(iter_time.global_avg * (total - i))
                    )
                    progress = f"[{i:{space_fmt[1:] if space_fmt else 'd'}}/{total}]"
                    eta_s = f"eta: {eta}"
                else:
                    progress = f"[{i}]"
                    eta_s = ""
                logger.info(
                    self.delimiter.join(
                        filter(None, [
                            header, progress, eta_s, str(self),
                            f"time: {iter_time}", f"data: {data_time}",
                            f"mem: {_device_memory_mb():.0f}MB",
                        ])
                    )
                )
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        logger.info(
            "%s Total time: %s (%.4f s / it)", header,
            datetime.timedelta(seconds=int(total_time)), total_time / max(i, 1),
        )


def setup_logger(level=None):
    """Rank-0 INFO, other ranks WARN (reference logger.py:190-195)."""
    if level is None:
        level = logging.INFO if get_rank() == 0 else logging.WARN
    logging.basicConfig(
        level=level,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
        force=True,
    )


# -- optional wandb (reference train.py:92-97, base_task.py:260-261) ---------
_wandb = None


def init_wandb(cfg, job_id: str):
    """Initialize wandb if installed; returns the run or None. Never a hard
    dependency — absence degrades to a one-line warning."""
    global _wandb
    try:
        import wandb
    except ImportError:
        logging.getLogger(__name__).warning(
            "wandb_log requested but wandb is not installed; "
            "continuing without it")
        return None
    run_cfg = cfg.run_cfg
    _wandb = wandb
    wandb.init(
        project=str(run_cfg.get("wandb_project_name", "thinkdiff_tpu")),
        name=str(run_cfg.get("job_name", job_id)),
        config=cfg.to_dict(),
    )
    return wandb.run


def wandb_log(metrics):
    """Per-step metric log when a wandb run is active (no-op otherwise)."""
    if _wandb is not None and getattr(_wandb, "run", None) is not None:
        _wandb.log(metrics)
