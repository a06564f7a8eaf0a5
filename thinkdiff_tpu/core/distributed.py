"""Multi-host/process helpers, TPU-native.

The reference initializes a NCCL process group and uses barriers/all_reduce
through torch.distributed (reference: thinkdiff/common/dist_utils.py:41-117).
On TPU the equivalents are: one ``jax.distributed.initialize()`` per host,
XLA collectives *inside* jitted code, and ``multihost_utils`` for host-level
sync. Rank == ``jax.process_index()``.
"""

from __future__ import annotations

import functools
import logging
import os

import jax

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed_mode(run_cfg=None) -> None:
    """Initialize multi-host JAX if a coordinator is configured.

    Single-host (the common case here) needs no initialization; multi-host
    pods set ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` (or run under a launcher that auto-detects).
    """
    global _initialized
    if _initialized:
        return
    # Must run BEFORE any jax API that initializes the XLA backend
    # (jax.process_count() would lock in a single-process world); only env
    # vars are consulted here.
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator and int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        except Exception as e:  # already initialized (e.g. by a launcher)
            logger.warning("jax.distributed.initialize skipped: %s", e)
    if run_cfg is not None:
        run_cfg["rank"] = get_rank()
        run_cfg["world_size"] = get_world_size()
        run_cfg["distributed"] = get_world_size() > 1
    _initialized = True
    logger.info(
        "process %d/%d, %d local / %d global devices",
        get_rank(), get_world_size(),
        jax.local_device_count(), jax.device_count(),
    )


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def main_process(func):
    """Run ``func`` only on process 0 (reference dist_utils.py:110-117)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)

    return wrapper


def barrier() -> None:
    """Host-level barrier across processes (no-op single-host)."""
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("thinkdiff_tpu.barrier")
