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
_cache_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    A fresh serving/bench/train process otherwise recompiles every jitted
    shape from scratch — measured ~8 min of cold-start for the embed
    engine at the precompute operating point over the axon tunnel. The
    reference's stack pays the analogous cost once via torch/vLLM CUDA
    kernel caches; this is the XLA equivalent. Opt out with
    ``THINKDIFF_COMPILE_CACHE=0``; override the location with
    ``THINKDIFF_COMPILE_CACHE`` or ``JAX_COMPILATION_CACHE_DIR``.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    env = os.environ.get("THINKDIFF_COMPILE_CACHE", "")
    if env == "0":
        return
    path = (env if env not in ("", "1") else None) or path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/thinkdiff_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took meaningful compile time; the default
        # (1 s) skips the many small host-utility jits
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
        logger.info("persistent compilation cache at %s", path)
    except Exception as e:  # unsupported backend/config — run uncached
        logger.warning("compilation cache disabled: %s", e)


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
    enable_compilation_cache()
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
