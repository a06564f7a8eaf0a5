"""Shared CLI bootstrap for scripts (mirrors train.py's skeleton,
reference scripts/generate_embedding_webdataset.py:72-95)."""

import argparse
import random

import numpy as np


def parse_args(description: str):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--cfg-path", required=True)
    parser.add_argument("--options", nargs="+", default=None)
    parser.add_argument("--job-id", default=None)
    return parser.parse_args()


def bootstrap(args):
    """-> (cfg, task). Imports trigger registry population."""
    import thinkdiff_tpu  # noqa: F401
    import thinkdiff_tpu.data  # noqa: F401
    import thinkdiff_tpu.engines.embed_engine  # noqa: F401
    import thinkdiff_tpu.models  # noqa: F401
    import thinkdiff_tpu.runners  # noqa: F401
    import thinkdiff_tpu.tasks  # noqa: F401
    from thinkdiff_tpu.core.config import Config
    from thinkdiff_tpu.core.distributed import init_distributed_mode
    from thinkdiff_tpu.core.logging import setup_logger
    from thinkdiff_tpu.tasks import setup_task

    cfg = Config(args)
    init_distributed_mode(cfg.run_cfg)
    seed = int(cfg.run_cfg.get("seed", 42))
    random.seed(seed)
    np.random.seed(seed)
    setup_logger()
    cfg.pretty_print()
    task = setup_task(cfg)
    return cfg, task
