"""Training entry point — same CLI surface as the reference
(reference train.py:36-106): ``python -m train --cfg-path cfg.yaml
--options run.seed=7 ...``."""

import argparse
import random

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="ThinkDiff-TPU training")
    parser.add_argument("--cfg-path", required=True, help="path to config yaml")
    parser.add_argument(
        "--options", nargs="+", default=None,
        help="override config: a.b=c or 'a.b c' pairs",
    )
    parser.add_argument("--job-id", default=None)
    return parser.parse_args()


def setup_seeds(seed: int):
    import jax

    from thinkdiff_tpu.core.distributed import get_rank

    seed = seed + get_rank()
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def main():
    args = parse_args()

    import thinkdiff_tpu  # noqa: F401 — registry paths
    import thinkdiff_tpu.data  # noqa: F401 — builder/processor registration
    import thinkdiff_tpu.models  # noqa: F401 — model registration
    import thinkdiff_tpu.runners  # noqa: F401
    import thinkdiff_tpu.tasks  # noqa: F401
    from thinkdiff_tpu.core.config import Config
    from thinkdiff_tpu.core.distributed import init_distributed_mode
    from thinkdiff_tpu.core.logging import setup_logger
    from thinkdiff_tpu.core.registry import registry
    from thinkdiff_tpu.core.utils import now
    from thinkdiff_tpu.tasks import setup_task

    cfg = Config(args)
    init_distributed_mode(cfg.run_cfg)
    setup_seeds(int(cfg.run_cfg.get("seed", 42)))
    setup_logger()
    cfg.pretty_print()

    task = setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)

    runner_name = cfg.run_cfg.get("runner", "runner_base")
    runner_cls = registry.get_runner_class(runner_name)
    if runner_cls is None:
        raise KeyError(f"Unknown runner '{runner_name}'")
    job_id = args.job_id or now()

    # optional wandb (reference train.py:92-97): never a hard dependency
    if cfg.run_cfg.get("wandb_log", False):
        from thinkdiff_tpu.core.distributed import is_main_process
        from thinkdiff_tpu.core.logging import init_wandb

        if is_main_process():
            init_wandb(cfg, job_id)

    runner = runner_cls(
        cfg=cfg, task=task, model=model, datasets=datasets,
        job_id=job_id,
    )
    runner.train()


if __name__ == "__main__":
    main()
