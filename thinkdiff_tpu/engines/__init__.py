from thinkdiff_tpu.engines.trainer import Trainer
from thinkdiff_tpu.engines.checkpoint import CheckpointManager
