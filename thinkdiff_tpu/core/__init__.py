from thinkdiff_tpu.core.registry import registry
from thinkdiff_tpu.core.config import Config, ConfigNode
