"""ThinkDiff-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of ThinkDiff (avi22bhattacharya/ThinkDiff-mlre).

Multimodal in-context reasoning for text-to-image diffusion: align a
vision-language model to an LLM (T5) decoder via a small trainable projector,
then feed the aligned tokens to a FLUX denoising pipeline as prompt embeds.

Design notes (TPU-first, not a port):
  - compute path: jax + pallas kernels, bf16, static shapes, `lax.scan` loops
  - parallelism: GSPMD over a ``jax.sharding.Mesh`` with named axes
    (data/fsdp/model) instead of DDP/NCCL wrappers
  - data: WebDataset-format tar shards (own reader/writer, no webdataset dep)
  - checkpointing: orbax (trainable-only subtree, same semantics as the
    reference's requires_grad-filtered torch.save — reference
    thinkdiff/runners/runner_base.py:597-623)

Package layout mirrors SURVEY.md §7, not the reference's directory tree.
"""

import os

from thinkdiff_tpu.core.registry import registry

__version__ = "0.1.0"

# Register canonical paths once at import time (parity with the reference's
# thinkdiff/__init__.py:21-31 which seeds library_root/repo_root/cache_root).
_library_root = os.path.dirname(os.path.abspath(__file__))
_repo_root = os.path.dirname(_library_root)
_cache_root = os.environ.get(
    "THINKDIFF_CACHE_ROOT", os.path.join(_repo_root, ".cache")
)

registry.register_path("library_root", _library_root, allow_overwrite=True)
registry.register_path("repo_root", _repo_root, allow_overwrite=True)
registry.register_path("cache_root", _cache_root, allow_overwrite=True)
registry.register("MAX_INT", 2**31 - 1, allow_overwrite=True)
registry.register("SPLIT_NAMES", ["train", "val", "test"], allow_overwrite=True)
