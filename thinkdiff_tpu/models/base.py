"""Model base class: config-driven construction, checkpoint IO.

Counterpart of the reference BaseModel (reference:
thinkdiff/models/base_model.py:40-111) with TPU-native storage: checkpoints
are orbax/msgpack pytrees of the TRAINABLE subtree only (same semantics as
the reference's requires_grad-filtered torch.save), plus a one-time converter
from the released ``.pth`` files.

Models here are NOT nn.Modules. Each model class owns:
  - flax module definitions + frozen param pytrees (bf16, never updated)
  - the trainable subtree (f32 master, bf16 compute)
  - a pure ``loss_fn(trainable, frozen, batch, rng)`` the trainer jits
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.core.config import ConfigNode

logger = logging.getLogger(__name__)


def str_to_dtype(name) -> Any:
    if name in (None, "float32", "fp32"):
        return jnp.float32
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float16", "fp16"):
        return jnp.float16
    raise ValueError(f"Unknown dtype {name}")


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint (torch cpu) into numpy.

    Accepts both raw state dicts and the reference's
    {"model": state_dict, "optimizer": ..., "epoch": ...} layout
    (reference runner_base.py:597-623).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    from thinkdiff_tpu.models.convert import torch_state_dict_to_numpy

    return torch_state_dict_to_numpy(ckpt)


def save_msgpack_params(params: Any, path: str) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, params)))


def load_msgpack_params(template: Any, path: str) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class BaseModel:
    """Shared plumbing; subclasses define modules/params/loss."""

    DEFAULT_CONFIG: Dict[str, Any] = {}
    default_model_type: Optional[str] = None
    # model_type -> repo-relative default YAML (model defaults + preprocess
    # processor specs), merged UNDER every user config by
    # Config.build_model_config — reference base_model.py:86-90 +
    # common/config.py:62-82.
    PRETRAINED_MODEL_CONFIG_DICT: Dict[str, str] = {}

    def __init__(self, cfg: Optional[ConfigNode] = None):
        self.cfg = cfg if cfg is not None else ConfigNode(dict(self.DEFAULT_CONFIG))

    @classmethod
    def from_config(cls, cfg) -> "BaseModel":
        return cls(cfg)

    @classmethod
    def default_config_path(cls, model_type: str) -> str:
        if model_type not in cls.PRETRAINED_MODEL_CONFIG_DICT:
            raise KeyError(f"Unknown model type {model_type} for "
                           f"{cls.__name__}")
        from thinkdiff_tpu.core.registry import registry

        root = registry.get_path("repo_root", os.getcwd())
        return os.path.join(root, cls.PRETRAINED_MODEL_CONFIG_DICT[model_type])

    @classmethod
    def from_pretrained(cls, model_type: str) -> "BaseModel":
        """Build from the model-type default YAML alone (reference
        base_model.py:75-83)."""
        from thinkdiff_tpu.core.config import load_yaml

        cfg = load_yaml(cls.default_config_path(model_type)).get("model")
        return cls.from_config(cfg)

    # -- checkpoint surface (trainable subtree only) ------------------------
    def trainable_params(self) -> Any:
        raise NotImplementedError

    def load_trainable(self, params: Any) -> None:
        raise NotImplementedError

    def load_checkpoint(self, path: str) -> None:
        """Load trainable weights from msgpack or a reference .pth."""
        if path.endswith((".pth", ".pt", ".bin")):
            sd = load_torch_checkpoint(path)
            self.load_trainable(self.convert_reference_checkpoint(sd))
        else:
            self.load_trainable(load_msgpack_params(self.trainable_params(), path))
        logger.info("Loaded trainable checkpoint from %s", path)

    def convert_reference_checkpoint(self, sd: Dict[str, np.ndarray]) -> Any:
        raise NotImplementedError

    def export_reference_checkpoint(self, trainable: Any) -> Dict[str, np.ndarray]:
        """Inverse of ``convert_reference_checkpoint``: trainable params ->
        a reference-stack-loadable torch state dict (the requires_grad-only
        layout of reference runner_base.py:597-623). Lets aligners trained
        here run under the reference's PyTorch inference scripts."""
        raise NotImplementedError

    def load_checkpoint_from_config(self, cfg) -> None:
        ckpt = cfg.get("ckpt", None) if cfg else None
        if ckpt:
            self.load_checkpoint(ckpt)

    def get_t5_tokenizer(self):
        """Fast T5 tokenizer from local files only (zero-egress friendly)."""
        path = self.cfg.get("text_pretrained_model_name_or_path",
                            "google/flan-t5-xxl")
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path, local_files_only=True)
        except Exception as e:
            logger.warning("T5 tokenizer unavailable for %s: %s", path, e)
            return None

    def get_vlm_decode_fn(self):
        """token ids -> text with the VLM tokenizer, if locally available.
        Assign ``model.vlm_decode_fn`` directly to override."""
        override = self.__dict__.get("vlm_decode_fn")
        if override is not None:
            return override
        if getattr(self, "_vlm_tokenizer", None) is None:
            path = self.cfg.get("mllama_pretrained_model_name_or_path", None)
            if not path:
                return None
            try:
                from transformers import AutoTokenizer

                self._vlm_tokenizer = AutoTokenizer.from_pretrained(
                    path, local_files_only=True
                )
            except Exception as e:
                logger.warning("VLM tokenizer unavailable for %s: %s", path, e)
                return None
        tok = self._vlm_tokenizer
        return lambda ids: tok.decode(ids, skip_special_tokens=True)


def maybe_load_hf_weights(repo_or_path: str) -> Optional[Dict[str, np.ndarray]]:
    """Best-effort local (no-network) HF weight load: returns numpy state
    dict if ``repo_or_path`` is a local dir with safetensors/bin, else None.
    """
    path = os.path.expanduser(repo_or_path)
    if not os.path.isdir(path):
        cache = os.environ.get("HF_HOME") or os.path.expanduser("~/.cache/huggingface")
        hub_dir = os.path.join(cache, "hub", "models--" + repo_or_path.replace("/", "--"))
        if os.path.isdir(hub_dir):
            snaps = os.path.join(hub_dir, "snapshots")
            if os.path.isdir(snaps) and os.listdir(snaps):
                path = os.path.join(snaps, sorted(os.listdir(snaps))[-1])
        if not os.path.isdir(path):
            return None
    out: Dict[str, np.ndarray] = {}
    import glob

    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            out.update(load_file(f))
        return out
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if bin_files:
        import torch

        from thinkdiff_tpu.models.convert import torch_state_dict_to_numpy

        for f in bin_files:
            out.update(torch_state_dict_to_numpy(
                torch.load(f, map_location="cpu", weights_only=True)
            ))
        return out
    return None
