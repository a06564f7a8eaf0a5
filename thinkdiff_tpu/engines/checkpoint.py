"""Checkpoint manager: orbax when available, msgpack fallback.

Same content semantics as the reference (trainable-only model subtree +
optimizer state + config + epoch, 'checkpoint_{N|best}' naming — reference
thinkdiff/runners/runner_base.py:597-668), stored as a JAX pytree.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, output_dir: str, use_orbax: bool = True):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._orbax = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp.StandardCheckpointer()
            except Exception as e:
                logger.warning("orbax unavailable (%s); msgpack fallback", e)

    def _path(self, tag) -> str:
        return os.path.join(self.output_dir, f"checkpoint_{tag}")

    def save(self, state: Dict[str, Any], epoch: int, config: Optional[Dict] = None,
             is_best: bool = False, tag: Optional[str] = None) -> str:
        tag = tag if tag is not None else ("best" if is_best else str(epoch))
        path = self._path(tag)
        payload = {
            "model": _to_host(state["params"]),
            "opt_state": _to_host(state["opt_state"]),
            "step": int(state["step"]),
            "epoch": epoch,
        }
        if self._orbax is not None:
            # orbax wants a fresh directory
            import shutil

            if os.path.exists(path + ".orbax"):
                shutil.rmtree(path + ".orbax")
            self._orbax.save(path + ".orbax", payload)
            self._orbax.wait_until_finished()
            out = path + ".orbax"
        else:
            from flax import serialization

            with open(path + ".msgpack", "wb") as f:
                f.write(serialization.to_bytes(payload))
            out = path + ".msgpack"
        if config is not None:
            with open(path + ".config.json", "w") as f:
                json.dump(config, f, indent=2, default=str)
        logger.info("Saved checkpoint to %s", out)
        return out

    def load(self, path: str, state_template: Dict[str, Any]) -> Dict[str, Any]:
        template = {
            "model": _to_host(state_template["params"]),
            "opt_state": _to_host(state_template["opt_state"]),
            "step": 0,
            "epoch": 0,
        }
        if path.endswith(".orbax") or os.path.isdir(path):
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(path, template)
        else:
            from flax import serialization

            with open(path, "rb") as f:
                restored = serialization.from_bytes(template, f.read())
        logger.info("Resumed checkpoint from %s (epoch %s)", path,
                    restored.get("epoch"))
        return restored

    def latest(self) -> Optional[str]:
        cands = []
        for name in os.listdir(self.output_dir):
            if name.startswith("checkpoint_") and (
                name.endswith(".orbax") or name.endswith(".msgpack")
            ):
                tag = name[len("checkpoint_"):].split(".")[0]
                if tag.isdigit():
                    cands.append((int(tag), os.path.join(self.output_dir, name)))
        return max(cands)[1] if cands else None
