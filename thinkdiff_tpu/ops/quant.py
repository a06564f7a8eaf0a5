"""Weight-only int8 quantization for frozen towers.

The aligner's T5/Qwen towers are FROZEN — no optimizer state, no weight
grads — so per-output-channel absmax int8 storage halves their HBM footprint
(the v5e-constraint on the training batch size) and halves the weight-read
bandwidth of decode. Dequantize fuses into the consuming matmul under XLA.

This is an opt-in (``quantize_frozen: int8`` in the model config): bf16 is
the parity default.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: np.ndarray) -> Dict[str, np.ndarray]:
    """(in, out) kernel -> {q: int8 (in, out), scale: f32 (out,)}."""
    absmax = np.abs(w).max(axis=0)
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale[None]), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale}


def dequantize_weight(qw) -> jnp.ndarray:
    return qw["q"].astype(jnp.bfloat16) * qw["scale"].astype(jnp.bfloat16)[None]


def quantize_tree(params: Any, min_size: int = 1 << 16) -> Any:
    """Quantize every 2-D 'kernel' leaf bigger than ``min_size`` elements to
    sibling leaves ``kernel_q`` (int8) + ``kernel_scale`` (f32) — the param
    layout QDense declares. Embeddings/norms/biases stay as-is."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if (key == "kernel" and not isinstance(val, dict)
                    and np.asarray(val).ndim == 2
                    and np.asarray(val).size >= min_size):
                qw = quantize_weight(np.asarray(val, np.float32))
                out["kernel_q"] = qw["q"]
                out["kernel_scale"] = qw["scale"]
            else:
                out[key] = rec(val)
        return out

    return rec(params)
