"""The aligner network: the ONLY trainable parameters in ThinkDiff.

Projector types mirror the reference's ``build_vision_projector``
(reference: thinkdiff/models/blip_vision_t5_decoder.py:31-61):
  - ``linear``: single Dense
  - ``mlpNx_gelu``: N Dense layers with GELU between
  - ``mlpNx_gelu_t5_norm``: same + trailing T5LayerNorm (RMSNorm), whose
    weight may be re-initialized from the T5 encoder's final_layer_norm
    (reference blip_vision_t5_decoder.py:530-536)
  - ``identity``
"""

from __future__ import annotations

import re
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from thinkdiff_tpu.models.t5 import T5LayerNorm


class MLPProjector(nn.Module):
    out_dim: int
    depth: int = 2
    use_t5_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            if i > 0:
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.out_dim, name=f"layer_{i}", dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        if self.use_t5_norm:
            x = T5LayerNorm(self.out_dim, dtype=self.dtype, name="t5_norm")(x)
        return x


class IdentityProjector(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


def build_vision_projector(projector_type: str, out_dim: int,
                           dtype=jnp.float32) -> nn.Module:
    if projector_type == "linear":
        return MLPProjector(out_dim=out_dim, depth=1, dtype=dtype)
    m = re.match(r"^mlp(\d+)x_gelu(_t5_norm)?$", projector_type)
    if m:
        return MLPProjector(
            out_dim=out_dim, depth=int(m.group(1)),
            use_t5_norm=m.group(2) is not None, dtype=dtype,
        )
    if projector_type == "identity":
        return IdentityProjector()
    raise ValueError(f"Unknown projector type: {projector_type}")


def convert_projector_torch(sd, dtype=None):
    """Reference ``mm_projector`` .pth weights -> our params.

    Reference builds nn.Sequential(Linear, GELU, Linear[, T5LayerNorm]) so
    keys look like ``mm_projector.0.weight``, ``mm_projector.2.weight``,
    ``mm_projector.3.weight`` (norm). Sequential indices map to layer_i in
    order of appearance.
    """
    import numpy as np

    by_idx: dict = {}
    for key, val in sd.items():
        m = re.match(r"^(?:mm_projector\.)?(\d+)\.(weight|bias)$", key)
        if not m:
            continue
        arr = np.asarray(val)
        if dtype is not None:
            arr = arr.astype(dtype)
        by_idx.setdefault(int(m.group(1)), {})[m.group(2)] = arr

    flat: dict = {}
    linear_idx = 0
    for idx in sorted(by_idx):
        entry = by_idx[idx]
        w = entry.get("weight")
        if w is not None and w.ndim == 2:
            layer = {"kernel": w.T}
            if "bias" in entry:
                layer["bias"] = entry["bias"]
            flat[f"layer_{linear_idx}"] = layer
            linear_idx += 1
        elif w is not None:  # 1-D weight -> the trailing T5LayerNorm
            flat["t5_norm"] = {"weight": w}
    return flat
