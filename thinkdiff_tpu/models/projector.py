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
        # Sequential form (mlpNx_*): ``mm_projector.<idx>.weight``; bare
        # nn.Linear form (projector_type 'linear',
        # reference blip_vision_t5_decoder.py:34-35): ``mm_projector.weight``
        m = re.match(r"^(?:mm_projector\.)?(?:(\d+)\.)?(weight|bias)$", key)
        if not m:
            continue
        arr = np.asarray(val)
        if dtype is not None:
            arr = arr.astype(dtype)
        by_idx.setdefault(int(m.group(1) or 0), {})[m.group(2)] = arr

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


def export_projector_torch(flat, projector_type: Optional[str] = None,
                           prefix: str = "mm_projector"):
    """Inverse of ``convert_projector_torch``: our flat projector params ->
    a reference-loadable state dict (torch Sequential key layout of
    ``build_vision_projector``, reference blip_vision_t5_decoder.py:31-61).

    ``projector_type=None`` infers the type from the param structure
    (N ``layer_i`` entries + optional ``t5_norm``). Note the reference's
    ``mlpNx_gelu_t5_norm`` for N > 2 interleaves a norm after EVERY extra
    linear — this framework (and the released checkpoints) only use the
    N = 2 single-trailing-norm shape, so deeper norm variants refuse to
    export rather than emit a structurally different module.
    """
    import numpy as np

    linear_keys = sorted((k for k in flat if k.startswith("layer_")),
                         key=lambda k: int(k.split("_")[1]))
    has_norm = "t5_norm" in flat
    if projector_type is None:
        n = len(linear_keys)
        projector_type = f"mlp{n}x_gelu" + ("_t5_norm" if has_norm else "")
    out = {}
    if projector_type == "linear":
        layer = flat["layer_0"]
        out[f"{prefix}.weight"] = np.asarray(layer["kernel"]).T
        if "bias" in layer:
            out[f"{prefix}.bias"] = np.asarray(layer["bias"])
        return out
    m = re.match(r"^mlp(\d+)x_gelu(_t5_norm)?$", projector_type)
    if not m:
        raise ValueError(f"Unknown projector type: {projector_type}")
    use_norm = m.group(2) is not None
    if use_norm and len(linear_keys) > 2:
        raise ValueError(
            "mlpNx_gelu_t5_norm export only supports N <= 2 (the reference "
            "interleaves norms per extra linear for deeper stacks)")
    idx = 0
    for i, k in enumerate(linear_keys):
        if i > 0:
            idx += 1  # the GELU slot in the reference Sequential
        layer = flat[k]
        out[f"{prefix}.{idx}.weight"] = np.asarray(layer["kernel"]).T
        if "bias" in layer:
            out[f"{prefix}.{idx}.bias"] = np.asarray(layer["bias"])
        idx += 1
    if use_norm:
        out[f"{prefix}.{idx}.weight"] = np.asarray(flat["t5_norm"]["weight"])
    return out
