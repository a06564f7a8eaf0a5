"""Normalization ops.

T5LayerNorm (no mean subtraction, no bias — reference relies on HF's
T5LayerNorm inside transformers) is mathematically RMSNorm, so one fused
Pallas kernel serves T5, Qwen2 (RMSNorm) and the aligner's projector norm.
Plain LayerNorm is kept in XLA (it fuses fine); the Pallas rmsnorm exists for
the inference hot paths where we fuse the scale multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rmsnorm_reference(x, scale, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _rmsnorm_kernel(x_ref, s_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _rmsnorm_pallas(x, scale, eps: float, block_rows: int = 256):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    block_rows = min(block_rows, max(n, 8))
    pad = -(-n // block_rows) * block_rows - n
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=((n + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
    )(x2, scale)
    if pad:
        out = out[:n]
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rmsnorm(x, scale, eps: float = 1e-6):
    """Fused RMSNorm: pallas on TPU, XLA elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return _rmsnorm_pallas(x, scale, eps)
    return rmsnorm_reference(x, scale, eps)


def _rms_fwd(x, scale, eps):
    return rmsnorm(x, scale, eps), (x, scale)


def _rms_bwd(eps, res, g):
    x, scale = res
    _, vjp = jax.vjp(lambda x, s: rmsnorm_reference(x, s, eps), x, scale)
    return vjp(g)


rmsnorm.defvjp(_rms_fwd, _rms_bwd)

# T5LayerNorm == RMSNorm (HF T5LayerNorm has no mean subtraction/bias).
t5_layernorm = rmsnorm


def layernorm(x, scale, bias, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
