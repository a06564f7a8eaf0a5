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


def _absmax_quant_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(M, K) float -> per-row absmax int8: (int8 (M, K), f32 scale (M,))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def _use_fused_s8(rows: int, k: int, n: int) -> bool:
    """Fused-epilogue Pallas s8 kernel beats the XLA chain only in a
    measured window: rows in [512, 2048] (scripts/bench_s8_matmul — at
    m=1024 qkv 1.178 -> 1.072 ms; at m=8192 prefill shapes XLA wins, at
    m=128 lm_head chunks XLA wins) and 128-aligned dims."""
    from thinkdiff_tpu.ops.int8_matmul import s8_supported

    return (jax.default_backend() in ("tpu", "axon")
            and 512 <= rows <= 2048 and s8_supported(k, n))


def _w8a8_fwd_impl(x, q, scale):
    shape = x.shape
    xm = x.reshape(-1, shape[-1])
    xq, sx = _absmax_quant_rows(xm)
    # NOTE: quantize-IN-kernel (int8_matmul._s8_matmul_fused_qx) was built
    # and measured as the round-5 roofline's named lever — it LOSES to this
    # pre-pass + fused-dot split at every geometry tried (195.6 -> 188.7
    # samples/s at bR=256, -> 194.9 at bR=512/bn=256; bR=512/bn=512 VMEM-
    # OOMs by 1.6 MB). XLA fuses the absmax pass with the producer, and the
    # bf16 x tile + int8 scratch squeeze the weight pipeline's VMEM. The
    # kernel stays (tested) as the record of the attempt.
    if _use_fused_s8(xm.shape[0], q.shape[0], q.shape[1]):
        from thinkdiff_tpu.ops.int8_matmul import _s8_matmul_fused

        y = _s8_matmul_fused(xq, sx, q, scale, x.dtype)
        return y.reshape(*shape[:-1], q.shape[1])
    acc = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx[:, None] * scale[None, :].astype(jnp.float32)
    return y.reshape(*shape[:-1], q.shape[1]).astype(x.dtype)


@jax.custom_vjp
def int8_dynamic_matmul(x, q, scale):
    """w8a8 matmul: both operands hit the MXU as int8 (2x bf16 peak on v5e,
    measured 1.37x end-to-end at flan-t5-xxl shapes — PERF.md).

    ``x (..., K)`` float activations, quantized per-row (per-token) absmax
    on the fly; ``q (K, N)`` int8 weights with per-output-channel ``scale
    (N,)`` (ops/quant.quantize_weight layout). The weights are FROZEN by
    contract: the custom VJP returns dx only.

    Backward folds the output scales into dy, requantizes per-row, and runs
    a second s8xs8 dot over the N axis:
        dx_j = sum_f dy_f * scale_f * q_{jf}  ~=  sg * sum_f g^q_f q_{jf}.
    """
    return _w8a8_fwd_impl(x, q, scale)


def _w8a8_fwd(x, q, scale):
    return _w8a8_fwd_impl(x, q, scale), (q, scale)


def _w8a8_bwd(res, dy):
    q, scale = res
    # x had shape dy.shape[:-1] + (K,) and dy's dtype (fwd casts to x.dtype)
    dym = dy.reshape(-1, dy.shape[-1])
    g = dym.astype(jnp.float32) * scale[None, :].astype(jnp.float32)
    gq, sg = _absmax_quant_rows(g)
    k, n = q.shape
    if k > n and _use_fused_s8(dym.shape[0], k, n):
        # XLA's s8 g @ W^T is pathologically slow when the OUTPUT dim
        # exceeds the contraction dim (wo 10240x4096: 2.70 ms vs the
        # Pallas contraction-blocked kernel's 1.10 — bench_s8_matmul);
        # elsewhere (qkv/wi: n >> k) XLA wins and keeps the dot.
        from thinkdiff_tpu.ops.int8_matmul import _s8_matmul_fused_bwd

        dx = _s8_matmul_fused_bwd(gq, sg, q, dy.dtype).reshape(
            *dy.shape[:-1], k)
        return (dx, np.zeros(q.shape, dtype=jax.dtypes.float0),
                jnp.zeros_like(scale))
    acc = jax.lax.dot_general(gq, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    dx = (acc.astype(jnp.float32) * sg[:, None]).reshape(
        *dy.shape[:-1], q.shape[0])
    return (dx.astype(dy.dtype),
            np.zeros(q.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(scale))


int8_dynamic_matmul.defvjp(_w8a8_fwd, _w8a8_bwd)


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def _gen_normal_leaf(key, shape, dtype_name):
    return (jax.random.normal(key, shape, jnp.float32) * 0.05
            ).astype(jnp.dtype(dtype_name))


@partial(jax.jit, static_argnums=(1,))
def _gen_quant_leaf(key, shape):
    w = jax.random.normal(key, shape, jnp.float32) * 0.05
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w / scale[None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_leaves_on_device(shapes: Any, seed: int = 0,
                              w8a8: bool = False) -> Any:
    """Random-init a param tree of ``jax.eval_shape`` structs directly in
    quantized form, leaf-by-leaf on device: every 2-D ``kernel`` leaf is
    born as ``kernel_q`` int8 + ``kernel_scale`` (the quantize_tree /
    QDense layout); other float leaves are N(0, 0.05); int leaves zeros.

    The fp tower never exists anywhere in full — materializing 6.5B
    gaussians in host numpy took minutes and shipping them through a
    tunnel-attached device takes longer; this is seconds (the jit cache
    collapses the T5 stack's repeated shapes)."""
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def rec(node):
        if not isinstance(node, dict):
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            if np.issubdtype(np.dtype(node.dtype), np.floating):
                return _gen_normal_leaf(k, tuple(node.shape),
                                        np.dtype(node.dtype).name)
            return jnp.zeros(node.shape, node.dtype)
        out = {}
        for name, val in node.items():
            if (name == "kernel" and not isinstance(val, dict)
                    and len(val.shape) == 2):
                counter[0] += 1
                k = jax.random.fold_in(key, counter[0])
                q, scale = _gen_quant_leaf(k, tuple(val.shape))
                out["kernel_q"] = q
                out["kernel_scale"] = scale
                if w8a8:
                    out["input_scale"] = jnp.ones(
                        (val.shape[0],), jnp.float32)
            else:
                out[name] = rec(val)
        return out

    return rec(dict(shapes) if isinstance(shapes, dict) else shapes)


def quantize_tree(params: Any, min_size: int = 1 << 16,
                  w8a8: bool = False) -> Any:
    """Quantize every 2-D 'kernel' leaf bigger than ``min_size`` elements to
    sibling leaves ``kernel_q`` (int8) + ``kernel_scale`` (f32) — the param
    layout QDense declares. Embeddings/norms/biases stay as-is. With
    ``w8a8=True`` an identity ``input_scale`` (SmoothQuant channel
    equalizer slot, QDense w8a8 path) is emitted alongside."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if (key == "kernel" and not isinstance(val, dict)
                    and np.asarray(val).ndim == 2
                    and np.asarray(val).size >= min_size):
                arr = np.asarray(val, np.float32)
                qw = quantize_weight(arr)
                out["kernel_q"] = qw["q"]
                out["kernel_scale"] = qw["scale"]
                if w8a8:
                    out["input_scale"] = np.ones(arr.shape[0], np.float32)
            else:
                out[key] = rec(val)
        return out

    return rec(params)


def quantize_like(params: Any, ref_struct: Any) -> Any:
    """Structure-guided quantization: quantize exactly the kernels the
    quantized model declares as QDense triplets, leaving every other leaf
    (plain nn.Dense kernels, norms, embeddings, convs) untouched.

    ``ref_struct`` is the quantized model's param pytree structure, e.g.
    ``jax.eval_shape(model.init, ...)["params"]``. Unlike quantize_tree's
    size heuristic this is safe for models that MIX QDense with plain
    nn.Dense — FLUX/CogVideoX time-text embedders are plain Dense
    (models/flux.py:139-142) while every block projection is QDense — so
    it is the real-checkpoint loading path for quantized diffusion
    serving (w8a8 is the measured FLUX serving default, PERF.md)."""

    def rec(p, r):
        if not isinstance(p, dict) or not isinstance(r, dict):
            return p
        out = {}
        for k, v in p.items():
            if k == "kernel" and "kernel_q" in r:
                qw = quantize_weight(np.asarray(v, np.float32))
                out["kernel_q"] = qw["q"]
                out["kernel_scale"] = qw["scale"]
                if "input_scale" in r:
                    out["input_scale"] = np.ones(
                        np.asarray(v).shape[0], np.float32)
            else:
                out[k] = rec(v, r.get(k) if isinstance(r, dict) else None)
        return out

    return rec(params, ref_struct)


def collect_act_stats(module, variables, *args, method=None,
                      stats: Any = None, **kwargs) -> Any:
    """Run one forward with the 'act_stats' collection mutable and fold the
    per-channel |x| maxima into ``stats`` (elementwise max across calls)."""
    _, mut = module.apply(variables, *args, method=method,
                          mutable=["act_stats"], **kwargs)
    new = mut["act_stats"]
    if stats is None:
        return new
    return jax.tree.map(jnp.maximum, stats, new)


def equalize_quantized_tree(params: Any, act_stats: Any,
                            alpha: float = 0.5) -> Any:
    """SmoothQuant-style channel equalization of an already-quantized tree.

    For each QDense node (kernel_q/kernel_scale[/input_scale]) with
    calibrated per-channel activation maxima (``collect_act_stats``),
    migrate activation outliers into the frozen weights:

        s_j = amax_x_j^alpha / amax_w_j^(1-alpha)
        W' = W * s[:, None]   (requantized per-output absmax)
        x' = x / s            (QDense divides by ``input_scale``)

    Per-token absmax activation quant then sees a flattened channel
    profile; the product x'W' is mathematically unchanged. Composes:
    repeated calibration folds into the existing input_scale — for the
    SCALES. Weight precision does not: each pass re-quantizes from the
    already-dequantized int8 weights (q*scale), stacking ~1 extra LSB of
    rounding error per pass. Calibrate once per deployment from freshly
    converted weights; if repeated calibration is expected, keep an fp32
    shadow of the originals and re-run from that."""

    def rec(p, s):
        if not isinstance(p, dict):
            return p
        if "kernel_q" in p and isinstance(s, dict) and "amax" in s:
            amax_x = np.asarray(s["amax"], np.float32)
            q = np.asarray(p["kernel_q"], np.float32)
            scale = np.asarray(p["kernel_scale"], np.float32)
            w = q * scale[None, :]
            amax_w = np.maximum(np.abs(w).max(axis=1), 1e-8)
            s_ch = np.power(np.maximum(amax_x, 1e-8), alpha) / np.power(
                amax_w, 1.0 - alpha)
            s_ch = np.where(amax_x <= 0, 1.0, np.clip(s_ch, 1e-4, 1e4))
            qw = quantize_weight(w * s_ch[:, None])
            prev = np.asarray(
                p.get("input_scale", np.ones_like(s_ch)), np.float32)
            out = {k: v for k, v in p.items()}
            out["kernel_q"] = qw["q"]
            out["kernel_scale"] = qw["scale"]
            out["input_scale"] = prev * s_ch
            return out
        return {k: rec(v, s.get(k) if isinstance(s, dict) else None)
                for k, v in p.items()}

    return rec(params, act_stats)
