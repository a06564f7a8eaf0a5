"""Chunked (streaming) lm_head + softmax cross-entropy.

The aligner train step's single largest activation is the logits chain:
at the 128/128 bucket, batch 16, flan-t5-xxl vocab 32128, full-sequence
logits are 2048 x 32128 — ~263 MB as f32 log-probs, and the autodiff chain
keeps several copies alive (logits, logp, dlogits), ~1 GB total. That chain
— not the model — set the round-2 batch ceiling (PERF.md "memory ceiling";
batch 24/32 OOMed).

This op never materializes full-sequence logits: it scans the decoder's
final hidden states over token chunks, computes each chunk's logits,
per-token log-softmax and label log-likelihood, and accumulates scalar
(sum_ll, token_count). The chunk body is ``jax.checkpoint``-ed, so the
backward recomputes each chunk's logits instead of saving them: peak
logits memory drops from O(B*T*V) to O(B*chunk*V), while the math is
bitwise-identical per token (softmax is per-row; chunking over T touches
nothing). The lm_head weights are FROZEN in this framework (reference
trains only the projector — mllama_vllm_t5_embed_decoder_2.py:423-431),
so the backward needs only d(hidden); no weight-gradient accumulator.

Mirrors QDense's three kernel layouts (models/t5.py QDense): fp kernel,
weight-only int8 (kernel_q/kernel_scale), and w8a8 (+input_scale,
s8xs8 MXU dot via ops/quant.int8_dynamic_matmul).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def apply_lm_head(x: jnp.ndarray, head: Dict[str, Any], dtype: Any) -> jnp.ndarray:
    """Apply an lm_head QDense param dict to ``x (..., D)`` -> ``(..., V)``.

    Layout-compatible with models/t5.py QDense: {kernel} | {kernel_q,
    kernel_scale} | {kernel_q, kernel_scale, input_scale} (w8a8)."""
    if "kernel" in head:
        return jnp.dot(x.astype(dtype), head["kernel"].astype(dtype),
                       preferred_element_type=dtype)
    q, scale = head["kernel_q"], head["kernel_scale"]
    if "input_scale" in head:
        from thinkdiff_tpu.ops.quant import int8_dynamic_matmul

        inv_s = 1.0 / head["input_scale"].astype(dtype)
        return int8_dynamic_matmul(x.astype(dtype) * inv_s, q, scale)
    y = jnp.dot(x.astype(dtype), q.astype(dtype), preferred_element_type=dtype)
    return y * scale.astype(dtype)[None]


def chunked_head_cross_entropy(
    hidden: jnp.ndarray,
    labels: jnp.ndarray,
    head: Dict[str, Any],
    dtype: Any = jnp.bfloat16,
    chunk: int = 32,
    ignore_index: int = -100,
) -> jnp.ndarray:
    """Token-mean CE of ``lm_head(hidden)`` vs ``labels`` without full logits.

    hidden (B, T, D) decoder output, labels (B, T) with ``ignore_index``
    padding. Numerically identical to
    ``cross_entropy_loss(apply_lm_head(hidden), labels)`` — log-softmax is
    per-row, so chunking the T axis changes nothing — but peak memory is
    O(B * chunk * V) instead of O(B * T * V).
    """
    b, t, d = hidden.shape
    if t % chunk:
        pad = chunk - t % chunk
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=ignore_index)
        t += pad
    n = t // chunk
    # (n, B, chunk, ...) scan layout
    h_chunks = hidden.reshape(b, n, chunk, d).transpose(1, 0, 2, 3)
    y_chunks = labels.reshape(b, n, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def body(carry, xs):
        h, y = xs
        logits = apply_lm_head(h, head, dtype).astype(jnp.float32)
        valid = y != ignore_index
        safe = jnp.where(valid, y, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        s, c = carry
        return (s + jnp.sum(ll * valid),
                c + jnp.sum(valid.astype(jnp.float32))), None

    (sum_ll, count), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.float32(0.0)), (h_chunks, y_chunks))
    return -sum_ll / jnp.maximum(count, 1.0)


def chunked_head_ce_stats(
    hidden: jnp.ndarray,
    labels: jnp.ndarray,
    head: Dict[str, Any],
    dtype: Any = jnp.bfloat16,
    chunk: int = 32,
    ignore_index: int = -100,
):
    """Eval-side variant of :func:`chunked_head_cross_entropy` that also
    accumulates teacher-forced next-token accuracy (argmax(logits) == label
    over non-ignored positions). Returns ``(loss, n_correct, n_tokens)``
    scalars. Used by the optional metric-driven best-checkpoint selection
    (``run.best_metric: token_acc`` — the reference selects on loss only,
    base_task ``agg_metrics``; this is the framework's opt-in upgrade).
    No ``jax.checkpoint``: eval runs without autodiff, so chunk logits are
    freed as the scan advances."""
    b, t, d = hidden.shape
    if t % chunk:
        pad = chunk - t % chunk
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=ignore_index)
        t += pad
    n = t // chunk
    h_chunks = hidden.reshape(b, n, chunk, d).transpose(1, 0, 2, 3)
    y_chunks = labels.reshape(b, n, chunk).transpose(1, 0, 2)

    def body(carry, xs):
        h, y = xs
        logits = apply_lm_head(h, head, dtype).astype(jnp.float32)
        valid = y != ignore_index
        safe = jnp.where(valid, y, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        hit = (jnp.argmax(logits, axis=-1) == safe) & valid
        s, c, k = carry
        return (s + jnp.sum(ll * valid),
                c + jnp.sum(valid.astype(jnp.float32)),
                k + jnp.sum(hit.astype(jnp.float32))), None

    (sum_ll, count, correct), _ = jax.lax.scan(
        body, (jnp.float32(0.0),) * 3, (h_chunks, y_chunks))
    return -sum_ll / jnp.maximum(count, 1.0), correct, count
