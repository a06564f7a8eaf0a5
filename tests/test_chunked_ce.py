"""Chunked lm_head+CE (ops/chunked_ce) — must match the monolithic path
bit-for-bit in math (softmax is per-row; chunking T changes nothing) while
never materializing full-sequence logits."""

import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder
from thinkdiff_tpu.models.t5 import cross_entropy_loss
from thinkdiff_tpu.ops.chunked_ce import (
    apply_lm_head, chunked_head_cross_entropy,
)
from thinkdiff_tpu.ops.quant import quantize_weight

TINY_T5 = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=1,
               num_decoder_layers=2, num_heads=4, dropout_rate=0.0)


def _rand_batch(rs, b=3, t=10, d=32, vocab=96):
    hidden = rs.randn(b, t, d).astype(np.float32)
    labels = rs.randint(1, vocab, (b, t)).astype(np.int32)
    labels[0, 7:] = -100
    labels[2, 3:] = -100
    return jnp.asarray(hidden), jnp.asarray(labels)


def test_matches_monolithic_fp_loss_and_grad():
    rs = np.random.RandomState(0)
    hidden, labels = _rand_batch(rs)
    head = {"kernel": jnp.asarray(rs.randn(32, 96).astype(np.float32) * 0.1)}

    def full(h):
        return cross_entropy_loss(apply_lm_head(h, head, jnp.float32), labels)

    def chunked(h):
        return chunked_head_cross_entropy(h, labels, head, jnp.float32,
                                          chunk=4)

    lf, gf = jax.value_and_grad(full)(hidden)
    lc, gc = jax.value_and_grad(chunked)(hidden)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gf), atol=1e-6)


def test_ragged_t_pads_with_ignore_index():
    rs = np.random.RandomState(1)
    hidden, labels = _rand_batch(rs, t=10)  # chunk 4 -> pad 2
    head = {"kernel": jnp.asarray(rs.randn(32, 96).astype(np.float32) * 0.1)}
    lc = chunked_head_cross_entropy(hidden, labels, head, jnp.float32, chunk=4)
    lf = cross_entropy_loss(apply_lm_head(hidden, head, jnp.float32), labels)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-6)


def test_w8a8_head_layout_matches_monolithic():
    rs = np.random.RandomState(2)
    hidden, labels = _rand_batch(rs)
    qw = quantize_weight(rs.randn(32, 96).astype(np.float32) * 0.1)
    head = {"kernel_q": jnp.asarray(qw["q"]),
            "kernel_scale": jnp.asarray(qw["scale"]),
            "input_scale": jnp.ones((32,), jnp.float32)}
    lf = cross_entropy_loss(apply_lm_head(hidden, head, jnp.float32), labels)
    lc = chunked_head_cross_entropy(hidden, labels, head, jnp.float32, chunk=4)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-5)
    g = jax.grad(lambda h: chunked_head_cross_entropy(
        h, labels, head, jnp.float32, chunk=4))(hidden)
    assert np.isfinite(np.asarray(g)).all()


def test_aligner_loss_fn_chunked_equals_monolithic():
    rs = np.random.RandomState(3)
    base = {"dtype": "float32", "load_pretrained": False,
            "vlm_hidden_size": 24, "t5_config": TINY_T5}
    m_mono = MllamaT5EmbedDecoder(ConfigNode({**base, "chunked_ce": 0}),
                                  seed=0)
    m_chunk = MllamaT5EmbedDecoder(ConfigNode({**base, "chunked_ce": 4}),
                                   seed=0)
    m_chunk.frozen = m_mono.frozen
    m_chunk.trainable = m_mono.trainable
    batch = {
        "embeds": jnp.asarray(rs.randn(2, 7, 24), jnp.float32),
        "embed_mask": jnp.ones((2, 7), jnp.int32),
        "labels": jnp.asarray(rs.randint(1, 128, (2, 10))),
    }
    lm = float(m_mono.loss_fn(m_mono.trainable, m_mono.frozen, batch))
    lc = float(m_chunk.loss_fn(m_chunk.trainable, m_chunk.frozen, batch))
    np.testing.assert_allclose(lc, lm, rtol=1e-6)
    gm = jax.grad(m_mono.loss_fn)(m_mono.trainable, m_mono.frozen, batch)
    gc = jax.grad(m_chunk.loss_fn)(m_chunk.trainable, m_chunk.frozen, batch)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_remat_ffn_same_loss_and_grad():
    rs = np.random.RandomState(4)
    base = {"dtype": "float32", "load_pretrained": False,
            "vlm_hidden_size": 24, "t5_config": TINY_T5}
    m0 = MllamaT5EmbedDecoder(ConfigNode(base), seed=0)
    m1 = MllamaT5EmbedDecoder(ConfigNode(
        {**base, "t5_config": {**TINY_T5, "remat_ffn": True}}), seed=0)
    m1.frozen = m0.frozen
    m1.trainable = m0.trainable
    batch = {
        "embeds": jnp.asarray(rs.randn(2, 7, 24), jnp.float32),
        "embed_mask": jnp.ones((2, 7), jnp.int32),
        "labels": jnp.asarray(rs.randint(1, 128, (2, 10))),
    }
    l0 = float(m0.loss_fn(m0.trainable, m0.frozen, batch))
    l1 = float(m1.loss_fn(m1.trainable, m1.frozen, batch))
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    g0 = jax.grad(m0.loss_fn)(m0.trainable, m0.frozen, batch)
    g1 = jax.grad(m1.loss_fn)(m1.trainable, m1.frozen, batch)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
