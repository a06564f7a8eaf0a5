"""Aligner model tests on tiny configs: loss computes, grads flow only to the
projector, reference-checkpoint conversion maps correctly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.models.aligner_clip import BlipVisionT5Decoder
from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder
from thinkdiff_tpu.core.registry import registry

TINY_T5 = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_decoder_layers=2, num_heads=4, dropout_rate=0.0)
TINY_VIT = dict(hidden_size=16, intermediate_size=32, num_layers=2,
                num_heads=4, image_size=28, patch_size=14)


@pytest.fixture(scope="module")
def clip_model():
    cfg = ConfigNode({
        "dtype": "float32", "load_pretrained": False,
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "layer_norm_reinit_weight_with_language_encoder": True,
        "t5_config": TINY_T5, "vision_config": TINY_VIT,
    })
    return BlipVisionT5Decoder(cfg)


@pytest.fixture(scope="module")
def lvlm_model():
    cfg = ConfigNode({
        "dtype": "float32", "load_pretrained": False,
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "vlm_hidden_size": 24, "t5_config": TINY_T5,
    })
    return MllamaT5EmbedDecoder(cfg)


def _clip_batch(b=2):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.array(rng.randn(b, 28, 28, 3), jnp.float32),
        "input_ids": jnp.array(rng.randint(1, 128, (b, 6))),
        "input_mask": jnp.ones((b, 6), jnp.int32),
        "labels": jnp.array(rng.randint(1, 128, (b, 5))),
    }


def test_registry_names():
    assert registry.get_model_class("blip-vision-t5-decoder") is BlipVisionT5Decoder
    assert registry.get_model_class("mllama-vllm-t5-embed-decoder-2") is MllamaT5EmbedDecoder
    assert registry.get_model_class("mllama-vllm-t5-embed-decoder-5") is not None


def test_clip_loss_and_projector_only_grads(clip_model):
    m = clip_model
    batch = _clip_batch()
    loss, grads = jax.value_and_grad(m.loss_fn)(m.trainable, m.frozen, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = jax.tree.reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0
    )
    assert gnorm > 0


def test_clip_ln_reinit_from_t5_encoder(clip_model):
    m = clip_model
    np.testing.assert_array_equal(
        np.asarray(m.trainable["projector"]["t5_norm"]["weight"]),
        np.asarray(m.frozen["t5"]["encoder"]["final_norm"]["weight"]),
    )


def test_clip_forward_encoder_shape(clip_model):
    m = clip_model
    out = m.forward_encoder(np.random.randn(2, 28, 28, 3).astype(np.float32))
    assert out.shape == (2, 5, 32)  # 4 patches + CLS -> d_model


def test_lvlm_loss_encoder_deleted(lvlm_model):
    m = lvlm_model
    assert "encoder" not in m.frozen["t5"]
    rng = np.random.RandomState(1)
    batch = {
        "embeds": jnp.array(rng.randn(2, 7, 24), jnp.float32),
        "embed_mask": jnp.ones((2, 7), jnp.int32),
        "labels": jnp.array(rng.randint(1, 128, (2, 5))),
    }
    loss = m.loss_fn(m.trainable, m.frozen, batch)
    assert np.isfinite(float(loss))
    # masked embeds affect loss
    batch2 = dict(batch)
    batch2["embed_mask"] = batch["embed_mask"].at[:, 3:].set(0)
    loss2 = m.loss_fn(m.trainable, m.frozen, batch2)
    assert abs(float(loss) - float(loss2)) > 1e-6


def test_lvlm_generate_shapes(lvlm_model):
    m = lvlm_model
    out = m.generate(np.random.randn(2, 4, 24).astype(np.float32), max_new_tokens=3)
    assert out.shape == (2, 3)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 128).all()


def test_reference_projector_checkpoint_conversion(lvlm_model):
    torch = pytest.importorskip("torch")
    m = lvlm_model
    # Build a reference-style Sequential state dict
    sd = {
        "mm_projector.0.weight": torch.randn(32, 24),
        "mm_projector.0.bias": torch.randn(32),
        "mm_projector.2.weight": torch.randn(32, 32),
        "mm_projector.2.bias": torch.randn(32),
        "mm_projector.3.weight": torch.randn(32),
    }
    converted = m.convert_reference_checkpoint(
        {k: v.numpy() for k, v in sd.items()}
    )
    proj = converted["projector"]
    assert proj["layer_0"]["kernel"].shape == (24, 32)
    assert proj["layer_1"]["kernel"].shape == (32, 32)
    assert proj["t5_norm"]["weight"].shape == (32,)
    np.testing.assert_allclose(
        proj["layer_0"]["kernel"], sd["mm_projector.0.weight"].numpy().T
    )
    m.load_trainable(converted)
    out = m.project(m.trainable, jnp.ones((1, 2, 24)))
    assert out.shape == (1, 2, 32)


def test_reference_projector_checkpoint_export_roundtrip(lvlm_model):
    """export_reference_checkpoint is the exact inverse of
    convert_reference_checkpoint — an aligner trained here loads under the
    reference stack with the original Sequential key layout."""
    m = lvlm_model
    sd = m.export_reference_checkpoint(m.trainable_params())
    assert set(sd) == {
        "mm_projector.0.weight", "mm_projector.0.bias",
        "mm_projector.2.weight", "mm_projector.2.bias",
        "mm_projector.3.weight",
    }
    # torch Linear stores (out, in): transposed kernels
    proj = m.trainable_params()["projector"]
    assert sd["mm_projector.0.weight"].shape == proj["layer_0"]["kernel"].shape[::-1]
    back = m.convert_reference_checkpoint(sd)["projector"]
    for k in ("layer_0", "layer_1"):
        np.testing.assert_array_equal(back[k]["kernel"],
                                      np.asarray(proj[k]["kernel"]))
        np.testing.assert_array_equal(back[k]["bias"],
                                      np.asarray(proj[k]["bias"]))
    np.testing.assert_array_equal(back["t5_norm"]["weight"],
                                  np.asarray(proj["t5_norm"]["weight"]))


def test_projector_convert_accepts_bare_linear_form():
    """Reference projector_type 'linear' is a bare nn.Linear — keys carry
    no Sequential index (reference blip_vision_t5_decoder.py:34-35)."""
    from thinkdiff_tpu.models.projector import (
        convert_projector_torch, export_projector_torch)

    w = np.random.randn(32, 24).astype(np.float32)
    b = np.random.randn(32).astype(np.float32)
    flat = convert_projector_torch(
        {"mm_projector.weight": w, "mm_projector.bias": b})
    np.testing.assert_array_equal(flat["layer_0"]["kernel"], w.T)
    out = export_projector_torch(flat, "linear")
    np.testing.assert_array_equal(out["mm_projector.weight"], w)
    np.testing.assert_array_equal(out["mm_projector.bias"], b)


def test_lvlm_eval_metrics_matches_loss_and_bounds(lvlm_model):
    """eval_metrics_fn: loss equals loss_fn (same forward, chunked stats
    numerics are per-row softmax so chunking changes nothing) and token
    accuracy is a sane [0,1] fraction over non-ignored labels."""
    m = lvlm_model
    rng = np.random.RandomState(3)
    labels = rng.randint(1, 128, (2, 5))
    labels[0, 3:] = -100
    batch = {
        "embeds": jnp.array(rng.randn(2, 7, 24), jnp.float32),
        "embed_mask": jnp.ones((2, 7), jnp.int32),
        "labels": jnp.array(labels),
    }
    loss = float(m.loss_fn(m.trainable, m.frozen, batch))
    eloss, correct, total = (float(x) for x in
                             m.eval_metrics_fn(m.trainable, m.frozen, batch))
    assert np.isclose(loss, eloss, rtol=1e-4)
    assert total == float((labels != -100).sum())
    assert 0.0 <= correct <= total


def test_clip_eval_metrics_matches_loss(clip_model):
    m = clip_model
    batch = _clip_batch()
    loss = float(m.loss_fn(m.trainable, m.frozen, batch))
    eloss, correct, total = (float(x) for x in
                             m.eval_metrics_fn(m.trainable, m.frozen, batch))
    assert np.isclose(loss, eloss, rtol=1e-4)
    assert total == float(np.prod(batch["labels"].shape))
    assert 0.0 <= correct <= total


def test_ce_stats_perfect_prediction_accuracy():
    """Planted logits: argmax == label everywhere -> token_acc 1.0; the
    chunked and monolithic stats paths agree."""
    from thinkdiff_tpu.models.t5 import ce_stats
    from thinkdiff_tpu.ops.chunked_ce import chunked_head_ce_stats

    rs = np.random.RandomState(0)
    b, t, d, v = 2, 9, 8, 16
    labels = rs.randint(0, v, (b, t))
    labels[1, 6:] = -100
    hidden = jnp.array(rs.randn(b, t, d), jnp.float32)
    head = {"kernel": jnp.array(rs.randn(d, v) * 0.1, jnp.float32)}
    logits = hidden @ head["kernel"]
    l0, c0, n0 = ce_stats(logits, jnp.array(labels))
    l1, c1, n1 = chunked_head_ce_stats(
        hidden, jnp.array(labels), head, dtype=jnp.float32, chunk=4)
    assert np.isclose(float(l0), float(l1), rtol=1e-5)
    assert float(c0) == float(c1) and float(n0) == float(n1)
    # plant: labels = argmax(logits) -> accuracy exactly 1
    planted = np.array(jnp.argmax(logits, axis=-1))
    planted[1, 6:] = -100
    _, c2, n2 = chunked_head_ce_stats(
        hidden, jnp.array(planted), head, dtype=jnp.float32, chunk=4)
    assert float(c2) == float(n2) == float((planted != -100).sum())


def test_evaluation_best_metric_token_acc(lvlm_model):
    """tasks.BaseTask.evaluation with best_metric=token_acc drives
    agg_metrics from accuracy; default stays -loss (reference behavior)."""
    from thinkdiff_tpu.tasks.base_task import BaseTask

    m = lvlm_model

    class _Trainer:
        model = m
        frozen = m.frozen

        def prepare_batch(self, b):
            return b

        def eval_step(self, state, batch):
            return m.loss_fn(state["params"], m.frozen, batch)

        def eval_metrics_step(self, state, batch):
            return m.eval_metrics_fn(state["params"], m.frozen, batch)

    rng = np.random.RandomState(5)
    batches = [{
        "embeds": jnp.array(rng.randn(2, 7, 24), jnp.float32),
        "embed_mask": jnp.ones((2, 7), jnp.int32),
        "labels": jnp.array(rng.randint(1, 128, (2, 5))),
    } for _ in range(2)]
    state = {"params": m.trainable}
    task = BaseTask()
    out_acc = task.evaluation(_Trainer(), state, iter(batches),
                              best_metric="token_acc")
    assert "token_acc" in out_acc
    assert out_acc["agg_metrics"] == out_acc["token_acc"]
    assert 0.0 <= out_acc["token_acc"] <= 1.0
    out_loss = task.evaluation(_Trainer(), state, iter(batches))
    assert out_loss["agg_metrics"] == -out_loss["loss"]
    assert "token_acc" not in out_loss
