"""Numerical parity of our JAX T5 / ViT against HF torch implementations on
tiny random checkpoints (CPU). This is the weight-transfer guarantee: if tiny
parity holds, flan-t5-xxl / blip2 checkpoints convert losslessly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from thinkdiff_tpu.models.convert import (
    convert_clip_vit, convert_t5, torch_state_dict_to_numpy,
)
from thinkdiff_tpu.models.t5 import (
    T5Config, T5ForConditionalGeneration, cross_entropy_loss, shift_right,
)
from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer


@pytest.fixture(scope="module")
def hf_t5():
    torch.manual_seed(0)
    cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        tie_word_embeddings=False, decoder_start_token_id=0,
    )
    model = transformers.T5ForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_t5(hf_t5):
    cfg = T5Config.tiny()
    params = convert_t5(torch_state_dict_to_numpy(hf_t5.state_dict()))
    return T5ForConditionalGeneration(cfg), {"params": params}


def test_t5_logits_parity(hf_t5, jax_t5):
    model, variables = jax_t5
    rng = np.random.RandomState(0)
    input_ids = rng.randint(1, 128, (2, 9))
    dec_ids = rng.randint(1, 128, (2, 5))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf_t5(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    out = model.apply(
        variables, input_ids=jnp.array(input_ids),
        attention_mask=jnp.array(mask), decoder_input_ids=jnp.array(dec_ids),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_t5_extra_encoder_states_match_hf_embed_concat(hf_t5, jax_t5):
    """Our extra_encoder_states path == HF run with the extra tokens appended
    to the *encoder output* (the reference concatenates projector outputs with
    encoder hidden states before cross-attention)."""
    model, variables = jax_t5
    rng = np.random.RandomState(1)
    input_ids = rng.randint(1, 128, (1, 6))
    dec_ids = rng.randint(1, 128, (1, 4))
    extra = rng.randn(1, 3, 32).astype(np.float32)

    with torch.no_grad():
        enc = hf_t5.encoder(input_ids=torch.tensor(input_ids)).last_hidden_state
        enc_cat = torch.cat([torch.tensor(extra), enc], dim=1)
        ref = hf_t5(
            encoder_outputs=(enc_cat,),
            attention_mask=torch.ones(1, 3 + 6, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()

    out = model.apply(
        variables, input_ids=jnp.array(input_ids),
        decoder_input_ids=jnp.array(dec_ids),
        extra_encoder_states=jnp.array(extra),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_t5_encoderless_decode_parity(hf_t5, jax_t5):
    """Encoder-less mode (LVLM variant): arbitrary states as encoder output."""
    model, variables = jax_t5
    rng = np.random.RandomState(2)
    states = rng.randn(2, 7, 32).astype(np.float32)
    dec_ids = rng.randint(1, 128, (2, 5))
    with torch.no_grad():
        ref = hf_t5(
            encoder_outputs=(torch.tensor(states),),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    out = model.apply(
        variables, method=model.decode_with_encoder_states,
        decoder_input_ids=jnp.array(dec_ids),
        encoder_states=jnp.array(states),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_t5_loss_matches_hf(hf_t5, jax_t5):
    model, variables = jax_t5
    rng = np.random.RandomState(3)
    input_ids = rng.randint(1, 128, (2, 6))
    labels = rng.randint(1, 128, (2, 5))
    labels[1, 3:] = -100
    with torch.no_grad():
        ref_loss = hf_t5(
            input_ids=torch.tensor(input_ids), labels=torch.tensor(labels)
        ).loss.item()
    dec_in = shift_right(jnp.array(labels), 0, 0)
    logits = model.apply(
        variables, input_ids=jnp.array(input_ids), decoder_input_ids=dec_in,
    )
    loss = cross_entropy_loss(logits, jnp.array(labels))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)


def test_blip2_vision_parity():
    torch.manual_seed(0)
    from transformers import Blip2VisionConfig, Blip2VisionModel

    hf_cfg = Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    hf = Blip2VisionModel(hf_cfg).eval()
    sd = torch_state_dict_to_numpy(hf.state_dict())
    params = convert_clip_vit(sd, prefix="")

    cfg = ViTConfig.tiny(
        layer_norm_eps=hf_cfg.layer_norm_eps,
        patch_bias="embeddings.patch_embedding.bias" in sd,
    )
    model = VisionTransformer(cfg)
    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
    out = model.apply(
        {"params": params}, jnp.array(pixels.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
