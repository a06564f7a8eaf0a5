"""Numerical parity of our JAX Qwen2-VL against HF torch on a tiny random
checkpoint: vision tower + M-RoPE decoder + hidden-state tap + KV decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from thinkdiff_tpu.models.qwen2_vl import (
    Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower, convert_qwen2_vl,
    get_mrope_position_ids, vision_cos_sin, vision_rot_pos_emb,
)
from thinkdiff_tpu.models.convert import torch_state_dict_to_numpy


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=4, in_channels=3,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
        ),
        tie_word_embeddings=False,
        image_token_id=250, video_token_id=251,
        vision_start_token_id=249, vision_end_token_id=248,
    )
    return transformers.Qwen2VLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = Qwen2VLConfig.tiny()
    params = convert_qwen2_vl(torch_state_dict_to_numpy(hf_model.state_dict()))
    vision = Qwen2VisionTower(cfg.vision)
    lm = Qwen2VLModel(cfg)
    return cfg, params, vision, lm


def _make_inputs(cfg, n_text_pre=3, grid=(1, 4, 4)):
    rs = np.random.RandomState(0)
    t, h, w = grid
    n_patches = t * h * w
    n_img_tokens = n_patches // (cfg.vision.spatial_merge_size ** 2)
    pixel_values = rs.randn(n_patches, cfg.vision.patch_dim).astype(np.float32)
    ids = (
        list(rs.randint(1, 200, n_text_pre))
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_img_tokens
        + list(rs.randint(1, 200, 3))
    )
    return np.array(ids, np.int64), pixel_values, np.array([grid], np.int64)


def _jax_forward(cfg, params, vision, lm, ids, pixel_values, grid_thw):
    merge = cfg.vision.spatial_merge_size
    pos_hw = vision_rot_pos_emb(grid_thw, merge)
    cos, sin = vision_cos_sin(pos_hw, cfg.vision.head_dim)
    img_embeds = vision.apply(
        {"params": params["vision"]}, jnp.asarray(pixel_values),
        jnp.asarray(cos), jnp.asarray(sin),
    )
    img_mask = (ids == cfg.image_token_id).astype(np.int32)[None]
    # scatter image embeds into their token positions
    full_img = np.zeros((1, len(ids), cfg.hidden_size), np.float32)
    full_img[0, img_mask[0] > 0] = np.asarray(img_embeds, np.float32)
    pos, delta = get_mrope_position_ids(
        ids, grid_thw, cfg.image_token_id, merge
    )
    logits, hidden, _ = lm.apply(
        {"params": params["lm"]},
        input_ids=jnp.asarray(ids)[None],
        position_ids=jnp.asarray(pos)[:, None, :],
        image_embeds=jnp.asarray(full_img),
        image_mask=jnp.asarray(img_mask),
    )
    return np.asarray(logits), np.asarray(hidden), delta


def test_vision_and_decoder_logits_parity(hf_model, jax_setup):
    cfg, params, vision, lm = jax_setup
    ids, pixel_values, grid_thw = _make_inputs(cfg)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(pixel_values),
            image_grid_thw=torch.tensor(grid_thw),
            output_hidden_states=True,
        )
    logits, hidden, _ = _jax_forward(cfg, params, vision, lm, ids,
                                     pixel_values, grid_thw)
    np.testing.assert_allclose(
        logits[0], ref.logits[0].numpy(), atol=3e-4, rtol=1e-3
    )


def test_hidden_tap_matches_hf_final_hidden(hf_model, jax_setup):
    """Our 'model.norm' tap must equal HF's last hidden state (the layer the
    reference extracts embeddings from)."""
    cfg, params, vision, lm = jax_setup
    ids, pixel_values, grid_thw = _make_inputs(cfg)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(pixel_values),
            image_grid_thw=torch.tensor(grid_thw),
            output_hidden_states=True,
        )
    _, hidden, _ = _jax_forward(cfg, params, vision, lm, ids,
                                pixel_values, grid_thw)
    # HF hidden_states[-1] is pre-norm; the norm tap equals logits @ pinv is
    # awkward — instead compare our hidden through lm_head vs HF logits.
    ref_hidden = ref.hidden_states[-1][0].numpy()  # pre-final-norm in HF? no:
    # HF applies norm before lm_head; hidden_states[-1] IS post-norm output.
    np.testing.assert_allclose(hidden[0], ref_hidden, atol=3e-4, rtol=1e-3)


def test_kv_cache_decode_matches_full_forward(jax_setup):
    cfg, params, vision, lm = jax_setup
    rs = np.random.RandomState(1)
    T, S = 6, 12
    ids = rs.randint(1, 200, T).astype(np.int64)
    pos_full = np.broadcast_to(np.arange(T), (3, 1, T))
    logits_full, _, _ = lm.apply(
        {"params": params["lm"]},
        input_ids=jnp.asarray(ids)[None],
        position_ids=jnp.asarray(pos_full),
    )
    # prefill first 4 with cache, then decode tokens 4, 5 one at a time
    hd = cfg.head_dim
    caches = [
        (jnp.zeros((1, cfg.num_kv_heads, S, hd)),
         jnp.zeros((1, cfg.num_kv_heads, S, hd)))
        for _ in range(cfg.num_layers)
    ]
    pos_pre = np.broadcast_to(np.arange(4), (3, 1, 4))
    logits_pre, _, caches = lm.apply(
        {"params": params["lm"]},
        input_ids=jnp.asarray(ids[:4])[None],
        position_ids=jnp.asarray(pos_pre),
        caches=caches, cache_len=jnp.array([0], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full[:, :4]), atol=2e-4,
        rtol=1e-3,
    )
    for t in range(4, T):
        pos_t = np.full((3, 1, 1), t)
        logits_t, _, caches = lm.apply(
            {"params": params["lm"]},
            input_ids=jnp.asarray(ids[t: t + 1])[None],
            position_ids=jnp.asarray(pos_t),
            caches=caches, cache_len=jnp.array([t], jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(logits_t[0, 0]), np.asarray(logits_full[0, t]),
            atol=2e-4, rtol=1e-3,
        )


def test_mrope_positions_match_hf_get_rope_index(hf_model, jax_setup):
    cfg, params, vision, lm = jax_setup
    ids, pixel_values, grid_thw = _make_inputs(cfg, n_text_pre=2, grid=(1, 4, 8))
    pos, delta = get_mrope_position_ids(ids, grid_thw, cfg.image_token_id, 2)
    ref_pos, ref_delta = hf_model.model.get_rope_index(
        torch.tensor(ids)[None], torch.tensor(grid_thw), None,
        torch.ones(1, len(ids), dtype=torch.long),
    )
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert int(delta) == int(ref_delta[0])
