"""CogVideoX analog: structural tests + scheduler math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.models.cogvideox import (
    CogVideoXConfig, CogVideoXSampler, CogVideoXTransformer, cosine_betas,
    video_rope_cos_sin,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = CogVideoXConfig.tiny()
    model = CogVideoXTransformer(cfg)
    lat = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
    txt = jnp.zeros((1, 4, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, txt,
                        jnp.zeros((1,), jnp.int32))["params"]
    return cfg, model, params


def test_transformer_shapes_and_conditioning(tiny):
    cfg, model, params = tiny
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(2, 2, 8, 8, cfg.in_channels), jnp.float32)
    txt = jnp.asarray(rs.randn(2, 4, cfg.text_dim), jnp.float32)
    t = jnp.asarray([100, 100], jnp.int32)
    out = model.apply({"params": params}, lat, txt, t)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = model.apply({"params": params}, lat, txt + 1.0, t)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4
    out3 = model.apply({"params": params}, lat, txt,
                       jnp.asarray([900, 900], jnp.int32))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4


def test_rope_tables_distinct_positions():
    cos, sin = video_rope_cos_sin(2, 4, 4, 16, 10000.0)
    assert cos.shape == (32, 16)
    assert not np.allclose(np.asarray(cos[0]), np.asarray(cos[5]))
    np.testing.assert_allclose(
        np.asarray(cos) ** 2 + np.asarray(sin) ** 2, 1.0, atol=1e-6
    )


def test_cosine_betas_schedule():
    betas = cosine_betas(1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    alphas_bar = np.cumprod(1 - betas)
    assert alphas_bar[0] > 0.99 and alphas_bar[-1] < 1e-3


def test_sampler_end_to_end_tiny(tiny):
    cfg, model, params = tiny
    sampler = CogVideoXSampler(cfg, params)
    rs = np.random.RandomState(0)
    txt = rs.randn(1, 4, cfg.text_dim).astype(np.float32)
    lat = sampler.sample(txt, frames=2, height=8, width=8, num_steps=3,
                         guidance=6.0, seed=0)
    assert lat.shape == (1, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(lat)).all()
