"""Converter smoke tests against synthetic state dicts in the documented
diffusers key layouts — validates the name mapping + shape wiring end-to-end
(diffusers itself is not installed; numerics for FLUX/VAE/CogVideoX get
checked against released weights when mountable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.models.flux import FluxConfig, FluxTransformer, convert_flux
from thinkdiff_tpu.models.flux_vae import VAEConfig, VAEDecoder, convert_vae_decoder
from thinkdiff_tpu.models.cogvideox import (
    CogVideoXConfig, CogVideoXTransformer, convert_cogvideox,
)


def _lin(sd, key, i, o, bias=True):
    rs = np.random.RandomState(len(sd))
    sd[key + ".weight"] = rs.randn(o, i).astype(np.float32) * 0.05
    if bias:
        sd[key + ".bias"] = rs.randn(o).astype(np.float32) * 0.05


def test_convert_flux_layout_applies():
    cfg = FluxConfig.tiny()
    d = cfg.hidden_size
    mlp = int(d * cfg.mlp_ratio)
    sd = {}
    _lin(sd, "x_embedder", cfg.in_channels, d)
    _lin(sd, "context_embedder", cfg.joint_attention_dim, d)
    _lin(sd, "time_text_embed.timestep_embedder.linear_1", 256, d)
    _lin(sd, "time_text_embed.timestep_embedder.linear_2", d, d)
    _lin(sd, "time_text_embed.guidance_embedder.linear_1", 256, d)
    _lin(sd, "time_text_embed.guidance_embedder.linear_2", d, d)
    _lin(sd, "time_text_embed.text_embedder.linear_1", cfg.pooled_projection_dim, d)
    _lin(sd, "time_text_embed.text_embedder.linear_2", d, d)
    for i in range(cfg.num_double_layers):
        hb = f"transformer_blocks.{i}."
        _lin(sd, hb + "norm1.linear", d, 6 * d)
        _lin(sd, hb + "norm1_context.linear", d, 6 * d)
        for p in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            _lin(sd, hb + "attn." + p, d, d)
        for p in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[hb + f"attn.{p}.weight"] = np.ones(cfg.head_dim, np.float32)
        _lin(sd, hb + "attn.to_out.0", d, d)
        _lin(sd, hb + "attn.to_add_out", d, d)
        _lin(sd, hb + "ff.net.0.proj", d, mlp)
        _lin(sd, hb + "ff.net.2", mlp, d)
        _lin(sd, hb + "ff_context.net.0.proj", d, mlp)
        _lin(sd, hb + "ff_context.net.2", mlp, d)
    for i in range(cfg.num_single_layers):
        hb = f"single_transformer_blocks.{i}."
        _lin(sd, hb + "norm.linear", d, 3 * d)
        for p in ("to_q", "to_k", "to_v"):
            _lin(sd, hb + "attn." + p, d, d)
        sd[hb + "attn.norm_q.weight"] = np.ones(cfg.head_dim, np.float32)
        sd[hb + "attn.norm_k.weight"] = np.ones(cfg.head_dim, np.float32)
        _lin(sd, hb + "proj_mlp", d, mlp)
        _lin(sd, hb + "proj_out", d + mlp, d)
    _lin(sd, "norm_out.linear", d, 2 * d)
    _lin(sd, "proj_out", d, cfg.in_channels)

    params = convert_flux(sd)
    model = FluxTransformer(cfg)
    from thinkdiff_tpu.models.flux import make_img_ids

    out = model.apply(
        {"params": params},
        jnp.ones((1, 16, cfg.in_channels)),
        jnp.ones((1, 4, cfg.joint_attention_dim)),
        jnp.ones((1, cfg.pooled_projection_dim)),
        jnp.asarray([0.5]), jnp.asarray(make_img_ids(8, 8)),
        jnp.zeros((4, 3)), jnp.asarray([3.5]),
    )
    assert out.shape == (1, 16, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_vae_decoder_layout_applies():
    cfg = VAEConfig.tiny()
    chs = list(cfg.block_out_channels)
    sd = {}

    def conv(key, i, o):
        rs = np.random.RandomState(len(sd))
        sd[key + ".weight"] = rs.randn(o, i, 3, 3).astype(np.float32) * 0.05
        sd[key + ".bias"] = np.zeros(o, np.float32)

    def norm(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)

    def res(key, i, o):
        norm(key + ".norm1", i)
        conv(key + ".conv1", i, o)
        norm(key + ".norm2", o)
        conv(key + ".conv2", o, o)
        if i != o:
            rs = np.random.RandomState(len(sd))
            sd[key + ".conv_shortcut.weight"] = rs.randn(o, i, 1, 1).astype(np.float32)
            sd[key + ".conv_shortcut.bias"] = np.zeros(o, np.float32)

    p = "decoder."
    conv(p + "conv_in", cfg.latent_channels, chs[-1])
    res(p + "mid_block.resnets.0", chs[-1], chs[-1])
    res(p + "mid_block.resnets.1", chs[-1], chs[-1])
    a = p + "mid_block.attentions.0"
    norm(a + ".group_norm", chs[-1])
    for q in ("to_q", "to_k", "to_v", "to_out.0"):
        rs = np.random.RandomState(len(sd))
        sd[f"{a}.{q}.weight"] = rs.randn(chs[-1], chs[-1]).astype(np.float32) * 0.05
        sd[f"{a}.{q}.bias"] = np.zeros(chs[-1], np.float32)
    # up blocks: reversed channels
    rev = list(reversed(chs))
    prev = chs[-1]
    for bi, ch in enumerate(rev):
        for li in range(cfg.layers_per_block + 1):
            res(p + f"up_blocks.{bi}.resnets.{li}", prev if li == 0 else ch, ch)
        if bi < len(chs) - 1:
            conv(p + f"up_blocks.{bi}.upsamplers.0.conv", ch, ch)
        prev = ch
    norm(p + "conv_norm_out", chs[0])
    conv(p + "conv_out", chs[0], 3)

    params = convert_vae_decoder(sd)
    vae = VAEDecoder(cfg)
    out = vae.apply({"params": params}, jnp.ones((1, 4, 4, cfg.latent_channels)))
    assert out.shape == (1, 8, 8, 3)  # 2 blocks -> one 2x upsample
    assert np.isfinite(np.asarray(out)).all()


def _ln(sd, key, dim):
    sd[key + ".weight"] = np.ones(dim, np.float32)
    sd[key + ".bias"] = np.zeros(dim, np.float32)


def test_convert_cogvideox_layout_applies():
    cfg = CogVideoXConfig.tiny()
    d, mlp = cfg.hidden_size, int(cfg.hidden_size * cfg.mlp_ratio)
    p = cfg.patch_size
    sd = {}
    rs = np.random.RandomState(0)
    sd["patch_embed.proj.weight"] = rs.randn(
        d, cfg.in_channels, p, p).astype(np.float32) * 0.05
    sd["patch_embed.proj.bias"] = rs.randn(d).astype(np.float32) * 0.05
    _lin(sd, "patch_embed.text_proj", cfg.text_dim, d)
    _lin(sd, "time_embedding.linear_1", d, cfg.time_embed_dim)
    _lin(sd, "time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    for i in range(cfg.num_layers):
        hb = f"transformer_blocks.{i}."
        _lin(sd, hb + "norm1.linear", cfg.time_embed_dim, 6 * d)
        _lin(sd, hb + "norm2.linear", cfg.time_embed_dim, 6 * d)
        _ln(sd, hb + "norm1.norm", d)
        _ln(sd, hb + "norm2.norm", d)
        for pj in ("to_q", "to_k", "to_v"):
            _lin(sd, hb + "attn1." + pj, d, d)
        _ln(sd, hb + "attn1.norm_q", cfg.head_dim)
        _ln(sd, hb + "attn1.norm_k", cfg.head_dim)
        _lin(sd, hb + "attn1.to_out.0", d, d)
        _lin(sd, hb + "ff.net.0.proj", d, mlp)
        _lin(sd, hb + "ff.net.2", mlp, d)
    _ln(sd, "norm_final", d)
    _lin(sd, "norm_out.linear", cfg.time_embed_dim, 2 * d)
    _ln(sd, "norm_out.norm", d)
    _lin(sd, "proj_out", d, p * p * cfg.in_channels)

    params = convert_cogvideox(sd)
    model = CogVideoXTransformer(cfg)
    out = model.apply(
        {"params": params},
        jnp.ones((1, 2, 8, 8, cfg.in_channels)),
        jnp.ones((1, 4, cfg.text_dim)),
        jnp.asarray([100], jnp.int32),
    )
    assert out.shape == (1, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()
