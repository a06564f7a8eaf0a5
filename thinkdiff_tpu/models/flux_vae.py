"""FLUX AutoencoderKL (diffusers layout) — decoder (latents -> RGB) and
encoder (RGB -> latents, for completeness).

Reference usage: diffusers pipeline's ``vae.decode`` at the end of every
sampling script (e.g. scripts/test/test_mllama_t5_decoder_flux.py:182-192).
FLUX VAE: 16 latent channels, block_out_channels (128, 256, 512, 512),
2 layers/block + 1 extra in decoder up-blocks, mid block with one attention,
GroupNorm(32) + silu, scaling_factor 0.3611, shift_factor 0.1159.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    dtype: Any = jnp.float32

    @classmethod
    def flux(cls, **kw):
        return cls(**{**dict(dtype=jnp.bfloat16), **kw})

    @classmethod
    def tiny(cls, **kw):
        base = dict(latent_channels=4, block_out_channels=(8, 16),
                    layers_per_block=1, norm_num_groups=4)
        base.update(kw)
        return cls(**base)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm1",
                         dtype=self.dtype, param_dtype=self.dtype)(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1",
                    dtype=self.dtype, param_dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm2",
                         dtype=self.dtype, param_dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype, param_dtype=self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut",
                        dtype=self.dtype, param_dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    channels: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        b, hgt, wdt, c = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="group_norm", dtype=self.dtype,
                         param_dtype=self.dtype)(x)
        h = h.reshape(b, hgt * wdt, c)
        q = nn.Dense(c, name="to_q", dtype=self.dtype, param_dtype=self.dtype)(h)
        k = nn.Dense(c, name="to_k", dtype=self.dtype, param_dtype=self.dtype)(h)
        v = nn.Dense(c, name="to_v", dtype=self.dtype, param_dtype=self.dtype)(h)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / jnp.sqrt(c), axis=-1,
        )
        h = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(c, name="to_out", dtype=self.dtype, param_dtype=self.dtype)(h)
        return x + h.reshape(b, hgt, wdt, c)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        """z: (B, h, w, latent_channels) SCALED latents (pipeline applies
        z/scale + shift before calling). Returns (B, 8h, 8w, 3) in [-1, 1]."""
        cfg = self.cfg
        chs = list(cfg.block_out_channels)
        x = nn.Conv(chs[-1], (3, 3), padding=1, name="conv_in",
                    dtype=cfg.dtype, param_dtype=cfg.dtype)(z.astype(cfg.dtype))
        # mid
        x = ResnetBlock(chs[-1], cfg.norm_num_groups, cfg.dtype,
                        name="mid_res_0")(x)
        x = AttnBlock(chs[-1], cfg.norm_num_groups, cfg.dtype,
                      name="mid_attn")(x)
        x = ResnetBlock(chs[-1], cfg.norm_num_groups, cfg.dtype,
                        name="mid_res_1")(x)
        # up blocks (reversed channel order)
        for bi, ch in enumerate(reversed(chs)):
            for li in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"up_{bi}_res_{li}")(x)
            if bi < len(chs) - 1:
                b, hgt, wdt, c = x.shape
                x = jax.image.resize(x, (b, hgt * 2, wdt * 2, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, name=f"up_{bi}_conv",
                            dtype=cfg.dtype, param_dtype=cfg.dtype)(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(x)
        x = jax.nn.silu(x)
        return nn.Conv(3, (3, 3), padding=1, name="conv_out",
                       dtype=cfg.dtype, param_dtype=cfg.dtype)(x)


def convert_vae_decoder(sd: Dict[str, np.ndarray], dtype=None):
    """diffusers AutoencoderKL decoder subtree -> our params."""
    flat: Dict[str, np.ndarray] = {}

    def put(name, key, conv=False):
        arr = sd[key]
        if conv and arr.ndim == 4:  # (O, I, H, W) -> (H, W, I, O)
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:
            arr = arr.T
        if dtype is not None:
            arr = arr.astype(dtype)
        flat[name] = arr

    def put_conv(name, key):
        put(f"{name}/kernel", key + ".weight", conv=True)
        put(f"{name}/bias", key + ".bias")

    def put_norm(name, key):
        put(f"{name}/scale", key + ".weight")
        put(f"{name}/bias", key + ".bias")

    def put_res(name, key):
        put_norm(f"{name}/norm1", key + ".norm1")
        put_conv(f"{name}/conv1", key + ".conv1")
        put_norm(f"{name}/norm2", key + ".norm2")
        put_conv(f"{name}/conv2", key + ".conv2")
        if key + ".conv_shortcut.weight" in sd:
            put_conv(f"{name}/conv_shortcut", key + ".conv_shortcut")

    p = "decoder."
    put_conv("conv_in", p + "conv_in")
    put_res("mid_res_0", p + "mid_block.resnets.0")
    put_res("mid_res_1", p + "mid_block.resnets.1")
    a = p + "mid_block.attentions.0"
    put_norm("mid_attn/group_norm", a + ".group_norm")
    for src, dst in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                     ("to_out.0", "to_out")):
        put(f"mid_attn/{dst}/kernel", f"{a}.{src}.weight")
        put(f"mid_attn/{dst}/bias", f"{a}.{src}.bias")
    import re

    n_up = 1 + max((int(m.group(1)) for k in sd
                    if (m := re.match(r"decoder\.up_blocks\.(\d+)\.", k))),
                   default=-1)
    for bi in range(n_up):
        ub = f"{p}up_blocks.{bi}."
        li = 0
        while f"{ub}resnets.{li}.norm1.weight" in sd:
            put_res(f"up_{bi}_res_{li}", f"{ub}resnets.{li}")
            li += 1
        if f"{ub}upsamplers.0.conv.weight" in sd:
            put_conv(f"up_{bi}_conv", f"{ub}upsamplers.0.conv")
    put_norm("conv_norm_out", p + "conv_norm_out")
    put_conv("conv_out", p + "conv_out")

    from thinkdiff_tpu.models.convert import _nest

    return _nest(flat)
