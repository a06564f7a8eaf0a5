"""CogVideoX 3D causal VAE — decoder path (latents -> video frames).

TPU-native re-implementation of the decoder half of diffusers'
AutoencoderKLCogVideoX (the reference's video output runs through
CogVideoXPipeline's VAE, reference
scripts/test/test_blip_vision_t5_decoder_cogvideo.py:116-189). Structure:

  conv_in (causal 3D) -> mid block (2 spatial-norm resnets) -> 4 up blocks
  (layers_per_block+1 resnets + nearest upsample, first
  log2(temporal_compression) blocks also upsample time) -> spatial-norm out
  -> silu -> conv_out (3 channels)

Key semantics mirrored from the published architecture:
  - causal 3D conv: time padded LEFT by (kt-1) copies of the first frame
    (so frame t never sees the future), spatial zero padding;
  - CogVideoXSpatialNorm3D: group-normed features modulated by 1x1x1 causal
    convs of the (nearest-resized) latents, first frame handled separately
    when the temporal sizes mismatch;
  - temporal upsampling keeps the first frame un-duplicated:
    T -> 2T-1 per compress_time block, so 13 latent frames -> 49 frames.

Weight converter follows diffusers' state-dict naming
(decoder.conv_in.conv.weight, ...mid_block.resnets.N...,
...up_blocks.N.resnets.M..., ...up_blocks.N.upsamplers.0.conv...,
norm_out / conv_out). Numerical parity against released weights is
environment-gated (zero egress) — structure + converter layout are tested.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426
    dtype: Any = jnp.float32

    @classmethod
    def cogvideox_5b(cls, **kw):
        return cls(scaling_factor=0.7, dtype=kw.pop("dtype", jnp.bfloat16), **kw)

    @classmethod
    def tiny(cls, **kw):
        return cls(latent_channels=4, block_out_channels=(8, 16),
                   layers_per_block=1, norm_num_groups=4,
                   temporal_compression_ratio=2, **kw)


def _causal_pad(x: jnp.ndarray, kt: int) -> jnp.ndarray:
    """(B, T, H, W, C): left-pad time with kt-1 copies of the first frame."""
    if kt <= 1:
        return x
    first = jnp.repeat(x[:, :1], kt - 1, axis=1)
    return jnp.concatenate([first, x], axis=1)


class CausalConv3d(nn.Module):
    """3D conv, causal in time (left first-frame pad), SAME in space."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        x = _causal_pad(x, kt)
        pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
        return nn.Conv(
            self.features, self.kernel, strides=self.stride,
            padding=((0, 0), (pad_h, pad_h), (pad_w, pad_w)),
            dtype=self.dtype, name="conv",
        )(x)


def _resize_nearest(z, t, h, w):
    """zq (B, Tz, Hz, Wz, C) -> (B, t, h, w, C) nearest."""
    b, tz, hz, wz, c = z.shape
    ti = (jnp.arange(t) * tz // t).astype(jnp.int32)
    hi = (jnp.arange(h) * hz // h).astype(jnp.int32)
    wi = (jnp.arange(w) * wz // w).astype(jnp.int32)
    return z[:, ti][:, :, hi][:, :, :, wi]


class SpatialNorm3D(nn.Module):
    """GroupNorm(f) modulated by 1x1x1 causal convs of resized latents
    (diffusers CogVideoXSpatialNorm3D). The first frame is resized
    separately when f has 2n+1 frames against zq's n+1 (post temporal
    upsampling)."""

    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        b, t, h, w, c = f.shape
        tz = zq.shape[1]
        if t % 2 == 1 and tz % 2 == 1 and t != tz:
            zq = jnp.concatenate([
                _resize_nearest(zq[:, :1], 1, h, w),
                _resize_nearest(zq[:, 1:], t - 1, h, w),
            ], axis=1)
        else:
            zq = _resize_nearest(zq, t, h, w)
        norm = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                            dtype=self.dtype, name="norm_layer")(f)
        y = CausalConv3d(c, (1, 1, 1), dtype=self.dtype, name="conv_y")(zq)
        bb = CausalConv3d(c, (1, 1, 1), dtype=self.dtype, name="conv_b")(zq)
        return norm * y + bb


class ResnetBlock3D(nn.Module):
    features: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq):
        h = SpatialNorm3D(self.groups, dtype=self.dtype, name="norm1")(x, zq)
        h = nn.silu(h)
        h = CausalConv3d(self.features, dtype=self.dtype, name="conv1")(h)
        h = SpatialNorm3D(self.groups, dtype=self.dtype, name="norm2")(h, zq)
        h = nn.silu(h)
        h = CausalConv3d(self.features, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = CausalConv3d(self.features, (1, 1, 1), dtype=self.dtype,
                             name="conv_shortcut")(x)
        return x + h


class Upsample3D(nn.Module):
    """Nearest 2x spatial (+2x temporal keeping the first frame single when
    compress_time), then a per-frame 3x3 conv (diffusers
    CogVideoXUpsample3D)."""

    features: int
    compress_time: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.compress_time and t > 1:
            first, rest = x[:, :1], x[:, 1:]
            first = jnp.repeat(jnp.repeat(first, 2, axis=2), 2, axis=3)
            rest = jnp.repeat(rest, 2, axis=1)
            rest = jnp.repeat(jnp.repeat(rest, 2, axis=2), 2, axis=3)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        bt = x.shape[0] * x.shape[1]
        y = x.reshape(bt, x.shape[2], x.shape[3], c)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv")(y)
        return y.reshape(x.shape[0], x.shape[1], x.shape[2], x.shape[3],
                         self.features)


class CogVideoXVAEDecoder(nn.Module):
    cfg: CogVideoXVAEConfig

    @nn.compact
    def __call__(self, z):
        """z: (B, T_lat, H_lat, W_lat, C_lat) scaled latents ->
        (B, T, H, W, 3) in [-1, 1]."""
        cfg = self.cfg
        channels = list(reversed(cfg.block_out_channels))
        zq = z
        h = CausalConv3d(channels[0], dtype=cfg.dtype, name="conv_in")(z)

        # mid block: 2 resnets
        for i in range(2):
            h = ResnetBlock3D(channels[0], cfg.norm_num_groups,
                              dtype=cfg.dtype, name=f"mid_res_{i}")(h, zq)

        temporal_levels = int(np.log2(cfg.temporal_compression_ratio))
        for bi, ch in enumerate(channels):
            for ri in range(cfg.layers_per_block + 1):
                h = ResnetBlock3D(ch, cfg.norm_num_groups, dtype=cfg.dtype,
                                  name=f"up_{bi}_res_{ri}")(h, zq)
            if bi < len(channels) - 1:
                h = Upsample3D(ch, compress_time=bi < temporal_levels,
                               dtype=cfg.dtype, name=f"up_{bi}_upsample")(h)

        h = SpatialNorm3D(cfg.norm_num_groups, dtype=cfg.dtype,
                          name="norm_out")(h, zq)
        h = nn.silu(h)
        return CausalConv3d(cfg.out_channels, dtype=cfg.dtype,
                            name="conv_out")(h)


def decode_latents(decoder: CogVideoXVAEDecoder, params, latents,
                   scaling_factor: Optional[float] = None,
                   tile: Optional[Tuple[int, int]] = "auto",
                   tile_overlap: int = 8) -> np.ndarray:
    """(B, T_lat, H_lat, W_lat, C) latents -> uint8 frames (B, T, H, W, 3).

    ``tile``: None decodes monolithically; (th, tw) decodes in latent-space
    spatial tiles; "auto" (default) tiles when the monolithic activation
    footprint would blow a 16 GiB chip (measured: 49f x 480p wants 41 GiB
    HBM — the same reason diffusers' AutoencoderKLCogVideoX ships
    enable_tiling for exactly this operating point).
    """
    sf = scaling_factor or decoder.cfg.scaling_factor
    z = jnp.asarray(latents) / sf
    if tile == "auto":
        # top-block activation ~ T*8H*8W*C0*2 bytes (+XLA temps ~4x); keep
        # the monolithic path under ~2 GiB of top-block activation
        c0 = decoder.cfg.block_out_channels[0]
        t_out = (z.shape[1] - 1) * decoder.cfg.temporal_compression_ratio + 1
        up = 2 ** (len(decoder.cfg.block_out_channels) - 1)
        top = t_out * (up * z.shape[2]) * (up * z.shape[3]) * c0 * 2
        tile = (32, 48) if top > 2 * 2 ** 30 else None
    if tile is None:
        video = decoder.apply({"params": params}, z)
        video = (jnp.clip(video.astype(jnp.float32), -1, 1) + 1) * 127.5
        return np.asarray(video).astype(np.uint8)
    return _decode_tiled(decoder, params, z, tile, tile_overlap)


def _decode_tiled(decoder, params, z, tile, overlap) -> np.ndarray:
    """Overlapping spatial tiles, linear-ramp blend (the diffusers
    tiled_decode contract, re-done with UNIFORM tile shapes so XLA compiles
    ONE program: every start is clamped to keep (th, tw) constant; seams are
    blended by per-pixel ramp weights on the host canvas).

    Time is untouched — the causal-conv receptive field is temporal-only +
    small spatial halos that the overlap absorbs.
    """
    b, tl, hl, wl, _ = z.shape
    th, tw = min(tile[0], hl), min(tile[1], wl)
    # one 2x spatial upsample per up-block transition (8x at 5b geometry)
    s = 2 ** (len(decoder.cfg.block_out_channels) - 1)
    dec = jax.jit(lambda p, zz: decoder.apply({"params": p}, zz))

    def starts(total, t):
        if total <= t:
            return [0]
        stride = max(t - overlap, 1)
        out = list(range(0, total - t, stride)) + [total - t]
        return sorted(set(min(st, total - t) for st in out))

    ys, xs = starts(hl, th), starts(wl, tw)
    t_out = None
    canvas = wsum = None
    for y0 in ys:
        for x0 in xs:
            zt = z[:, :, y0:y0 + th, x0:x0 + tw]
            out = np.asarray(dec(params, zt)).astype(np.float32)
            if canvas is None:
                t_out = out.shape[1]
                canvas = np.zeros((b, t_out, hl * s, wl * s, out.shape[-1]),
                                  np.float32)
                wsum = np.zeros((1, 1, hl * s, wl * s, 1), np.float32)
            oh, ow = th * s, tw * s
            wy = np.ones(oh, np.float32)
            wx = np.ones(ow, np.float32)
            ov = overlap * s
            ramp = (np.arange(ov, dtype=np.float32) + 1.0) / (ov + 1.0)
            if y0 > 0:
                wy[:ov] = ramp
            if y0 + th < hl:
                wy[-ov:] = ramp[::-1]
            if x0 > 0:
                wx[:ov] = ramp
            if x0 + tw < wl:
                wx[-ov:] = ramp[::-1]
            w = (wy[:, None] * wx[None, :])[None, None, :, :, None]
            canvas[:, :, y0 * s:y0 * s + oh, x0 * s:x0 * s + ow] += out * w
            wsum[:, :, y0 * s:y0 * s + oh, x0 * s:x0 * s + ow] += w
    video = canvas / np.maximum(wsum, 1e-8)
    return ((np.clip(video, -1, 1) + 1) * 127.5).astype(np.uint8)


# ----------------------------- converter ------------------------------------


def _conv3d(w):  # torch (O, I, kt, kh, kw) -> flax (kt, kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _conv2d(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def convert_cogvideox_vae(sd: Dict[str, np.ndarray], dtype=None) -> Dict[str, Any]:
    """diffusers AutoencoderKLCogVideoX state dict (decoder.* keys) ->
    CogVideoXVAEDecoder params."""
    def get(k):
        v = np.asarray(sd[k])
        return v.astype(dtype) if dtype is not None else v

    def causal(prefix):
        return {"conv": {"kernel": _conv3d(get(f"{prefix}.conv.weight")),
                         "bias": get(f"{prefix}.conv.bias")}}

    def spatial_norm(prefix):
        return {
            "norm_layer": {"scale": get(f"{prefix}.norm_layer.weight"),
                           "bias": get(f"{prefix}.norm_layer.bias")},
            "conv_y": causal(f"{prefix}.conv_y"),
            "conv_b": causal(f"{prefix}.conv_b"),
        }

    def resnet(prefix, has_shortcut):
        p = {
            "norm1": spatial_norm(f"{prefix}.norm1"),
            "conv1": causal(f"{prefix}.conv1"),
            "norm2": spatial_norm(f"{prefix}.norm2"),
            "conv2": causal(f"{prefix}.conv2"),
        }
        if has_shortcut:
            p["conv_shortcut"] = causal(f"{prefix}.conv_shortcut")
        return p

    params: Dict[str, Any] = {"conv_in": causal("decoder.conv_in")}
    for i in range(2):
        params[f"mid_res_{i}"] = resnet(
            f"decoder.mid_block.resnets.{i}", has_shortcut=False)

    n_blocks = 0
    while f"decoder.up_blocks.{n_blocks}.resnets.0.conv1.conv.weight" in sd:
        n_blocks += 1
    for bi in range(n_blocks):
        ri = 0
        while (key := f"decoder.up_blocks.{bi}.resnets.{ri}") and \
                f"{key}.conv1.conv.weight" in sd:
            params[f"up_{bi}_res_{ri}"] = resnet(
                key, has_shortcut=f"{key}.conv_shortcut.conv.weight" in sd)
            ri += 1
        up_key = f"decoder.up_blocks.{bi}.upsamplers.0.conv"
        if f"{up_key}.weight" in sd:
            params[f"up_{bi}_upsample"] = {
                "conv": {"kernel": _conv2d(get(f"{up_key}.weight")),
                         "bias": get(f"{up_key}.bias")}}

    params["norm_out"] = spatial_norm("decoder.norm_out")
    params["conv_out"] = causal("decoder.conv_out")
    return params
