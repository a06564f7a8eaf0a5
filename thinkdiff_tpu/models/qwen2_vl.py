"""Qwen2-VL in JAX: dynamic-resolution vision tower + M-RoPE GQA decoder.

This is the model behind the reference's forked-vLLM embedding engine
(reference: thinkdiff/models/mllama_vllm_generate_1.py:382-406 serves
Qwen/Qwen2-VL-{2B,7B}-Instruct with ``return_hidden_states=True``). The
decoder exposes the final-RMSNorm hidden states ("model.norm" — the layer the
reference taps at mllama_vllm_generate_1.py:612-617) as a first-class output
for both prefill and decode.

Numerics match HF ``Qwen2VLForConditionalGeneration``:
  - vision: Conv3d patch embed == Dense over (C,T,P,P)-ordered patch vectors,
    2D rotary over (h, w) patch positions, full attention per image
    (cu_seqlens masking), LayerNorm pre-norm blocks, 2x2 patch merger MLP;
  - text: Qwen2 GQA attention with q/k/v biases, M-RoPE (t/h/w sections),
    SwiGLU MLP, RMSNorm;
  - KV-cache decode path with static shapes for the generation engine.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.ops.decode_attention import decode_attention, update_kv_cache
from thinkdiff_tpu.ops.flash_attention import flash_attention
from thinkdiff_tpu.ops.norms import rmsnorm
from thinkdiff_tpu.ops.rope import apply_rope, mrope_cos_sin

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 1536          # LM hidden (merger output)
    num_heads: int = 16
    # vision-tower quantization (False | True/"int8" | "w8a8") — same QDense
    # modes as the decoder's quant_int8. Vision is the engine's widest
    # compute (1024 patches/image, whole refill batches at once), so w8a8's
    # s8xs8 MXU rate applies where it pays most; attention stays bf16.
    quant_int8: Any = False
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self):
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    mrope_section: Sequence[int] = (16, 24, 24)
    tie_word_embeddings: bool = True
    quant_int8: bool = False  # weight-only int8 decoder (inference)
    # fused projection groups: q|k|v -> one 'qkv' kernel (GQA sizes
    # H*hd + 2*Hkv*hd), gate|up -> 'gate_up'. Decode is dispatch/launch-
    # bound at batch<=8 (round-2: ~196 thin dots/step made int8 decode a
    # 3.3x regression); fusing cuts per-layer projections 7 -> 4.
    # ``fuse_qwen2_params`` converts an unfused tree.
    fused_proj: bool = False
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    dtype: Any = jnp.float32
    vision: Qwen2VLVisionConfig = dataclasses.field(
        default_factory=Qwen2VLVisionConfig
    )

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @classmethod
    def qwen2_vl_2b(cls, vision_quant: Any = False, **kw):
        base = dict(dtype=jnp.bfloat16)
        # vision dtype ALWAYS follows the model dtype: before round 5 the
        # unquantized branch silently kept the dataclass default (f32) —
        # the round-4 "bf16 vision" serving baseline actually ran f32
        base["vision"] = Qwen2VLVisionConfig(
            dtype=jnp.bfloat16, quant_int8=vision_quant)
        base.update(kw)
        return cls(**base)

    @classmethod
    def qwen2_vl_7b(cls, vision_quant: Any = False, **kw):
        base = dict(
            hidden_size=3584, intermediate_size=18944, num_layers=28,
            num_heads=28, num_kv_heads=4, tie_word_embeddings=False,
            dtype=jnp.bfloat16,
            vision=Qwen2VLVisionConfig(hidden_size=3584, dtype=jnp.bfloat16,
                                       quant_int8=vision_quant),
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw):
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2,
            mrope_section=(2, 3, 3), tie_word_embeddings=False,
            image_token_id=250, video_token_id=251, vision_start_token_id=249,
            vision=Qwen2VLVisionConfig(
                depth=2, embed_dim=32, hidden_size=64, num_heads=4,
                patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            ),
        )
        base.update(kw)
        return cls(**base)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def vision_rot_pos_emb(grid_thw: np.ndarray, merge: int) -> np.ndarray:
    """(h, w) rotary position ids per patch, in the merge-window sequence
    order HF uses (Qwen2VLVisionTransformer.rot_pos_emb)."""
    pos_list = []
    for t, h, w in grid_thw:
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // merge, merge, w // merge, merge)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // merge, merge, w // merge, merge)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hpos, wpos], axis=-1)  # (h*w, 2)
        pos_list.append(np.tile(pos, (int(t), 1)))
    return np.concatenate(pos_list, axis=0)


def vision_cos_sin(pos_hw: np.ndarray, head_dim: int, theta: float = 10000.0):
    """cos/sin (seq, head_dim//2): h-freqs then w-freqs concatenated."""
    dim = head_dim // 4  # per-axis rotary dim
    inv = 1.0 / (theta ** (np.arange(0, dim, dtype=np.float64) / dim))
    h_freqs = pos_hw[:, 0:1].astype(np.float64) * inv[None]
    w_freqs = pos_hw[:, 1:2].astype(np.float64) * inv[None]
    freqs = np.concatenate([h_freqs, w_freqs], axis=-1)  # (seq, head_dim/2)
    return (np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32))


class VisionBlock(nn.Module):
    cfg: Qwen2VLVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias=None):
        """x: (B, S, d); cos/sin: (S, hd/2) shared across the batch (same
        grid per batch entry); attn_bias optional (S, S)."""
        cfg = self.cfg
        d, h = cfg.embed_dim, cfg.num_heads
        hd = cfg.head_dim
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, name=name,
                                       dtype=cfg.dtype, param_dtype=cfg.dtype)
        from thinkdiff_tpu.models.t5 import QDense

        qd = lambda feat, name: QDense(feat, dtype=cfg.dtype,
                                       quant=cfg.quant_int8, use_bias=True,
                                       name=name)
        y = ln("norm1")(x)
        qkv = qd(3 * d, "qkv")(y)
        b, seq, _ = x.shape
        # rope BEFORE the head transpose: the rotary's f32 compute then
        # reads/writes the contiguous (B, S, H*hd) layout, and the
        # (S <-> H) transposes move bf16, not f32 — the D=80 strided
        # copies were 42% of the int8 tower's chunk (PERF.md round-5
        # vision profile). Same math, same cast points — numerics
        # identical to the transpose-first order.
        qkv = qkv.reshape(b, seq, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, S, H, hd)
        q, k = apply_rope(q, k, cos[:, None], sin[:, None])
        q = q.transpose(0, 2, 1, 3)  # (B, H, S, hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = flash_attention(
            q, k, v,
            attn_bias[None, None] if attn_bias is not None else None,
            None, False, hd ** -0.5,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, seq, d)
        x = x + qd(d, "proj")(out)
        y = ln("norm2")(x)
        y = qd(int(d * cfg.mlp_ratio), "fc1")(y)
        y = y * jax.nn.sigmoid(1.702 * y)  # quick_gelu (Qwen2-VL vision act)
        y = qd(d, "fc2")(y)
        return x + y


class Qwen2VisionTower(nn.Module):
    cfg: Qwen2VLVisionConfig

    @nn.compact
    def __call__(self, patches, cos, sin, attn_bias=None):
        """patches: (B, S, patch_dim) — B same-grid images — or (S, patch_dim)
        for a single concatenated sequence (with optional (S, S) cross-image
        ``attn_bias``). cos/sin (S, hd/2).
        Returns merged tokens (B, S // merge^2, hidden) (or 2D if 2D input).
        """
        cfg = self.cfg
        from thinkdiff_tpu.models.t5 import QDense

        squeeze = patches.ndim == 2
        if squeeze:
            patches = patches[None]
        x = QDense(cfg.embed_dim, use_bias=False, name="patch_embed",
                   dtype=cfg.dtype, quant=cfg.quant_int8)(
            patches.astype(cfg.dtype))
        for i in range(cfg.depth):
            x = VisionBlock(cfg, name=f"block_{i}")(x, cos, sin, attn_bias)
        # merger: LayerNorm -> group 2x2 -> MLP
        x = nn.LayerNorm(epsilon=1e-6, name="ln_q", dtype=cfg.dtype,
                         param_dtype=cfg.dtype)(x)
        b, seq, _ = x.shape
        m2 = cfg.spatial_merge_size ** 2
        x = x.reshape(b, seq // m2, cfg.embed_dim * m2)
        x = QDense(cfg.embed_dim * m2, name="mlp_0", dtype=cfg.dtype,
                   quant=cfg.quant_int8, use_bias=True)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = QDense(cfg.hidden_size, name="mlp_2", dtype=cfg.dtype,
                   quant=cfg.quant_int8, use_bias=True)(x)
        return x[0] if squeeze else x


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class Qwen2Attention(nn.Module):
    cfg: Qwen2VLConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask=None, cache=None, cache_len=None,
                 attn_window=None, page_table=None):
        """x: (B, T, D); cos/sin: (B, T, hd/2) M-RoPE tables.

        Without cache: causal self attention (prefill/training).
        With cache (k, v) of shape (B, Hkv, S, hd): decode — append T new
        entries at cache_len, attend over the valid prefix. ``attn_window``
        (STATIC int) bounds the cache region read by attention — the
        length-aware decode path: short contexts read W bytes, not S.
        With ``page_table`` (B, MP): cache is a (k_pool, v_pool) page pool
        (P, Hkv, PAGE, hd) shared across slots — serving-scale decode
        (T must be 1); per-slot early exit replaces attn_window.
        Returns (out, new_cache).
        """
        cfg = self.cfg
        b, t, _ = x.shape
        hd = cfg.head_dim
        from thinkdiff_tpu.models.t5 import QDense

        qd = lambda feat, name, bias: QDense(feat, dtype=cfg.dtype,
                                             quant=cfg.quant_int8,
                                             use_bias=bias, name=name)
        if cfg.fused_proj:
            q_sz, kv_sz = cfg.num_heads * hd, cfg.num_kv_heads * hd
            qkv = qd(q_sz + 2 * kv_sz, "qkv", True)(x)
            q, k, v = jnp.split(qkv, [q_sz, q_sz + kv_sz], axis=-1)
        else:
            q = qd(cfg.num_heads * hd, "q_proj", True)(x)
            k = qd(cfg.num_kv_heads * hd, "k_proj", True)(x)
            v = qd(cfg.num_kv_heads * hd, "v_proj", True)(x)
        q = q.reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        cos_b = cos[:, None]  # (B, 1, T, hd/2)
        sin_b = sin[:, None]
        q, k = apply_rope(q, k, cos_b, sin_b)

        if cache is None:
            bias = None
            if mask is not None:
                bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
            out = flash_attention(q, k, v, bias, None, True, hd ** -0.5)
            new_cache = None
        elif page_table is not None:
            from thinkdiff_tpu.ops.paged_attention import (
                paged_attention, paged_update_kv)

            assert t == 1, "paged decode is single-token"
            k_pool, v_pool = cache
            k_pool, v_pool = paged_update_kv(
                k_pool, v_pool, k, v, page_table, cache_len)
            out = paged_attention(
                q[:, :, 0], k_pool, v_pool, page_table, cache_len + 1
            )[:, :, None]
            new_cache = (k_pool, v_pool)
        else:
            k_cache, v_cache = cache
            k_cache, v_cache, _ = update_kv_cache(k_cache, v_cache, k, v, cache_len)
            if attn_window is not None and attn_window < k_cache.shape[2]:
                out = decode_attention(
                    q, k_cache[:, :, :attn_window],
                    v_cache[:, :, :attn_window], cache_len + t)
            else:
                out = decode_attention(q, k_cache, v_cache, cache_len + t)
            new_cache = (k_cache, v_cache)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * hd)
        out = qd(cfg.hidden_size, "o_proj", False)(out)
        return out, new_cache


class Qwen2Block(nn.Module):
    cfg: Qwen2VLConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask=None, cache=None, cache_len=None,
                 attn_window=None, page_table=None):
        cfg = self.cfg
        norm = lambda name: RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                    cfg.dtype, name=name)
        h, new_cache = Qwen2Attention(cfg, name="self_attn")(
            norm("input_norm")(x), cos, sin, mask, cache, cache_len,
            attn_window, page_table
        )
        x = x + h
        from thinkdiff_tpu.models.t5 import QDense

        qd = lambda feat, name: QDense(feat, dtype=cfg.dtype,
                                       quant=cfg.quant_int8, name=name)
        y = norm("post_attn_norm")(x)
        if cfg.fused_proj:
            gu = qd(2 * cfg.intermediate_size, "gate_up")(y)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = qd(cfg.intermediate_size, "gate_proj")(y)
            up = qd(cfg.intermediate_size, "up_proj")(y)
        y = qd(cfg.hidden_size, "down_proj")(jax.nn.silu(gate) * up)
        return x + y, new_cache


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        return rmsnorm(x.astype(self.dtype), weight.astype(self.dtype), self.eps)


class Qwen2Decoder(nn.Module):
    cfg: Qwen2VLConfig

    @nn.compact
    def __call__(self, input_embeds, position_ids, mask=None,
                 caches=None, cache_len=None, attn_window=None,
                 page_table=None):
        """input_embeds (B, T, D); position_ids (3, B, T) for M-RoPE.

        Returns (logits, norm_hidden, new_caches) where norm_hidden is the
        'model.norm' tap (the embedding layer the reference extracts).
        """
        cfg = self.cfg
        cos, sin = mrope_cos_sin(position_ids, cfg.head_dim,
                                 list(cfg.mrope_section), cfg.rope_theta)
        x = input_embeds.astype(cfg.dtype)
        new_caches = []
        for i in range(cfg.num_layers):
            layer_cache = caches[i] if caches is not None else None
            x, nc = Qwen2Block(cfg, name=f"layer_{i}")(
                x, cos, sin, mask, layer_cache, cache_len, attn_window,
                page_table
            )
            new_caches.append(nc)
        hidden = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, cfg.dtype,
                         name="norm")(x)
        return hidden, (new_caches if caches is not None else None)


class Qwen2VLModel(nn.Module):
    """Embedding + decoder + lm_head (vision tower applied separately)."""

    cfg: Qwen2VLConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     name="embed_tokens",
                                     dtype=cfg.dtype, param_dtype=cfg.dtype)
        self.decoder = Qwen2Decoder(cfg, name="decoder")
        if not cfg.tie_word_embeddings:
            from thinkdiff_tpu.models.t5 import QDense

            self.lm_head = QDense(cfg.vocab_size, dtype=cfg.dtype,
                                  quant=cfg.quant_int8, name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def logits(self, hidden):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(hidden)
        return self.lm_head(hidden)

    def __call__(self, input_ids=None, input_embeds=None, position_ids=None,
                 mask=None, caches=None, cache_len=None,
                 image_embeds=None, image_mask=None, compute_logits=True,
                 attn_window=None, page_table=None):
        """image_embeds (B, T, D) scattered into positions where
        image_mask (B, T) is 1 (vision tokens replace their placeholder
        embeddings, HF semantics). ``compute_logits=False`` skips the
        full-sequence lm_head (prefill only needs the last position)."""
        if input_embeds is None:
            input_embeds = self.embed(input_ids)
        if image_embeds is not None:
            input_embeds = jnp.where(
                image_mask[..., None] > 0,
                image_embeds.astype(input_embeds.dtype), input_embeds,
            )
        hidden, new_caches = self.decoder(
            input_embeds, position_ids, mask, caches, cache_len, attn_window,
            page_table
        )
        logits = self.logits(hidden) if compute_logits else None
        return logits, hidden, new_caches


# ---------------------------------------------------------------------------
# Host-side M-RoPE position ids (HF get_rope_index semantics)
# ---------------------------------------------------------------------------

def get_mrope_position_ids(
    input_ids: np.ndarray, grid_thw_per_image: Sequence[Sequence[int]],
    image_token_id: int, merge: int = 2, attention_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Compute (3, T) t/h/w positions for ONE sequence.

    Text tokens advance all three dims together. Each vision span (run of
    image_token_id) gets t = t_start (constant per image), h/w = merged-grid
    coordinates; the next text token resumes at max(prev)+1.
    Returns (position_ids (3, T), mrope_position_delta (scalar)).
    """
    ids = np.asarray(input_ids)
    T = len(ids)
    pos = np.zeros((3, T), np.int64)
    img_iter = iter(grid_thw_per_image)
    st = 0
    next_pos = 0
    i = 0
    while i < T:
        if ids[i] == image_token_id:
            t, h, w = next(img_iter)
            lh, lw = h // merge, w // merge
            n = int(t) * lh * lw
            t_idx = np.repeat(np.arange(int(t)), lh * lw)
            h_idx = np.tile(np.repeat(np.arange(lh), lw), int(t))
            w_idx = np.tile(np.tile(np.arange(lw), lh), int(t))
            pos[0, i: i + n] = next_pos + t_idx
            pos[1, i: i + n] = next_pos + h_idx
            pos[2, i: i + n] = next_pos + w_idx
            next_pos = int(pos[:, i: i + n].max()) + 1
            i += n
        else:
            pos[:, i] = next_pos
            next_pos += 1
            i += 1
    delta = next_pos - T
    return pos, np.int64(delta)


def fuse_qwen2_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Unfused decoder param tree -> the ``fused_proj=True`` layout:
    self_attn {q_proj, k_proj, v_proj} -> qkv (GQA sizes preserved by
    concat order q|k|v), mlp {gate_proj, up_proj} -> gate_up. Accepts the
    full {vision, lm} tree or just the lm subtree; fp kernels, biases, and
    ops/quant triplets all concatenate; already-fused trees pass through."""
    from thinkdiff_tpu.models.t5 import _concat_dense_params

    def rec(node, name=""):
        if not isinstance(node, dict):
            return node
        keys = set(node.keys())
        if name == "self_attn" and {"q_proj", "k_proj", "v_proj"} <= keys:
            fused = {"qkv": _concat_dense_params(
                [node["q_proj"], node["k_proj"], node["v_proj"]])}
            rest = {k: rec(v, k) for k, v in node.items()
                    if k not in ("q_proj", "k_proj", "v_proj")}
            return {**fused, **rest}
        if {"gate_proj", "up_proj"} <= keys:
            fused = {"gate_up": _concat_dense_params(
                [node["gate_proj"], node["up_proj"]])}
            rest = {k: rec(v, k) for k, v in node.items()
                    if k not in ("gate_proj", "up_proj")}
            return {**fused, **rest}
        return {k: rec(v, k) for k, v in node.items()}

    return rec(params)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_qwen2_vl(sd: Dict[str, np.ndarray], dtype=None) -> Dict[str, Any]:
    """HF Qwen2VLForConditionalGeneration state dict -> our params.

    Handles both key layouts: ``model.visual./model.language_model.`` (new)
    and ``visual./model.`` (original release)."""
    import re

    def norm_key(k: str) -> str:
        k = k.replace("model.visual.", "visual.")
        k = k.replace("model.language_model.", "model.")
        return k

    sd = {norm_key(k): v for k, v in sd.items()}
    flat: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        if transpose:
            arr = arr.T
        if dtype is not None:
            arr = arr.astype(dtype)
        flat[name] = arr

    # vision tower
    pe = sd["visual.patch_embed.proj.weight"]  # (E, C, T, P, P)
    put("vision/patch_embed/kernel",
        pe.reshape(pe.shape[0], -1).T)  # (C*T*P*P, E)
    n_vblocks = 1 + max(
        (int(m.group(1)) for k in sd
         if (m := re.match(r"visual\.blocks\.(\d+)\.", k))), default=-1,
    )
    for i in range(n_vblocks):
        hb, ob = f"visual.blocks.{i}.", f"vision/block_{i}"
        for nm in ("norm1", "norm2"):
            put(f"{ob}/{nm}/scale", sd[hb + nm + ".weight"])
            put(f"{ob}/{nm}/bias", sd[hb + nm + ".bias"])
        put(f"{ob}/qkv/kernel", sd[hb + "attn.qkv.weight"], transpose=True)
        put(f"{ob}/qkv/bias", sd[hb + "attn.qkv.bias"])
        put(f"{ob}/proj/kernel", sd[hb + "attn.proj.weight"], transpose=True)
        put(f"{ob}/proj/bias", sd[hb + "attn.proj.bias"])
        put(f"{ob}/fc1/kernel", sd[hb + "mlp.fc1.weight"], transpose=True)
        put(f"{ob}/fc1/bias", sd[hb + "mlp.fc1.bias"])
        put(f"{ob}/fc2/kernel", sd[hb + "mlp.fc2.weight"], transpose=True)
        put(f"{ob}/fc2/bias", sd[hb + "mlp.fc2.bias"])
    put("vision/ln_q/scale", sd["visual.merger.ln_q.weight"])
    put("vision/ln_q/bias", sd["visual.merger.ln_q.bias"])
    put("vision/mlp_0/kernel", sd["visual.merger.mlp.0.weight"], transpose=True)
    put("vision/mlp_0/bias", sd["visual.merger.mlp.0.bias"])
    put("vision/mlp_2/kernel", sd["visual.merger.mlp.2.weight"], transpose=True)
    put("vision/mlp_2/bias", sd["visual.merger.mlp.2.bias"])

    # decoder
    put("lm/embed_tokens/embedding", sd["model.embed_tokens.weight"])
    if "lm_head.weight" in sd:
        put("lm/lm_head/kernel", sd["lm_head.weight"], transpose=True)
    put("lm/decoder/norm/weight", sd["model.norm.weight"])
    n_layers = 1 + max(
        (int(m.group(1)) for k in sd
         if (m := re.match(r"model\.layers\.(\d+)\.", k))), default=-1,
    )
    for i in range(n_layers):
        hb, ob = f"model.layers.{i}.", f"lm/decoder/layer_{i}"
        for p in ("q_proj", "k_proj", "v_proj"):
            put(f"{ob}/self_attn/{p}/kernel",
                sd[hb + f"self_attn.{p}.weight"], transpose=True)
            put(f"{ob}/self_attn/{p}/bias", sd[hb + f"self_attn.{p}.bias"])
        put(f"{ob}/self_attn/o_proj/kernel",
            sd[hb + "self_attn.o_proj.weight"], transpose=True)
        for p in ("gate_proj", "up_proj", "down_proj"):
            put(f"{ob}/{p}/kernel", sd[hb + f"mlp.{p}.weight"], transpose=True)
        put(f"{ob}/input_norm/weight", sd[hb + "input_layernorm.weight"])
        put(f"{ob}/post_attn_norm/weight",
            sd[hb + "post_attention_layernorm.weight"])

    from thinkdiff_tpu.models.convert import _nest

    return _nest(flat)
