"""Checkpoint converters: HF/torch state dicts -> JAX param pytrees.

Replaces the reference's direct consumption of HF ``from_pretrained`` models
and ``.pth`` checkpoints (reference: thinkdiff/models/base_model.py:40-111).
Converters are pure name-mapping + transpose; conversion happens once on the
host, then params are device_put with shardings.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            out[k] = np.asarray(v)
    return out


def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def convert_t5(sd: Dict[str, np.ndarray], dtype=None) -> Dict[str, Any]:
    """HF T5ForConditionalGeneration state dict -> our T5 params.

    Layer index mapping (HF -> ours):
      encoder block layer.0 = self_attn, layer.1 = ffn
      decoder block layer.0 = self_attn, layer.1 = cross_attn, layer.2 = ffn
    Dense weights transpose (out,in) -> (in,out).
    """
    flat: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        if transpose:
            arr = arr.T
        if dtype is not None:
            arr = arr.astype(dtype)
        flat[name] = arr

    put("shared/embedding", sd["shared.weight"])
    if "lm_head.weight" in sd:
        put("lm_head/kernel", sd["lm_head.weight"], transpose=True)

    for side, nlayer_key in (("encoder", "encoder"), ("decoder", "decoder")):
        prefix = f"{side}.block."
        n_blocks = 0
        for k in sd:
            m = re.match(rf"{side}\.block\.(\d+)\.", k)
            if m:
                n_blocks = max(n_blocks, int(m.group(1)) + 1)
        put(f"{side}/final_norm/weight", sd[f"{side}.final_layer_norm.weight"])
        put(
            f"{side}/rel_bias/rel_embedding",
            sd[f"{side}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        )
        for i in range(n_blocks):
            hb = f"{prefix}{i}.layer."
            ob = f"{side}/block_{i}"
            # self attention
            for p in ("q", "k", "v", "o"):
                put(f"{ob}/self_attn/{p}/kernel",
                    sd[f"{hb}0.SelfAttention.{p}.weight"], transpose=True)
            put(f"{ob}/self_attn_norm/weight", sd[f"{hb}0.layer_norm.weight"])
            if side == "decoder":
                for p in ("q", "k", "v", "o"):
                    put(f"{ob}/cross_attn/{p}/kernel",
                        sd[f"{hb}1.EncDecAttention.{p}.weight"], transpose=True)
                put(f"{ob}/cross_attn_norm/weight", sd[f"{hb}1.layer_norm.weight"])
                ffn_idx = 2
            else:
                ffn_idx = 1
            ffn_hf = f"{hb}{ffn_idx}.DenseReluDense."
            if f"{ffn_hf}wi_0.weight" in sd:
                put(f"{ob}/ffn/wi_0/kernel", sd[f"{ffn_hf}wi_0.weight"], transpose=True)
                put(f"{ob}/ffn/wi_1/kernel", sd[f"{ffn_hf}wi_1.weight"], transpose=True)
            else:
                put(f"{ob}/ffn/wi/kernel", sd[f"{ffn_hf}wi.weight"], transpose=True)
            put(f"{ob}/ffn/wo/kernel", sd[f"{ffn_hf}wo.weight"], transpose=True)
            put(f"{ob}/ffn_norm/weight", sd[f"{hb}{ffn_idx}.layer_norm.weight"])

    return _nest(flat)


def convert_clip_vit(sd: Dict[str, np.ndarray], prefix: str = "vision_model.",
                     dtype=None) -> Dict[str, Any]:
    """HF CLIP/Blip2 vision tower state dict -> our ViT params.

    Handles both CLIPVisionModel (`vision_model.*`, separate q/k/v, pre+post
    layernorm, class_embedding) and Blip2VisionModel (same layout with fused
    qkv and no pre_layernorm).
    """
    flat: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        if transpose:
            arr = arr.T
        if dtype is not None:
            arr = arr.astype(dtype)
        flat[name] = arr

    g = lambda k: sd[prefix + k]
    has = lambda k: (prefix + k) in sd

    emb = "embeddings."
    put("cls_token", g(emb + "class_embedding").reshape(1, 1, -1))
    if has(emb + "position_embedding.weight"):  # CLIP: nn.Embedding
        pos = g(emb + "position_embedding.weight")[None]
    else:  # Blip2: raw Parameter already (1, N, D)
        pos = g(emb + "position_embedding")
        if pos.ndim == 2:
            pos = pos[None]
    put("pos_embed", pos)
    pk = g(emb + "patch_embedding.weight")  # (D, C, P, P)
    put("patch_embed/kernel", pk.transpose(2, 3, 1, 0))  # HWIO
    if has(emb + "patch_embedding.bias"):
        put("patch_embed/bias", g(emb + "patch_embedding.bias"))

    if has("pre_layrnorm.weight"):  # CLIP's typo'd name
        put("pre_norm/scale", g("pre_layrnorm.weight"))
        put("pre_norm/bias", g("pre_layrnorm.bias"))
    if has("post_layernorm.weight"):
        put("post_norm/scale", g("post_layernorm.weight"))
        put("post_norm/bias", g("post_layernorm.bias"))

    n_blocks = 0
    for k in sd:
        m = re.match(rf"{re.escape(prefix)}encoder\.layers\.(\d+)\.", k)
        if m:
            n_blocks = max(n_blocks, int(m.group(1)) + 1)
    for i in range(n_blocks):
        hb = f"encoder.layers.{i}."
        ob = f"block_{i}"
        if has(hb + "self_attn.qkv.weight"):  # Blip2 fused qkv
            qkv_w = g(hb + "self_attn.qkv.weight")
            d = qkv_w.shape[0] // 3
            for j, p in enumerate(("q_proj", "k_proj", "v_proj")):
                put(f"{ob}/attn/{p}/kernel", qkv_w[j * d:(j + 1) * d], transpose=True)
            if has(hb + "self_attn.qkv.bias"):
                qkv_b = g(hb + "self_attn.qkv.bias")
                for j, p in enumerate(("q_proj", "k_proj", "v_proj")):
                    put(f"{ob}/attn/{p}/bias", qkv_b[j * d:(j + 1) * d])
            else:
                for p in ("q_proj", "k_proj", "v_proj"):
                    put(f"{ob}/attn/{p}/bias",
                        np.zeros((d,), dtype=qkv_w.dtype))
            put(f"{ob}/attn/out_proj/kernel",
                g(hb + "self_attn.projection.weight"), transpose=True)
            put(f"{ob}/attn/out_proj/bias", g(hb + "self_attn.projection.bias"))
        else:
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                put(f"{ob}/attn/{p}/kernel",
                    g(hb + f"self_attn.{p}.weight"), transpose=True)
                put(f"{ob}/attn/{p}/bias", g(hb + f"self_attn.{p}.bias"))
        put(f"{ob}/norm1/scale", g(hb + "layer_norm1.weight"))
        put(f"{ob}/norm1/bias", g(hb + "layer_norm1.bias"))
        put(f"{ob}/norm2/scale", g(hb + "layer_norm2.weight"))
        put(f"{ob}/norm2/bias", g(hb + "layer_norm2.bias"))
        put(f"{ob}/mlp_fc1/kernel", g(hb + "mlp.fc1.weight"), transpose=True)
        put(f"{ob}/mlp_fc1/bias", g(hb + "mlp.fc1.bias"))
        put(f"{ob}/mlp_fc2/kernel", g(hb + "mlp.fc2.weight"), transpose=True)
        put(f"{ob}/mlp_fc2/bias", g(hb + "mlp.fc2.bias"))

    return _nest(flat)
