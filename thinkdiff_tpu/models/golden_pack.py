"""Committed golden-vector pack: converter + model numerics frozen on disk.

The tiny-random parity suite (tests/test_t5_parity.py etc.) proves our
converters against live torch/HF implementations at test time. This module
checks the same numerics against fixtures COMMITTED to the repo
(tests/goldens/): tiny torch-layout checkpoints plus input/expected-output
vectors generated once by `scripts/make_goldens.py` from the torch
references. Two things that buys:

  * weight-day turnkey validation — the exact converter + forward protocol
    that must hold on released flan-t5-xxl / Qwen2-VL / FLUX / CogVideoX
    weights (reference checkpoints: thinkdiff/runners/runner_base.py:597-623,
    embeddings tap mllama_vllm_generate_1.py:612-617) is re-checkable in one
    command with NO torch/transformers in the loop
    (`python -m scripts.validate_real_checkpoints --goldens`);
  * regression freeze — any refactor between now and weight day that
    silently changes converter key-mapping or model numerics fails
    tests/test_goldens.py immediately, even in a torch-free environment.

Each family stores two .npz files under ``tests/goldens/``:
  <fam>_ckpt.npz   torch-layout state dict (or flattened flax params for
                   self-golden families), float32
  <fam>_io.npz     inputs + expected outputs, float32

Checks raise AssertionError on mismatch and return a summary dict.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

ATOL = 3e-4
RTOL = 1e-3

FAMILIES = (
    "t5", "blip2_vit", "clip_text", "qwen2_vl", "flux", "flux_vae",
    "cogvideox", "cogvideox_vae", "projector",
)


def default_root() -> Path:
    return Path(__file__).resolve().parents[2] / "tests" / "goldens"


def _load(root: Path, name: str) -> Dict[str, np.ndarray]:
    path = Path(root) / name
    if not path.exists():
        raise FileNotFoundError(path)
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flax param tree -> {'a/b/c': ndarray} (self-golden storage)."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree, np.float32)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def _close(label: str, got, want, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=atol, rtol=rtol, err_msg=label)
    diff = float(np.max(np.abs(np.asarray(got, np.float32)
                               - np.asarray(want, np.float32))))
    return {label: diff}


# --------------------------------------------------------------------------


def check_t5(root: Path) -> Dict[str, float]:
    """convert_t5 + full logits + encoder-less decode (the LVLM aligner path,
    reference mllama_vllm_t5_embed_decoder_2.py:585-598)."""
    import jax.numpy as jnp

    from thinkdiff_tpu.models.convert import convert_t5
    from thinkdiff_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    sd = _load(root, "t5_ckpt.npz")
    io = _load(root, "t5_io.npz")
    model = T5ForConditionalGeneration(T5Config.tiny())
    variables = {"params": convert_t5(sd)}
    out = model.apply(
        variables, input_ids=jnp.asarray(io["input_ids"]),
        attention_mask=jnp.asarray(io["attention_mask"]),
        decoder_input_ids=jnp.asarray(io["decoder_input_ids"]))
    res = _close("t5.logits", out, io["logits"])
    dec = model.apply(
        variables, method=model.decode_with_encoder_states,
        decoder_input_ids=jnp.asarray(io["decoder_input_ids2"]),
        encoder_states=jnp.asarray(io["encoder_states"]))
    res.update(_close("t5.encoderless_logits", dec, io["logits2"]))
    return res


def check_blip2_vit(root: Path) -> Dict[str, float]:
    import jax.numpy as jnp

    from thinkdiff_tpu.models.convert import convert_clip_vit
    from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer

    sd = _load(root, "blip2_vit_ckpt.npz")
    io = _load(root, "blip2_vit_io.npz")
    params = convert_clip_vit(sd, prefix="")
    cfg = ViTConfig.tiny(
        patch_bias="embeddings.patch_embedding.bias" in sd)
    out = VisionTransformer(cfg).apply(
        {"params": params},
        jnp.asarray(io["pixels"].transpose(0, 2, 3, 1)))
    return _close("blip2_vit.last_hidden", out, io["last_hidden"])


def check_clip_text(root: Path) -> Dict[str, float]:
    import jax.numpy as jnp

    from thinkdiff_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextEncoder, convert_clip_text)

    sd = _load(root, "clip_text_ckpt.npz")
    io = _load(root, "clip_text_io.npz")
    hidden, pooled = CLIPTextEncoder(CLIPTextConfig.tiny()).apply(
        {"params": convert_clip_text(sd)}, jnp.asarray(io["input_ids"]))
    res = _close("clip_text.hidden", hidden, io["last_hidden"])
    res.update(_close("clip_text.pooled", pooled, io["pooled"]))
    return res


def check_qwen2_vl(root: Path) -> Dict[str, float]:
    """convert_qwen2_vl + vision tower + decoder logits + the model.norm
    hidden tap (what the embedding generator exports — reference
    mllama_vllm_generate_1.py:612-617)."""
    import jax.numpy as jnp

    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower, convert_qwen2_vl,
        get_mrope_position_ids, vision_cos_sin, vision_rot_pos_emb)

    sd = _load(root, "qwen2_vl_ckpt.npz")
    io = _load(root, "qwen2_vl_io.npz")
    cfg = Qwen2VLConfig.tiny()
    params = convert_qwen2_vl(sd)
    ids = io["input_ids"]
    grid_thw = io["grid_thw"]

    pos_hw = vision_rot_pos_emb(grid_thw, cfg.vision.spatial_merge_size)
    cos, sin = vision_cos_sin(pos_hw, cfg.vision.head_dim)
    img_embeds = Qwen2VisionTower(cfg.vision).apply(
        {"params": params["vision"]}, jnp.asarray(io["pixel_values"]),
        jnp.asarray(cos), jnp.asarray(sin))
    img_mask = (ids == cfg.image_token_id).astype(np.int32)[None]
    full_img = np.zeros((1, len(ids), cfg.hidden_size), np.float32)
    full_img[0, img_mask[0] > 0] = np.asarray(img_embeds, np.float32)
    pos, _ = get_mrope_position_ids(
        ids, grid_thw, cfg.image_token_id, cfg.vision.spatial_merge_size)
    logits, hidden, _ = Qwen2VLModel(cfg).apply(
        {"params": params["lm"]}, input_ids=jnp.asarray(ids)[None],
        position_ids=jnp.asarray(pos)[:, None, :],
        image_embeds=jnp.asarray(full_img), image_mask=jnp.asarray(img_mask))
    res = _close("qwen2_vl.logits", np.asarray(logits)[0], io["logits"])
    res.update(_close("qwen2_vl.norm_tap", np.asarray(hidden)[0],
                      io["hidden_tap"]))
    return res


def check_flux(root: Path) -> Dict[str, float]:
    import jax.numpy as jnp

    from thinkdiff_tpu.models.flux import (
        FluxConfig, FluxTransformer, convert_flux)

    sd = _load(root, "flux_ckpt.npz")
    io = _load(root, "flux_io.npz")
    out = FluxTransformer(FluxConfig.tiny()).apply(
        {"params": convert_flux(sd)}, jnp.asarray(io["img"]),
        jnp.asarray(io["txt"]), jnp.asarray(io["pooled"]),
        jnp.asarray(io["timesteps"]), jnp.asarray(io["img_ids"]),
        jnp.asarray(io["txt_ids"]), jnp.asarray(io["guidance"]))
    return _close("flux.out", out, io["out"])


def check_flux_vae(root: Path) -> Dict[str, float]:
    import jax.numpy as jnp

    from thinkdiff_tpu.models.flux_vae import (
        VAEConfig, VAEDecoder, convert_vae_decoder)

    sd = _load(root, "flux_vae_ckpt.npz")
    io = _load(root, "flux_vae_io.npz")
    out = VAEDecoder(VAEConfig.tiny()).apply(
        {"params": convert_vae_decoder(sd)}, jnp.asarray(io["z"]))
    return _close("flux_vae.out", out, io["out"])


def check_cogvideox(root: Path) -> Dict[str, float]:
    import jax.numpy as jnp

    from thinkdiff_tpu.models.cogvideox import (
        CogVideoXConfig, CogVideoXTransformer, convert_cogvideox)

    sd = _load(root, "cogvideox_ckpt.npz")
    io = _load(root, "cogvideox_io.npz")
    out = CogVideoXTransformer(CogVideoXConfig.tiny()).apply(
        {"params": convert_cogvideox(sd)}, jnp.asarray(io["latent"]),
        jnp.asarray(io["text"]), jnp.asarray(io["timesteps"], jnp.int32))
    return _close("cogvideox.out", out, io["out"])


def check_cogvideox_vae(root: Path) -> Dict[str, float]:
    """Self-golden (no independent full-decoder torch reference exists in
    this image — its primitives are torch-validated in tests/test_cogvideox
    and tests/test_video_path): freezes OUR decoder numerics as of golden
    generation, so silent refactor drift is caught."""
    import jax.numpy as jnp

    from thinkdiff_tpu.models.cogvideox_vae import (
        CogVideoXVAEConfig, CogVideoXVAEDecoder)

    flat = _load(root, "cogvideox_vae_ckpt.npz")
    io = _load(root, "cogvideox_vae_io.npz")
    out = CogVideoXVAEDecoder(CogVideoXVAEConfig.tiny()).apply(
        {"params": unflatten_params(flat)}, jnp.asarray(io["z"]))
    return _close("cogvideox_vae.out", out, io["out"])


def check_projector(root: Path) -> Dict[str, float]:
    """convert_projector_torch on a reference-style ``mm_projector`` .pth
    layout (the released aligner checkpoints are exactly this — reference
    runner_base.py:597-623 saves trainable-only state dicts)."""
    import jax.numpy as jnp

    from thinkdiff_tpu.models.projector import (
        build_vision_projector, convert_projector_torch)

    sd = _load(root, "projector_ckpt.npz")
    io = _load(root, "projector_io.npz")
    params = convert_projector_torch(sd)
    out = build_vision_projector(
        "mlp2x_gelu_t5_norm", out_dim=io["out"].shape[-1]).apply(
        {"params": params}, jnp.asarray(io["x"]))
    return _close("projector.out", out, io["out"])


def _f32_precision(fn):
    """Pin matmul/conv precision to f32-accurate for the check: fixtures are
    torch/CPU float32, and on TPU the default bf16-pass matmuls drift ~1e-1
    on logits — spurious failures exactly where this pack must be runnable
    (weight day, on chip)."""
    import functools

    @functools.wraps(fn)
    def wrapped(root):
        import jax
        with jax.default_matmul_precision("highest"):
            return fn(root)
    return wrapped


CHECKS = {
    "t5": _f32_precision(check_t5),
    "blip2_vit": _f32_precision(check_blip2_vit),
    "clip_text": _f32_precision(check_clip_text),
    "qwen2_vl": _f32_precision(check_qwen2_vl),
    "flux": _f32_precision(check_flux),
    "flux_vae": _f32_precision(check_flux_vae),
    "cogvideox": _f32_precision(check_cogvideox),
    "cogvideox_vae": _f32_precision(check_cogvideox_vae),
    "projector": _f32_precision(check_projector),
}


def check_all(root: Path | None = None) -> Dict[str, float]:
    """Run every family whose fixtures exist; raise on mismatch or if NO
    fixture is present at all. Returns {check_label: max_abs_err}."""
    root = Path(root) if root is not None else default_root()
    summary: Dict[str, float] = {}
    ran = 0
    for fam, fn in CHECKS.items():
        try:
            summary.update(fn(root))
            ran += 1
        except FileNotFoundError:
            summary[f"{fam}.skipped"] = -1.0
    if not ran:
        raise FileNotFoundError(f"no golden fixtures under {root}")
    return summary
