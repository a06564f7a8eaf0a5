"""w8a8 / int8 QUALITY dossier: end-to-end denoise loops on the committed
golden checkpoints (real torch-layout weights, tiny geometry), comparing
bf16 / int8 / w8a8 trajectories against the f32 truth in BOTH latent space
and pixel space (golden fp VAE decode).

Rationale: the headline FLUX serving number is w8a8 and CogVideoX ships a
measured w8a8 mode, but until this file every quantization-quality claim
was single-matmul or aligner-loss based (tests/test_quant.py) — nothing
gated what 6 recursive denoise steps do to the image. The gate is
RELATIVE: a quantized full-loop trajectory may drift at most GATE_X times
the drift bf16 itself introduces vs f32 (bf16 is the parity serving
default, so its drift is the accepted noise floor of the deployment).

Also covers the SmoothQuant channel equalizer on real-layout golden
weights (ops/quant.equalize_quantized_tree) and the structure-guided
quantize_like loader (FLUX mixes QDense blocks with plain-Dense
embedders; quantize_tree's size heuristic cannot load those).

Reference operating points: FLUX 28-step 1024x1024 guidance 3.5
(reference scripts/test/test_mllama_t5_decoder_flux.py:182-192);
CogVideoX-5b 50-step guidance 6 (test_blip_vision_t5_decoder_cogvideo.py:
116-186). Tiny-geometry loops mirror those shapes' code paths exactly.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.ops.quant import (
    collect_act_stats, equalize_quantized_tree, quantize_like,
)

GOLD = pathlib.Path(__file__).parent / "goldens"

# quantized full-loop drift allowed, in units of bf16-vs-f32 drift.
# Measured on the goldens (CPU, 2026-08): flux latent int8 1.6x / w8a8
# 1.7x, pixel 1.4x / 1.45x; cogvideox latent int8 1.05x / w8a8 1.5x,
# pixel 1.1x / 1.4x of the bf16 floor -> gate at 4x.
GATE_X = 4.0


def _load_sd(name):
    data = np.load(GOLD / f"{name}.npz")
    return {k: data[k] for k in data.files}


def _rel(a, b, truth):
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    den = np.abs(np.asarray(truth, np.float32)).mean() + 1e-8
    return float(d.mean() / den), float(d.max() / den)


# --------------------------------------------------------------------------
# FLUX
# --------------------------------------------------------------------------


def _flux_models():
    from thinkdiff_tpu.models.flux import (
        FluxConfig, FluxTransformer, convert_flux,
    )

    sd = _load_sd("flux_ckpt")
    fp_params = convert_flux(sd)

    def build(dtype, quant):
        cfg = FluxConfig.tiny(dtype=dtype, quant_int8=quant)
        model = FluxTransformer(cfg)
        if quant:
            struct = jax.eval_shape(
                lambda r: model.init(
                    r, jnp.zeros((1, 16, cfg.in_channels)),
                    jnp.zeros((1, 4, cfg.joint_attention_dim)),
                    jnp.zeros((1, cfg.pooled_projection_dim)),
                    jnp.ones((1,)), jnp.zeros((16, 3)), jnp.zeros((4, 3)),
                    jnp.ones((1,))),
                jax.random.PRNGKey(0))["params"]
            params = quantize_like(fp_params, struct)
        else:
            params = fp_params
        return cfg, model, params

    return build


def _flux_latents(build, dtype, quant, steps=6):
    from thinkdiff_tpu.engines.flux_sampler import FluxSampler

    cfg, _, params = build(dtype, quant)
    sampler = FluxSampler(cfg, params)
    rs = np.random.RandomState(0)
    txt = rs.randn(1, 4, cfg.joint_attention_dim).astype(np.float32)
    pooled = rs.randn(1, cfg.pooled_projection_dim).astype(np.float32)
    lat = sampler.sample(prompt_embeds=txt, pooled_embeds=pooled,
                         height=32, width=32, num_steps=steps,
                         guidance=3.5, seed=0, output_latents=True)
    return np.asarray(lat, np.float32)


def _flux_pixels(latents):
    """Decode packed latents through the GOLDEN fp32 VAE (the shared
    yardstick: every leg's latents go through the same fp decoder)."""
    from thinkdiff_tpu.models.flux import unpack_latents
    from thinkdiff_tpu.models.flux_vae import (
        VAEConfig, VAEDecoder, convert_vae_decoder,
    )

    vae_cfg = VAEConfig.tiny()
    vae = VAEDecoder(vae_cfg)
    vae_params = convert_vae_decoder(_load_sd("flux_vae_ckpt"))
    spatial = unpack_latents(jnp.asarray(latents, jnp.float32), 4, 4)
    img = vae.apply({"params": vae_params}, spatial)
    return np.asarray(img, np.float32)


@pytest.fixture(scope="module")
def flux_legs():
    build = _flux_models()
    legs = {
        "f32": _flux_latents(build, jnp.float32, False),
        "bf16": _flux_latents(build, jnp.bfloat16, False),
        "int8": _flux_latents(build, jnp.bfloat16, True),
        "w8a8": _flux_latents(build, jnp.bfloat16, "w8a8"),
    }
    return legs


def test_flux_denoise_quant_latent_drift_gated(flux_legs):
    truth = flux_legs["f32"]
    floor_mean, floor_max = _rel(flux_legs["bf16"], truth, truth)
    assert floor_mean > 0, "bf16 must differ from f32 (sanity)"
    report = {"bf16": (floor_mean, floor_max)}
    for leg in ("int8", "w8a8"):
        m, mx = _rel(flux_legs[leg], truth, truth)
        report[leg] = (m, mx)
        assert np.isfinite(flux_legs[leg]).all(), leg
        assert m <= GATE_X * floor_mean, (leg, report)
    print("flux latent drift (mean_rel, max_rel):", report)


def test_flux_denoise_quant_pixel_drift_gated(flux_legs):
    # raw decoder output (~[-1, 1] before the sampler's /2+0.5 clamp):
    # compare in the units the image is made of
    truth = _flux_pixels(flux_legs["f32"])
    assert np.isfinite(truth).all()
    floor = np.abs(_flux_pixels(flux_legs["bf16"]) - truth).mean()
    report = {"bf16": float(floor)}
    for leg in ("int8", "w8a8"):
        px = _flux_pixels(flux_legs[leg])
        d = np.abs(px - truth)
        report[leg] = float(d.mean())
        assert d.mean() <= max(GATE_X * floor, 1e-4), (leg, report)
        assert d.mean() <= 0.3, (leg, report)  # catastrophic-failure guard
    print("flux pixel |delta| mean:", report)


def test_flux_smoothquant_equalizer_on_golden_weights():
    """Calibrate the SmoothQuant equalizer with act stats from a real
    forward on golden weights and verify (a) the equalized w8a8 forward
    stays at least as close to fp as the unequalized one (the equalizer
    is a numerics-preserving rewrite: x'W' == xW up to quant error), and
    (b) input_scale actually changed (the calibration did something)."""
    from thinkdiff_tpu.models.flux import FluxTransformer, FluxConfig

    build = _flux_models()
    io = _load_sd("flux_io")
    args = (jnp.asarray(io["img"]), jnp.asarray(io["txt"]),
            jnp.asarray(io["pooled"]), jnp.asarray(io["timesteps"]),
            jnp.asarray(io["img_ids"]), jnp.asarray(io["txt_ids"]),
            jnp.asarray(io["guidance"]))

    cfg_fp, model_fp, params_fp = build(jnp.float32, False)
    want = np.asarray(model_fp.apply({"params": params_fp}, *args),
                      np.float32)

    cfg_q, model_q, params_q = build(jnp.float32, "w8a8")
    got_q = np.asarray(model_q.apply({"params": params_q}, *args),
                       np.float32)

    stats = collect_act_stats(model_q, {"params": params_q}, *args)
    params_eq = equalize_quantized_tree(params_q, stats, alpha=0.5)
    got_eq = np.asarray(model_q.apply({"params": params_eq}, *args),
                        np.float32)

    base_mean, _ = _rel(got_q, want, want)
    eq_mean, _ = _rel(got_eq, want, want)
    print(f"flux w8a8 forward drift vs fp: plain={base_mean:.5f} "
          f"equalized={eq_mean:.5f}")
    assert eq_mean <= 1.25 * base_mean, (eq_mean, base_mean)

    scales = []

    def _walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "input_scale":
                    scales.append(np.asarray(v))
                else:
                    _walk(v)

    _walk(params_eq)
    assert scales, "w8a8 tree has no input_scale slots"
    changed = any(not np.allclose(s, 1.0) for s in scales)
    assert changed, "equalizer left every input_scale at identity"


# --------------------------------------------------------------------------
# CogVideoX
# --------------------------------------------------------------------------


def _cog_latents(dtype, quant, steps=4):
    from thinkdiff_tpu.models.cogvideox import (
        CogVideoXConfig, CogVideoXSampler, CogVideoXTransformer,
        convert_cogvideox,
    )

    sd = _load_sd("cogvideox_ckpt")
    fp_params = convert_cogvideox(sd)
    cfg = CogVideoXConfig.tiny(dtype=dtype, quant_int8=quant)
    if quant:
        model = CogVideoXTransformer(cfg)
        struct = jax.eval_shape(
            lambda r: model.init(
                r, jnp.zeros((1, 2, 8, 8, cfg.in_channels)),
                jnp.zeros((1, 4, cfg.text_dim)),
                jnp.zeros((1,), jnp.int32)),
            jax.random.PRNGKey(0))["params"]
        params = quantize_like(fp_params, struct)
    else:
        params = fp_params
    sampler = CogVideoXSampler(cfg, params)
    rs = np.random.RandomState(0)
    txt = rs.randn(1, 4, cfg.text_dim).astype(np.float32)
    lat = sampler.sample(txt, frames=2, height=8, width=8,
                         num_steps=steps, guidance=6.0, seed=0)
    return np.asarray(lat, np.float32)


def _cog_pixels(latents):
    from thinkdiff_tpu.models.cogvideox_vae import (
        CogVideoXVAEConfig, CogVideoXVAEDecoder, convert_cogvideox_vae,
    )

    from thinkdiff_tpu.models.golden_pack import unflatten_params

    vae_cfg = CogVideoXVAEConfig.tiny()
    vae = CogVideoXVAEDecoder(vae_cfg)
    # this golden is stored as a flattened FLAX tree (make_goldens.py:246),
    # unlike the torch state-dict goldens
    vae_params = unflatten_params(_load_sd("cogvideox_vae_ckpt"))
    img = vae.apply({"params": vae_params},
                    jnp.asarray(latents, jnp.float32))
    return np.asarray(img, np.float32)


@pytest.fixture(scope="module")
def cog_legs():
    return {
        "f32": _cog_latents(jnp.float32, False),
        "bf16": _cog_latents(jnp.bfloat16, False),
        "int8": _cog_latents(jnp.bfloat16, True),
        "w8a8": _cog_latents(jnp.bfloat16, "w8a8"),
    }


def test_cogvideox_denoise_quant_latent_drift_gated(cog_legs):
    truth = cog_legs["f32"]
    floor_mean, _ = _rel(cog_legs["bf16"], truth, truth)
    assert floor_mean > 0
    report = {"bf16": floor_mean}
    for leg in ("int8", "w8a8"):
        m, _ = _rel(cog_legs[leg], truth, truth)
        report[leg] = m
        assert np.isfinite(cog_legs[leg]).all(), leg
        assert m <= GATE_X * floor_mean, (leg, report)
    print("cogvideox latent drift (mean_rel):", report)


def test_cogvideox_denoise_quant_pixel_drift_gated(cog_legs):
    truth = _cog_pixels(cog_legs["f32"])
    floor = np.abs(_cog_pixels(cog_legs["bf16"]) - truth).mean()
    report = {"bf16": float(floor)}
    for leg in ("int8", "w8a8"):
        d = np.abs(_cog_pixels(cog_legs[leg]) - truth)
        report[leg] = float(d.mean())
        assert d.mean() <= max(GATE_X * floor, 1e-4), (leg, report)
    print("cogvideox pixel |delta| mean:", report)


# --------------------------------------------------------------------------
# Qwen2-VL vision tower (engine vision_quantization knob)
# --------------------------------------------------------------------------


def test_vision_tower_quant_hidden_tap_drift_gated():
    """Vision-tower quant quality on REAL torch-layout golden weights,
    measured at the engine's actual product: the model.norm hidden tap
    (what the embedding generator exports — reference
    mllama_vllm_generate_1.py:612-617). The whole VLM forward runs —
    quantized vision feeding the fp decoder — so vision quant error is
    judged after it propagates through the decoder, not at the tower
    output. Gate: same relative discipline as the denoise dossier
    (quantized drift <= GATE_X times the bf16 floor vs the f32 truth)."""
    import dataclasses

    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower, convert_qwen2_vl,
        get_mrope_position_ids, vision_cos_sin, vision_rot_pos_emb,
    )
    from thinkdiff_tpu.ops.quant import quantize_tree

    if not (GOLD / "qwen2_vl_ckpt.npz").exists():
        pytest.skip("qwen2_vl goldens not generated")
    sd = _load_sd("qwen2_vl_ckpt")
    io = np.load(GOLD / "qwen2_vl_io.npz")
    cfg = Qwen2VLConfig.tiny()
    params = convert_qwen2_vl(sd)
    ids, grid_thw = io["input_ids"], io["grid_thw"]
    pos_hw = vision_rot_pos_emb(grid_thw, cfg.vision.spatial_merge_size)
    cos, sin = vision_cos_sin(pos_hw, cfg.vision.head_dim)
    pos, _ = get_mrope_position_ids(
        ids, grid_thw, cfg.image_token_id, cfg.vision.spatial_merge_size)
    img_mask = (ids == cfg.image_token_id).astype(np.int32)[None]

    def tap(vision_quant, dtype):
        vc = dataclasses.replace(cfg.vision, quant_int8=vision_quant,
                                 dtype=dtype)
        vp = (quantize_tree(params["vision"], min_size=0,
                            w8a8=vision_quant == "w8a8")
              if vision_quant else params["vision"])
        emb = Qwen2VisionTower(vc).apply(
            {"params": vp}, jnp.asarray(io["pixel_values"]),
            jnp.asarray(cos), jnp.asarray(sin))
        full = np.zeros((1, len(ids), cfg.hidden_size), np.float32)
        full[0, img_mask[0] > 0] = np.asarray(emb, np.float32)
        _, hidden, _ = Qwen2VLModel(cfg).apply(
            {"params": params["lm"]}, input_ids=jnp.asarray(ids)[None],
            position_ids=jnp.asarray(pos)[:, None, :],
            image_embeds=jnp.asarray(full), image_mask=jnp.asarray(img_mask))
        return np.asarray(hidden, np.float32)[0]

    truth = tap(False, jnp.float32)
    floor_mean, _ = _rel(tap(False, jnp.bfloat16), truth, truth)
    floor_mean = max(floor_mean, 1e-5)
    for mode in (True, "w8a8"):
        drift_mean, _ = _rel(tap(mode, jnp.bfloat16), truth, truth)
        assert drift_mean <= GATE_X * floor_mean, (
            f"vision {mode}: hidden-tap drift {drift_mean:.5f} vs bf16 "
            f"floor {floor_mean:.5f} (gate {GATE_X}x)")
