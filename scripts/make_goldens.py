"""Generate the committed golden-vector pack (tests/goldens/).

Runs the torch/HF reference implementations ONCE on seeded tiny models and
freezes (checkpoint, input, expected output) triples to .npz. After this,
`tests/test_goldens.py` and `scripts/validate_real_checkpoints.py --goldens`
re-verify our converters + models against these fixtures with no torch in
the loop. Regenerate only when a tiny geometry intentionally changes.

Requires torch + transformers (both in this image). Usage:

    python -m scripts.make_goldens [--out tests/goldens]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _save(dst: Path, name: str, **arrays):
    np.savez_compressed(dst / name, **arrays)
    size = (dst / (name + ".npz")).stat().st_size
    print(f"  wrote {name}.npz ({size / 1024:.0f} KiB, {len(arrays)} arrays)")


def _sd_numpy(model):
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in model.state_dict().items()}


def _load_test_module(name: str):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "tests" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def gen_t5(out: Path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        tie_word_embeddings=False, decoder_start_token_id=0,
    )
    model = transformers.T5ForConditionalGeneration(cfg).eval()
    rng = np.random.RandomState(0)
    input_ids = rng.randint(1, 128, (2, 9))
    dec_ids = rng.randint(1, 128, (2, 5))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    rng2 = np.random.RandomState(2)
    states = rng2.randn(2, 7, 32).astype(np.float32)
    dec_ids2 = rng2.randint(1, 128, (2, 5))
    with torch.no_grad():
        logits = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
        logits2 = model(
            encoder_outputs=(torch.tensor(states),),
            decoder_input_ids=torch.tensor(dec_ids2)).logits.numpy()
    _save(out, "t5_ckpt", **_sd_numpy(model))
    _save(out, "t5_io", input_ids=input_ids, attention_mask=mask,
          decoder_input_ids=dec_ids, logits=logits,
          encoder_states=states, decoder_input_ids2=dec_ids2,
          logits2=logits2)


def gen_blip2_vit(out: Path):
    import torch
    from transformers import Blip2VisionConfig, Blip2VisionModel

    torch.manual_seed(0)
    hf = Blip2VisionModel(Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)).eval()
    pixels = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        last = hf(pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
    _save(out, "blip2_vit_ckpt", **_sd_numpy(hf))
    _save(out, "blip2_vit_io", pixels=pixels, last_hidden=last)


def gen_clip_text(out: Path):
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    torch.manual_seed(0)
    hf = CLIPTextModel(CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, bos_token_id=98, eos_token_id=99)).eval()
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 90, (2, 9))
    ids[:, -1] = 99
    ids[0, 5] = 99
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids))
    _save(out, "clip_text_ckpt", **_sd_numpy(hf))
    _save(out, "clip_text_io", input_ids=ids,
          last_hidden=ref.last_hidden_state.numpy(),
          pooled=ref.pooler_output.numpy())


def gen_qwen2_vl(out: Path):
    import torch
    import transformers

    from thinkdiff_tpu.models.qwen2_vl import Qwen2VLConfig

    torch.manual_seed(0)
    hf = transformers.Qwen2VLForConditionalGeneration(
        transformers.Qwen2VLConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
            rms_norm_eps=1e-6, rope_theta=1000000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            vision_config=dict(
                depth=2, embed_dim=32, hidden_size=64, num_heads=4,
                in_channels=3, patch_size=4, spatial_merge_size=2,
                temporal_patch_size=2),
            tie_word_embeddings=False, image_token_id=250,
            video_token_id=251, vision_start_token_id=249,
            vision_end_token_id=248)).eval()

    cfg = Qwen2VLConfig.tiny()
    rs = np.random.RandomState(0)
    t, h, w = 1, 4, 4
    n_patches = t * h * w
    n_img_tokens = n_patches // (cfg.vision.spatial_merge_size ** 2)
    pixel_values = rs.randn(n_patches, cfg.vision.patch_dim).astype(np.float32)
    ids = np.array(
        list(rs.randint(1, 200, 3)) + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_img_tokens + list(rs.randint(1, 200, 3)),
        np.int64)
    grid_thw = np.array([[t, h, w]], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)[None],
                 pixel_values=torch.tensor(pixel_values),
                 image_grid_thw=torch.tensor(grid_thw),
                 output_hidden_states=True)
    _save(out, "qwen2_vl_ckpt", **_sd_numpy(hf))
    _save(out, "qwen2_vl_io", input_ids=ids, pixel_values=pixel_values,
          grid_thw=grid_thw, logits=ref.logits[0].numpy(),
          hidden_tap=ref.hidden_states[-1][0].numpy())


def gen_flux(out: Path):
    import torch

    from thinkdiff_tpu.models.flux import FluxConfig, make_img_ids

    tf = _load_test_module("test_flux")
    cfg = FluxConfig.tiny()
    ref = tf._build_torch_flux(cfg)
    rs = np.random.RandomState(0)
    s_img, s_txt = 16, 5
    img = rs.randn(2, s_img, cfg.in_channels).astype(np.float32)
    txt = rs.randn(2, s_txt, cfg.joint_attention_dim).astype(np.float32)
    pooled = rs.randn(2, cfg.pooled_projection_dim).astype(np.float32)
    ts = np.asarray([0.3, 0.9], np.float32)
    gd = np.asarray([3.5, 1.0], np.float32)
    img_ids = np.asarray(make_img_ids(8, 8), np.float32)
    txt_ids = np.zeros((s_txt, 3), np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(img), torch.tensor(txt),
                   torch.tensor(pooled), torch.tensor(ts),
                   torch.tensor(img_ids), torch.tensor(txt_ids),
                   torch.tensor(gd)).numpy()
    _save(out, "flux_ckpt", **_sd_numpy(ref))
    _save(out, "flux_io", img=img, txt=txt, pooled=pooled, timesteps=ts,
          guidance=gd, img_ids=img_ids, txt_ids=txt_ids, out=want)


def gen_flux_vae(out: Path):
    import torch

    from thinkdiff_tpu.models.flux_vae import VAEConfig

    tf = _load_test_module("test_flux")
    cfg = VAEConfig.tiny()
    ref = tf._build_torch_vae_decoder(cfg)
    z = np.random.RandomState(0).randn(2, 6, 6, cfg.latent_channels).astype(
        np.float32)
    with torch.no_grad():
        want = ref.decoder(
            torch.tensor(z).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    _save(out, "flux_vae_ckpt", **_sd_numpy(ref))
    _save(out, "flux_vae_io", z=z, out=want)


def gen_cogvideox(out: Path):
    import torch

    from thinkdiff_tpu.models.cogvideox import CogVideoXConfig

    tc = _load_test_module("test_cogvideox")
    cfg = CogVideoXConfig.tiny()
    ref = tc._build_torch_cogvideox(cfg)
    rs = np.random.RandomState(0)
    lat = rs.randn(2, 2, 8, 8, cfg.in_channels).astype(np.float32)
    txt = rs.randn(2, 5, cfg.text_dim).astype(np.float32)
    ts = np.asarray([17, 903], np.int64)
    with torch.no_grad():
        want = ref(torch.tensor(lat), torch.tensor(txt),
                   torch.tensor(ts)).numpy()
    _save(out, "cogvideox_ckpt", **_sd_numpy(ref))
    _save(out, "cogvideox_io", latent=lat, text=txt, timesteps=ts, out=want)


def gen_cogvideox_vae(out: Path):
    """Self-golden (no full torch ref in-image; primitives torch-validated
    in tests/test_cogvideox.py + tests/test_video_path.py). Forces the CPU
    platform — the fixture must be platform-independent f32, and the axon
    TPU plugin ignores JAX_PLATFORMS=cpu (env alone is not enough)."""
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; trust the caller's platform
    import jax.numpy as jnp

    from thinkdiff_tpu.models.cogvideox_vae import (
        CogVideoXVAEConfig, CogVideoXVAEDecoder)
    from thinkdiff_tpu.models.golden_pack import flatten_params

    cfg = CogVideoXVAEConfig.tiny()
    dec = CogVideoXVAEDecoder(cfg)
    z0 = jnp.zeros((1, 3, 4, 4, cfg.latent_channels))
    params = dec.init(jax.random.PRNGKey(0), z0)["params"]
    z = np.random.RandomState(0).randn(
        1, 3, 4, 4, cfg.latent_channels).astype(np.float32)
    want = np.asarray(dec.apply({"params": params}, jnp.asarray(z)))
    _save(out, "cogvideox_vae_ckpt", **flatten_params(params))
    _save(out, "cogvideox_vae_io", z=z, out=want)


def gen_projector(out: Path):
    """Reference-style mm_projector .pth layout + hand-computed torch
    forward (Linear -> GELU(exact) -> Linear -> T5LayerNorm)."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(7)
    d_in, d_out = 24, 32
    w0 = torch.randn(d_out, d_in)
    b0 = torch.randn(d_out)
    w2 = torch.randn(d_out, d_out)
    b2 = torch.randn(d_out)
    wn = torch.rand(d_out) + 0.5
    x = torch.randn(2, 5, d_in)
    with torch.no_grad():
        h = F.gelu(F.linear(x, w0, b0), approximate="none")
        h = F.linear(h, w2, b2)
        var = h.pow(2).mean(-1, keepdim=True)
        want = (h * torch.rsqrt(var + 1e-6) * wn).numpy()
    sd = {"mm_projector.0.weight": w0.numpy(), "mm_projector.0.bias": b0.numpy(),
          "mm_projector.2.weight": w2.numpy(), "mm_projector.2.bias": b2.numpy(),
          "mm_projector.3.weight": wn.numpy()}
    _save(out, "projector_ckpt", **sd)
    _save(out, "projector_io", x=x.numpy(), out=want)


GENERATORS = {
    "t5": gen_t5, "blip2_vit": gen_blip2_vit, "clip_text": gen_clip_text,
    "qwen2_vl": gen_qwen2_vl, "flux": gen_flux, "flux_vae": gen_flux_vae,
    "cogvideox": gen_cogvideox, "cogvideox_vae": gen_cogvideox_vae,
    "projector": gen_projector,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "tests" / "goldens"))
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of families to regenerate")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fams = args.only or list(GENERATORS)
    for fam in fams:
        print(f"[{fam}]")
        GENERATORS[fam](out)

    # verify the pack round-trips through our side immediately
    from thinkdiff_tpu.models.golden_pack import CHECKS
    print("verifying...")
    for fam in fams:
        res = CHECKS[fam](out)
        worst = max(v for v in res.values())
        print(f"  [OK] {fam}: max_abs_err {worst:.2e}")


if __name__ == "__main__":
    main()
