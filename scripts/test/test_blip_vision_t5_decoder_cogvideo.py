"""ThinkDiff-CLIP video composition (reference:
scripts/test/test_blip_vision_t5_decoder_cogvideo.py:116-189): first 65
projected vision tokens + T5 text embeds within CogVideoX's 226-token budget
-> CogVideoX sampling (50 steps, guidance 6) -> 3D causal VAE decode ->
video file (MJPEG AVI natively; MP4 when ffmpeg is available — reference
saves MP4 via export_to_video, :186-189).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402

VISION_TOKEN_BUDGET = 65
TOTAL_TOKEN_BUDGET = 226


def main():
    args = parse_args("ThinkDiff-CLIP -> CogVideoX video")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    from thinkdiff_tpu.data.processors import BlipImageEvalProcessor
    from thinkdiff_tpu.engines.pipeline import T5TextEmbedder
    from thinkdiff_tpu.models.base import maybe_load_hf_weights
    from thinkdiff_tpu.models.cogvideox import (
        CogVideoXConfig, CogVideoXSampler, convert_cogvideox,
    )

    model = task.build_model(cfg)
    proc = BlipImageEvalProcessor(image_size=int(run.get("image_size", 224)))

    image_path = run.get("image_path")
    prompt = run.get("text_input", "")
    out_dir = run.get("output_dir", "output/clip_cogvideo")
    seed = int(run.get("seed", 42))

    arr = proc(Image.open(image_path))[None]
    vision_tokens = np.asarray(
        model.forward_encoder(arr.astype(np.float32))[0], np.float32
    )[:VISION_TOKEN_BUDGET]
    embedder = T5TextEmbedder.from_pretrained(
        run.get("t5_model", "google/flan-t5-xxl")
    )
    text_embeds = embedder(prompt, max_len=TOTAL_TOKEN_BUDGET - VISION_TOKEN_BUDGET)[0]
    cond = np.concatenate([vision_tokens, text_embeds], axis=0)[None]

    sd = maybe_load_hf_weights(run.get("cogvideo_model", "THUDM/CogVideoX-5b"))
    if sd is None:
        raise FileNotFoundError("CogVideoX weights not found locally")
    ccfg = CogVideoXConfig.cogvideox_5b()
    sampler = CogVideoXSampler(ccfg, convert_cogvideox(sd))
    latents = sampler.sample(
        cond, frames=int(run.get("num_frames", 13)),
        height=int(run.get("latent_height", 60)),
        width=int(run.get("latent_width", 90)),
        num_steps=int(run.get("num_inference_steps", 50)),
        guidance=float(run.get("guidance_scale", 6.0)), seed=seed,
    )
    os.makedirs(out_dir, exist_ok=True)
    if run.get("save_latents", False):
        lat_path = os.path.join(out_dir, f"video_latents_seed{seed}.npy")
        np.save(lat_path, np.asarray(latents, np.float32))
        print("saved latents:", lat_path)

    # 3D causal VAE decode -> frames -> video file
    from thinkdiff_tpu.data.video_io import save_video
    from thinkdiff_tpu.models.cogvideox_vae import (
        CogVideoXVAEConfig, CogVideoXVAEDecoder, convert_cogvideox_vae,
        decode_latents,
    )

    vcfg = CogVideoXVAEConfig.cogvideox_5b()
    decoder = CogVideoXVAEDecoder(vcfg)
    vae_params = convert_cogvideox_vae(sd)
    # latents from the sampler: (B, T, H, W, C)
    frames = decode_latents(decoder, vae_params, latents)[0]
    name = os.path.splitext(os.path.basename(image_path))[0]
    # mp4 matches the reference's export_to_video output (reference
    # test_blip_vision_t5_decoder_cogvideo.py:186-189); save_video
    # degrades to MJPEG-AVI if no mp4 encoder tier is available.
    out_path = os.path.join(
        out_dir, f"{name}_seed{seed}.{run.get('video_format', 'mp4')}")
    out_path = save_video(frames, out_path, fps=int(run.get("fps", 8)))
    print("saved video:", out_path)


if __name__ == "__main__":
    main()
