"""ThinkDiff-CLIP video composition (reference:
scripts/test/test_blip_vision_t5_decoder_cogvideo.py:116-189): first 65
projected vision tokens + T5 text embeds within CogVideoX's 226-token budget
-> CogVideoX sampling (50 steps, guidance 6).
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
    proc = BlipImageEvalProcessor(image_size=224)

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
    out_path = os.path.join(out_dir, f"video_latents_seed{seed}.npy")
    np.save(out_path, np.asarray(latents, np.float32))
    print("saved latents:", out_path, "(3D-VAE decode lands in a later round)")


if __name__ == "__main__":
    main()
