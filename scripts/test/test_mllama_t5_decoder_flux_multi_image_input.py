"""Embed-replay FLUX sampling (reference:
scripts/test/test_mllama_t5_decoder_flux_multi_image_input.py and
``..._input_embed.py``): load previously exported aligned embeds (.npy or
torch .pth), optionally concatenate extra T5 TEXT embeds AFTER the aligned
image tokens (reference :305-318), then sample FLUX."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def load_embeds(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True).float().numpy()


def main():
    args = parse_args("FLUX sampling from saved aligned embeds")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from thinkdiff_tpu.engines.flux_sampler import save_images
    from thinkdiff_tpu.engines.pipeline import T5TextEmbedder, ThinkDiffPipeline

    embed_path = run.get("embed_path")
    extra_text = run.get("extra_text_input", "")
    out_dir = run.get("output_dir", "output/lvlm_flux_replay")
    seed = int(run.get("seed", 42))

    cond = load_embeds(embed_path)
    if cond.ndim == 2:
        cond = cond[None]
    if extra_text:
        embedder = T5TextEmbedder.from_pretrained(
            run.get("t5_model", "google/flan-t5-xxl")
        )
        text_embeds = embedder(extra_text)
        cond = np.concatenate([cond, text_embeds], axis=1)

    pipeline = ThinkDiffPipeline.from_pretrained(
        run.get("flux_model", "black-forest-labs/FLUX.1-dev")
    )
    images = pipeline.generate(
        cond, prompt="",
        height=int(run.get("image_height", 512)),
        width=int(run.get("image_width", 512)),
        num_steps=int(run.get("num_inference_steps", 28)),
        guidance=float(run.get("guidance_scale", 3.5)), seed=seed,
    )
    name = os.path.splitext(os.path.basename(embed_path))[0]
    out_path = os.path.join(out_dir, f"{name}_seed{seed}.png")
    save_images(images, [out_path])
    print("saved:", out_path)


if __name__ == "__main__":
    main()
