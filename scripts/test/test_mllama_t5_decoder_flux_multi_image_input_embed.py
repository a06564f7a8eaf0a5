"""Text-only aligned-embed FLUX sampling (reference:
scripts/test/test_mllama_t5_decoder_flux_multi_image_input_embed.py).

Unlike ``..._multi_image_input.py`` (images + extra T5 text concat), this
variant feeds a TEXT-ONLY prompt through the LVLM, aligns the selected
embedding type (model cfg ``embedding_type``, default output_embed), pads or
cuts the conditioning to ``run.max_tokens`` (reference :257-265), and samples
FLUX from the aligned tokens alone — a text->embed->image reconstruction
probe of the aligner."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def pad_or_cut(cond: np.ndarray, max_tokens) -> np.ndarray:
    """(B, S, D) -> (B, max_tokens, D) by zero-pad / truncate."""
    if max_tokens is None:
        return cond
    max_tokens = int(max_tokens)
    if cond.shape[1] > max_tokens:
        return cond[:, :max_tokens]
    if cond.shape[1] < max_tokens:
        pad = np.zeros(
            (cond.shape[0], max_tokens - cond.shape[1], cond.shape[2]),
            cond.dtype)
        return np.concatenate([cond, pad], axis=1)
    return cond


def main():
    args = parse_args("LVLM text-only embed -> FLUX")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from thinkdiff_tpu.engines.flux_sampler import save_images
    from thinkdiff_tpu.engines.pipeline import ThinkDiffPipeline

    model = task.build_model(cfg)
    prompts = list(run.get("prompts") or [run.get("prompt", "")])
    image_names = list(run.get("image_names") or
                       [f"text{i}" for i in range(len(prompts))])
    out_dir = run.get("output_dir", "output/lvlm_text_embed_flux")
    os.makedirs(out_dir, exist_ok=True)
    embedding_type = cfg.model_cfg.get("embedding_type", "output_embed")

    pipeline = ThinkDiffPipeline.from_pretrained(
        run.get("flux_model", "black-forest-labs/FLUX.1-dev"))

    for name, prompt in zip(image_names, prompts):
        out_path = os.path.join(
            out_dir, f"{name}_edit_4_flux_{embedding_type}_0.png")
        if os.path.exists(out_path):
            print("exists, skipping:", out_path)
            continue
        # text-only sample: no images in the chat context (reference :200-232)
        samples = {"images": [[]], "answers": [prompt]}
        conds, gen = model.get_embed(
            samples, embedding_type=embedding_type,
            max_new_tokens=int(run.get("max_new_tokens", 128)),
        )
        print("generated:", gen.texts[0])
        cond = pad_or_cut(
            np.asarray(conds[0], np.float32)[None], run.get("max_tokens"))
        images = pipeline.generate(
            cond, prompt="",
            height=int(run.get("image_height", 512)),
            width=int(run.get("image_width", 512)),
            num_steps=int(run.get("num_inference_steps", 28)),
            guidance=float(run.get("guidance_scale", 3.5)),
            seed=int(run.get("seed", 42)),
        )
        save_images(images, [out_path])
        print("saved:", out_path)


if __name__ == "__main__":
    main()
