"""ThinkDiff-LVLM multi-image (CoBSAT-style) inference (reference:
scripts/test/test_mllama_t5_decoder_flux_multi_image.py:77-272): interleaved
"Word k: <attr>," + image chat context, analyse-then-prompt instruction,
aligned output embeds -> FLUX at 512^2.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from scripts.common import bootstrap, parse_args  # noqa: E402

ANALYSE_INSTRUCTION = (
    "Please analyse the relationship between the words and the images, then "
    "generate a detailed prompt describing the next image for the final word "
    "so it can be created by a 2D diffusion model."
)


def build_interleaved_text(text_inputs, n_images):
    """'Word k: <attr>,' per item, images interleaved by the chat template."""
    parts = []
    for i, word in enumerate(text_inputs):
        parts.append(f"Word {i + 1}: {word},")
    return " ".join(parts) + " " + ANALYSE_INSTRUCTION


def main():
    args = parse_args("ThinkDiff-LVLM multi-image -> FLUX")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    from thinkdiff_tpu.engines.flux_sampler import save_images
    from thinkdiff_tpu.engines.pipeline import ThinkDiffPipeline

    model = task.build_model(cfg)

    image_paths = list(run.get("image_paths", []))
    text_inputs = list(run.get("text_inputs", []))
    out_dir = run.get("output_dir", "output/lvlm_flux_multi")
    seed = int(run.get("seed", 42))

    images = [Image.open(p) for p in image_paths]
    prompt_text = build_interleaved_text(text_inputs, len(images))
    samples = {"images": [images], "answers": [prompt_text]}
    conds, gen = model.get_embed(
        samples, embedding_type=run.get("embedding_type", "output_embed"),
        max_new_tokens=int(run.get("max_new_tokens", 128)),
    )
    print("generated:", gen.texts[0])

    pipeline = ThinkDiffPipeline.from_pretrained(
        run.get("flux_model", "black-forest-labs/FLUX.1-dev")
    )
    out = pipeline.generate(
        conds[0][None], prompt="",
        height=int(run.get("image_height", 512)),
        width=int(run.get("image_width", 512)),
        num_steps=int(run.get("num_inference_steps", 28)),
        guidance=float(run.get("guidance_scale", 3.5)), seed=seed,
    )
    out_path = os.path.join(out_dir, f"cobsat_seed{seed}.png")
    save_images(out, [out_path])
    print("saved:", out_path)


if __name__ == "__main__":
    main()
