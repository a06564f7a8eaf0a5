"""ThinkDiff-CLIP image(+text) -> FLUX inference (reference:
scripts/test/test_blip_vision_t5_decoder_flux.py:84-238 and the two-image
``_flux_text`` variant): per-image BLIP-2 ViT encode -> projector -> concat
[img_1; img_2; T5-text] -> FLUX.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def main():
    args = parse_args("ThinkDiff-CLIP -> FLUX inference")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    from thinkdiff_tpu.data.processors import BlipImageEvalProcessor
    from thinkdiff_tpu.engines.flux_sampler import save_images
    from thinkdiff_tpu.engines.pipeline import ThinkDiffPipeline

    model = task.build_model(cfg)
    proc = BlipImageEvalProcessor(image_size=224)

    image_paths = run.get("image_paths") or [run.get("image_path")]
    prompt = run.get("text_input", "")
    out_dir = run.get("output_dir", "output/clip_flux")
    seed = int(run.get("seed", 42))
    max_seq = int(run.get("max_sequence_length", 512))

    projections = []
    for p in image_paths:
        arr = proc(Image.open(p))[None]
        projections.append(model.forward_encoder(arr.astype(np.float32))[0])

    pipeline = ThinkDiffPipeline.from_pretrained(
        run.get("flux_model", "black-forest-labs/FLUX.1-dev")
    )
    text_embeds = None
    if prompt and pipeline.t5_embedder is not None:
        text_embeds = pipeline.t5_embedder(prompt)
    cond = pipeline.compose_clip_condition(
        projections, text_embeds, max_len=max_seq
    )
    images = pipeline.generate(
        cond[None] if cond.ndim == 2 else cond, prompt=prompt,
        height=int(run.get("image_height", 1024)),
        width=int(run.get("image_width", 1024)),
        num_steps=int(run.get("num_inference_steps", 28)),
        guidance=float(run.get("guidance_scale", 3.5)), seed=seed,
    )
    name = "_".join(os.path.splitext(os.path.basename(p))[0]
                    for p in image_paths)
    out_path = os.path.join(out_dir, f"{name}_seed{seed}.png")
    if os.path.exists(out_path) and run.get("skip_if_exists", True):
        print("exists, skipping:", out_path)
        return
    save_images(images, [out_path])
    print("saved:", out_path)


if __name__ == "__main__":
    main()
