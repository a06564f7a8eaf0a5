"""ThinkDiff-CLIP image+text composition -> FLUX (reference:
scripts/test/test_blip_vision_t5_decoder_flux_text.py:100-328).

The headline paper capability: per-image BLIP-2 ViT encode -> projector
tokens, concatenated [img_1; img_2; ...; T5-text(prompt)] (images first,
text last — reference :196-216), pooled CLIP-L embeds from the text prompt.

Input surface matches the reference run config:
  - images: ``run.img_folder`` (every .png/.jpg) | ``run.img_json`` (JSON
    list; items may be lists for multi-image composition) | ``run.img_urls``
  - prompts: ``run.prompt_json`` ({image_name: prompt}, e.g.
    configs/single_image_text_prompts.json) | ``run.questions`` +
    ``run.questions_names``
  - naming: use_image_name_as_output_name | use_image_name_and_prompt_as_
    output_name | default ``{image}_clip_t5_flux_{name}_seed_{seed}.png``;
    existing outputs are skipped (resume semantics, reference :179-182).
"""

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def _image_list(run):
    if run.get("img_folder"):
        folder = run["img_folder"]
        urls = sorted(
            os.path.join(folder, n) for n in os.listdir(folder)
            if n.endswith((".png", ".jpg"))
        )
    elif run.get("img_json"):
        with open(run["img_json"]) as f:
            urls = json.load(f)
    else:
        urls = list(run.get("img_urls", []))
    if run.get("img_urls_len"):
        urls = urls[: int(run["img_urls_len"])]
    return urls


def _image_names(run, img_urls):
    if run.get("image_names"):
        return list(run["image_names"])
    names = []
    for u in img_urls:
        if isinstance(u, (list, tuple)):
            names.append("_".join(
                os.path.splitext(os.path.basename(s))[0] for s in u))
        else:
            names.append(os.path.splitext(os.path.basename(u))[0])
    return names


def _output_path(run, out_dir, image_name, prompt, q_name, seed):
    if run.get("use_image_name_as_output_name", False):
        return os.path.join(out_dir, f"{image_name}.png")
    if run.get("use_image_name_and_prompt_as_output_name", False):
        p = re.sub(r"[^\w\s-]", "", prompt)
        p = re.sub(r"\s+", "_", p)
        return os.path.join(out_dir, f"{image_name}_{p}.png")
    tag = f"_{q_name}" if q_name else ""
    return os.path.join(
        out_dir, f"{image_name}_clip_t5_flux{tag}_seed_{seed}.png")


def main():
    args = parse_args("ThinkDiff-CLIP image+text -> FLUX")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    from thinkdiff_tpu.data.processors import BlipImageEvalProcessor
    from thinkdiff_tpu.engines.flux_sampler import save_images
    from thinkdiff_tpu.engines.pipeline import ThinkDiffPipeline

    model = task.build_model(cfg)
    proc = BlipImageEvalProcessor(image_size=int(run.get("image_size", 224)))

    img_urls = _image_list(run)
    image_names = _image_names(run, img_urls)
    out_dir = run.get("output_dir", "output/clip_flux_text")
    os.makedirs(out_dir, exist_ok=True)
    seed = int(run.get("seed", 42))

    if run.get("prompt_json"):
        with open(run["prompt_json"]) as f:
            prompt_by_name = json.load(f)
        cases = [(i, prompt_by_name[image_names[i]], None)
                 for i in range(len(img_urls))]
    else:
        questions = list(run.get("questions", [""]))
        q_names = list(run.get("questions_names", [None] * len(questions)))
        cases = [(i, q, qn)
                 for i in range(len(img_urls))
                 for q, qn in zip(questions, q_names)]

    pipeline = ThinkDiffPipeline.from_pretrained(
        run.get("flux_model", "black-forest-labs/FLUX.1-dev"))
    max_seq = int(run.get("flux_max_sequence_length", 128))

    for img_i, prompt, q_name in cases:
        out_path = _output_path(
            run, out_dir, image_names[img_i], prompt, q_name, seed)
        if os.path.exists(out_path):
            print("exists, skipping:", out_path)
            continue

        urls = img_urls[img_i]
        urls = urls if isinstance(urls, (list, tuple)) else [urls]
        # image tokens first, T5 text embeds of the prompt last
        projections = []
        for u in urls:
            arr = proc(Image.open(u).convert("RGB"))[None]
            projections.append(model.forward_encoder(arr.astype(np.float32))[0])
        text_embeds = None
        if pipeline.t5_embedder is not None and prompt:
            text_embeds = pipeline.t5_embedder(prompt, max_len=max_seq)[0]
        cond = pipeline.compose_clip_condition(projections, text_embeds)

        images = pipeline.generate(
            cond[None] if cond.ndim == 2 else cond, prompt=prompt,
            height=int(run.get("flux_height", 1024)),
            width=int(run.get("flux_width", 1024)),
            num_steps=int(run.get("flux_num_inference_steps", 28)),
            guidance=float(run.get("guidance_scale", 3.5)), seed=seed,
        )
        save_images(images, [out_path])
        print("saved:", out_path)


if __name__ == "__main__":
    main()
