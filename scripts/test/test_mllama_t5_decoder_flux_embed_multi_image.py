"""CoBSAT batch embed exporter, multi-image variant (reference:
scripts/test/test_mllama_t5_decoder_flux_embed_multi_image.py:100-245).

Walks ``run.image_folder`` for CoBSAT case JSONs
(``{"text_inputs": [...], "image_inputs": [...]}``), builds the interleaved
"Word k: <attr>, " + image chat context with the ``run.prompt`` instruction,
runs the LVLM aligner, and exports per-case:

  - ``{name}.pth``  — aligned conditioning tokens (torch-loadable, so the
    external CoBSAT scorer consumes them unchanged)
  - ``{name}.json`` — the case JSON + generated_text + prompt

Existing outputs are skipped (resume semantics, reference :146-149)."""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def build_word_texts(text_inputs):
    """'Word k: <attr-minus-suffix>, ' items, blank-line separated after the
    first (reference :163-168 strips the last two chars of each attr)."""
    texts = []
    for i, t in enumerate(text_inputs):
        head = f"Word {i + 1}: " if i == 0 else f"\n\nWord {i + 1}: "
        texts.append(head + t[:-2] + ", ")
    return texts


def save_pth(path: str, arr: np.ndarray):
    import torch

    with open(path, "wb") as f:
        torch.save(torch.from_numpy(np.array(arr, np.float32, copy=True)), f)


def main():
    args = parse_args("CoBSAT multi-image embed export")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    model = task.build_model(cfg)

    folder = run.get("image_folder")
    case_jsons = sorted(
        os.path.join(folder, n) for n in os.listdir(folder)
        if n.endswith(".json")
    )
    out_dir = run.get("output_dir", "output/cobsat_embeds")
    os.makedirs(out_dir, exist_ok=True)
    instruction = run.get("prompt", "")
    embedding_type = cfg.model_cfg.get("embedding_type", "output_embed")
    prefix = run.get("image_path_prefix", "")

    for url in case_jsons:
        name = os.path.splitext(os.path.basename(url))[0]
        embed_path = os.path.join(out_dir, f"{name}.pth")
        if os.path.exists(embed_path):
            print("exists, skipping:", embed_path)
            continue
        with open(url) as f:
            case = json.load(f)
        image_paths = [os.path.join(prefix, p) if prefix else p
                       for p in case["image_inputs"]]
        word_texts = build_word_texts(case["text_inputs"])
        # instruction first, then word/image interleave, trailing last word
        # (reference messages layout :172-196)
        text = instruction + "".join(word_texts)
        images = [Image.open(p).convert("RGB") for p in image_paths]

        samples = {"images": [images], "answers": [text]}
        conds, gen = model.get_embed(
            samples, embedding_type=embedding_type,
            max_new_tokens=int(run.get("max_new_tokens", 128)),
        )
        save_pth(embed_path, np.asarray(conds[0], np.float32))
        case["generated_text"] = gen.texts[0]
        case["prompt"] = instruction
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(case, f, indent=4)
        print("saved:", embed_path)


if __name__ == "__main__":
    main()
