"""Single-image aligned-embed exporter (reference:
scripts/test/test_mllama_t5_decoder_flux_embed.py): run the LVLM aligner and
save the aligned conditioning tokens + generated text, without sampling FLUX
(export/replay workflow for CoBSAT-style eval farms)."""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def main():
    args = parse_args("LVLM aligned-embed export")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    model = task.build_model(cfg)
    image_path = run.get("image_path")
    text_input = run.get("text_input", "")
    out_dir = run.get("output_dir", "output/lvlm_embeds")
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(image_path))[0]
    out_path = os.path.join(out_dir, f"{name}.npy")
    if os.path.exists(out_path) and run.get("skip_if_exists", True):
        print("exists, skipping:", out_path)
        return

    samples = {"images": [Image.open(image_path)], "answers": [text_input]}
    conds, gen = model.get_embed(
        samples, embedding_type=run.get("embedding_type", "output_embed"),
        max_new_tokens=int(run.get("max_new_tokens", 128)),
    )
    np.save(out_path, np.asarray(conds[0], np.float32))
    with open(out_path.replace(".npy", ".json"), "w") as f:
        json.dump({"generated_text": gen.texts[0],
                   "output_token_ids": gen.output_token_ids[0],
                   "input_prompt": gen.input_prompts[0]}, f)
    print("saved:", out_path)


if __name__ == "__main__":
    main()
