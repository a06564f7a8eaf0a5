"""CoBSAT batch embed exporter (reference:
scripts/test/test_mllama_t5_decoder_flux_embed_multi_image_batch.py:143-268):
walk a folder of CoBSAT case-spec JSONs ({text_inputs, image_inputs}), run
the LVLM aligner per case, export aligned embeds (.npy, torch-loadable .pth)
plus generated text JSON, with skip-if-exists resume and image path remap.

FLUX sampling + CoBSAT scoring happen downstream (scoring is external to the
reference repo as well).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from scripts.common import bootstrap, parse_args  # noqa: E402


def main():
    args = parse_args("CoBSAT batch embed export")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    from PIL import Image

    model = task.build_model(cfg)

    spec_dir = run.get("cobsat_json_dir")
    out_dir = run.get("output_dir", "output/cobsat_embeds")
    prefix = run.get("image_path_prefix", "")
    batch_size = int(run.get("batch_size_eval", 4))
    os.makedirs(out_dir, exist_ok=True)

    specs = sorted(
        f for f in os.listdir(spec_dir) if f.endswith(".json")
    )
    pending = []
    for fname in specs:
        case = os.path.splitext(fname)[0]
        out_path = os.path.join(out_dir, f"{case}.npy")
        if os.path.exists(out_path):  # skip-if-exists resume
            continue
        with open(os.path.join(spec_dir, fname)) as f:
            spec = json.load(f)
        pending.append((case, spec, out_path))

    for i in range(0, len(pending), batch_size):
        chunk = pending[i: i + batch_size]
        images, texts = [], []
        for _, spec, _ in chunk:
            paths = [os.path.join(prefix, p) if prefix else p
                     for p in spec["image_inputs"]]
            images.append([Image.open(p) for p in paths])
            texts.append(" ".join(
                f"Word {j + 1}: {w}," for j, w in enumerate(spec["text_inputs"])
            ))
        samples = {"images": images, "answers": texts}
        conds, gen = model.get_embed(
            samples, embedding_type=run.get("embedding_type", "output_embed"),
            max_new_tokens=int(run.get("max_new_tokens", 128)),
        )
        for j, (case, _, out_path) in enumerate(chunk):
            np.save(out_path, np.asarray(conds[j], np.float32))
            with open(out_path.replace(".npy", ".json"), "w") as f:
                json.dump({"generated_text": gen.texts[j],
                           "output_token_ids": gen.output_token_ids[j]}, f)
        print(f"[{i + len(chunk)}/{len(pending)}] exported")


if __name__ == "__main__":
    main()
