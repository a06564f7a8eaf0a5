"""CoBSAT accuracy scorer — one command from exported PNGs to the accuracy
table (BASELINE.md north-star metric: the reference reports 46.3% best
accuracy, README.md:27; its image exporter is
scripts/test/test_mllama_t5_decoder_flux_embed_multi_image_batch.py:164-176
and the repo's same-named script).

Protocol (CoBSAT, arXiv:2402.01293): each generated image must depict BOTH
  - the LATENT variable the model had to infer from the demonstration
    images (e.g. the object "car" across "red car", "green car", ...), and
  - the EXPLICIT attribute named by the final text input (e.g. "yellow").
A CLIP classifier scores the image against prompt-templated candidate
labels for each variable independently; the case is correct iff both
argmaxes equal the ground truth. Reported: overall accuracy, per-variable
accuracies, and a per-task breakdown.

Inputs:
  --images-dir   generated case PNGs, named {case}.png (or {case}_seed*.png)
  --labels-json  {case: {"latent": str, "explicit": str,
                         "latent_candidates": [...],
                         "explicit_candidates": [...],
                         "task": str (optional)}}
  --clip         HF path for CLIP weights (local cache; default
                 openai/clip-vit-large-patch14)
  --template     classification prompt, default "a photo of {}"

Testable without real weights: scripts import ``score_cases(scorer, ...)``
with any object exposing ``classify(images, texts) -> (B, N)``.
"""

import argparse
import glob
import json
import os
import sys
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def find_case_image(images_dir: str, case: str):
    for pat in (f"{case}.png", f"{case}_seed*.png", f"{case}*.png"):
        hits = sorted(glob.glob(os.path.join(images_dir, pat)))
        if hits:
            return hits[0]
    return None


def score_cases(scorer, images_dir: str, labels: Dict[str, Dict],
                template: str = "a photo of {}") -> Dict:
    """Returns {"overall": float, "latent_acc": ..., "explicit_acc": ...,
    "per_task": {task: acc}, "n": int, "missing": [...], "cases": {...}}."""
    from PIL import Image

    per_case = {}
    missing = []
    for case, lab in sorted(labels.items()):
        path = find_case_image(images_dir, case)
        if path is None:
            missing.append(case)
            continue
        img = Image.open(path)
        lat_cands = list(lab["latent_candidates"])
        exp_cands = list(lab["explicit_candidates"])
        sims = scorer.classify(
            [img], [template.format(c) for c in lat_cands + exp_cands])[0]
        pred_lat = lat_cands[int(np.argmax(sims[: len(lat_cands)]))]
        pred_exp = exp_cands[int(np.argmax(sims[len(lat_cands):]))]
        per_case[case] = {
            "pred_latent": pred_lat, "pred_explicit": pred_exp,
            "latent_ok": pred_lat == lab["latent"],
            "explicit_ok": pred_exp == lab["explicit"],
            "task": lab.get("task", "default"),
        }
        per_case[case]["correct"] = (per_case[case]["latent_ok"]
                                     and per_case[case]["explicit_ok"])

    n = len(per_case)
    if n == 0:
        return {"overall": 0.0, "latent_acc": 0.0, "explicit_acc": 0.0,
                "per_task": {}, "n": 0, "missing": missing, "cases": {}}
    tasks: Dict[str, List[bool]] = {}
    for c in per_case.values():
        tasks.setdefault(c["task"], []).append(c["correct"])
    return {
        "overall": sum(c["correct"] for c in per_case.values()) / n,
        "latent_acc": sum(c["latent_ok"] for c in per_case.values()) / n,
        "explicit_acc": sum(c["explicit_ok"] for c in per_case.values()) / n,
        "per_task": {t: sum(v) / len(v) for t, v in sorted(tasks.items())},
        "n": n, "missing": missing, "cases": per_case,
    }


def main():
    ap = argparse.ArgumentParser(description="CoBSAT accuracy scorer")
    ap.add_argument("--images-dir", required=True)
    ap.add_argument("--labels-json", required=True)
    ap.add_argument("--clip", default="openai/clip-vit-large-patch14")
    ap.add_argument("--template", default="a photo of {}")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    with open(args.labels_json) as f:
        labels = json.load(f)

    from thinkdiff_tpu.models.clip_scorer import CLIPScorer

    scorer = CLIPScorer.from_pretrained(args.clip)
    result = score_cases(scorer, args.images_dir, labels,
                         template=args.template)

    print(f"cases scored: {result['n']}   missing: {len(result['missing'])}")
    print(f"overall accuracy (both correct): {result['overall']:.3f}")
    print(f"  latent-variable accuracy:      {result['latent_acc']:.3f}")
    print(f"  explicit-attribute accuracy:   {result['explicit_acc']:.3f}")
    for task, acc in result["per_task"].items():
        print(f"  task {task:<16} {acc:.3f}")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
        print("saved:", args.out_json)


if __name__ == "__main__":
    main()
