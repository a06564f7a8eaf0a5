"""ThinkDiff-LVLM text-only inference: prompts with NO images through the
``_5`` aligner's text APIs (reference methods ``get_text`` and ``generate``,
thinkdiff/models/mllama_vllm_t5_embed_decoder_2.py:1121-1191 and :906-1015 —
the reference exposes them on the model; this CLI gives them a runnable
surface).

Modes (``run.mode``):
  get_text   VLM text generation only (engine decode, no T5).
  generate   composed chain: VLM generate -> hidden tap -> projector ->
             per-sample T5 greedy decode -> T5 text.

Prompts come from ``run.prompts`` (list) or ``run.prompt_json`` (JSON list).
With ``run.raw_prompts=True`` they are fed pre-formatted (need_process=False,
tokenized as-is, no chat-template wrap); otherwise they go through the
engine's chat template with zero vision parts.

Usage:
  python -m scripts.test.test_mllama_t5_decoder_text \\
      --cfg-path configs/test_thinkdiff_lvlm_ccsbu_image_text.yaml \\
      --options run.mode=get_text "run.prompts=['tell me a story']"
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from scripts.common import bootstrap, parse_args  # noqa: E402


def main():
    args = parse_args("ThinkDiff-LVLM text-only inference")
    cfg, task = bootstrap(args)
    run = cfg.run_cfg

    model = task.build_model(cfg)

    if run.get("prompt_json"):
        with open(run["prompt_json"]) as f:
            prompts = json.load(f)
    else:
        prompts = list(run.get("prompts", []))
    assert prompts, "set run.prompts or run.prompt_json"

    mode = run.get("mode", "get_text")
    max_new_tokens = int(run.get("max_new_tokens", 128))
    out_dir = run.get("output_dir", "output/lvlm_text")
    os.makedirs(out_dir, exist_ok=True)

    if bool(run.get("raw_prompts", False)):
        inputs = [{"prompt": p} for p in prompts]
        if mode == "get_text":
            texts = model.get_text(inputs, need_process=False,
                                   max_new_tokens=max_new_tokens)
            records = [{"prompt": p, "generated_text": t}
                       for p, t in zip(prompts, texts)]
        else:
            samples = model._vllm_inputs_to_samples(inputs)
            outs, t5_texts, vlm_texts = model.generate(
                samples,
                embedding_type=run.get("embedding_type", "both"),
                max_new_tokens=max_new_tokens,
                t5_max_new_tokens=int(run.get("t5_max_new_tokens", 32)))
            records = [
                {"prompt": p, "generated_text": v, "t5_text": t,
                 "t5_token_ids": o}
                for p, v, t, o in zip(prompts, vlm_texts, t5_texts, outs)]
    else:
        samples = {"answers": prompts, "images": [None] * len(prompts)}
        if mode == "get_text":
            texts = model.get_text(samples, need_process=True,
                                   max_new_tokens=max_new_tokens)
            records = [{"prompt": p, "generated_text": t}
                       for p, t in zip(prompts, texts)]
        else:
            outs, t5_texts, vlm_texts = model.generate(
                samples,
                embedding_type=run.get("embedding_type", "both"),
                max_new_tokens=max_new_tokens,
                t5_max_new_tokens=int(run.get("t5_max_new_tokens", 32)))
            records = [
                {"prompt": p, "generated_text": v, "t5_text": t,
                 "t5_token_ids": o}
                for p, v, t, o in zip(prompts, vlm_texts, t5_texts, outs)]

    out_path = os.path.join(out_dir, f"{mode}_results.json")
    with open(out_path, "w") as f:
        json.dump(records, f, indent=2)
    for r in records:
        print(f"prompt: {r['prompt']!r}\n  -> {r['generated_text']!r}")
        if "t5_text" in r:
            print(f"  t5 -> {r['t5_text']!r}")
    print("saved:", out_path)


if __name__ == "__main__":
    main()
