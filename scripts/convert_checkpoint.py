"""Checkpoint interchange with the reference stack, both directions.

``.pth`` -> msgpack: released reference aligner checkpoints
(thinkdiff_clip.pth / thinkdiff_lvlm.pth — trainable-only torch state
dicts, reference runner_base.py:597-623) -> our msgpack trainable pytree.

msgpack -> ``.pth``: an aligner trained HERE -> a torch checkpoint the
reference's PyTorch inference scripts load unchanged (same
``{"model": state_dict, "epoch": ...}`` wrapper and requires_grad-only
``mm_projector.*`` key layout; reference base_model.py:40-67 loads it
with strict=False).

Direction is inferred from the file extensions.

Usage:
  python -m scripts.convert_checkpoint --arch mllama-vllm-t5-embed-decoder-2 \\
      --input thinkdiff_lvlm.pth --output checkpoints/thinkdiff_lvlm.msgpack
  python -m scripts.convert_checkpoint --arch mllama-vllm-t5-embed-decoder-2 \\
      --input checkpoints/thinkdiff_lvlm.msgpack --output thinkdiff_lvlm.pth
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TORCH_EXTS = (".pth", ".pt", ".bin")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import thinkdiff_tpu.models  # noqa: F401
    from thinkdiff_tpu.core.registry import registry
    from thinkdiff_tpu.models.base import load_torch_checkpoint, save_msgpack_params

    model_cls = registry.get_model_class(args.arch)
    if model_cls is None:
        raise KeyError(f"Unknown arch '{args.arch}'")
    # Conversion is a pure name-map — no model instantiation needed.
    model = model_cls.__new__(model_cls)

    if args.input.endswith(TORCH_EXTS):
        sd = load_torch_checkpoint(args.input)
        converted = model_cls.convert_reference_checkpoint(model, sd)
        save_msgpack_params(converted, args.output)
    elif args.output.endswith(TORCH_EXTS):
        import torch
        from flax import serialization

        with open(args.input, "rb") as f:
            params = serialization.msgpack_restore(f.read())
        sd = model_cls.export_reference_checkpoint(model, params)

        def to_torch(v):
            import ml_dtypes
            import numpy as np

            v = np.asarray(v)
            if v.dtype == ml_dtypes.bfloat16:  # numpy-side bf16: bit-cast
                return torch.from_numpy(
                    v.view(np.uint16).copy()).view(torch.bfloat16)
            return torch.as_tensor(v)

        torch.save(
            {"model": {k: to_torch(v) for k, v in sd.items()}, "epoch": 0},
            args.output,
        )
        converted = sd
    else:
        raise ValueError(
            "one side must be a torch checkpoint (.pth/.pt/.bin): "
            f"{args.input} -> {args.output}")
    print(f"converted {args.input} -> {args.output}")
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(converted):
        print(" ", jax.tree_util.keystr(path), getattr(leaf, "shape", None))


if __name__ == "__main__":
    main()
