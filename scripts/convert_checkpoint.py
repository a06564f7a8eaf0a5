"""One-time converter: released reference ``.pth`` aligner checkpoints
(thinkdiff_clip.pth / thinkdiff_lvlm.pth — trainable-only torch state dicts,
reference runner_base.py:597-623) -> our msgpack trainable pytree.

Usage:
  python -m scripts.convert_checkpoint --arch mllama-vllm-t5-embed-decoder-2 \\
      --input thinkdiff_lvlm.pth --output checkpoints/thinkdiff_lvlm.msgpack
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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
    sd = load_torch_checkpoint(args.input)
    # Conversion is a pure name-map — no model instantiation needed.
    converted = model_cls.convert_reference_checkpoint(
        model_cls.__new__(model_cls), sd
    )
    save_msgpack_params(converted, args.output)
    print(f"converted {args.input} -> {args.output}")
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(converted):
        print(" ", jax.tree_util.keystr(path), getattr(leaf, "shape", None))


if __name__ == "__main__":
    main()
