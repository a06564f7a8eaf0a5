"""LoRA adapters over frozen param trees (TPU-functional PEFT).

Reference parity: ``BaseModel.init_llm`` wraps its Llama in peft's
``get_peft_model(LoraConfig(r=lora_r, target_modules=["q_proj","v_proj"]))``
(reference thinkdiff/models/base_model.py:171-207; vestigial in the active
configs, kept for API completeness). The torch version mutates modules;
here adapters are a SEPARATE pytree merged functionally inside jit:

    adapters = init_lora(rng, params, r=8)           # pure array pytree
    merged   = merge_lora(params, adapters, scale=1.0)  # W + scale * A @ B
    logits   = model.apply({"params": merged}, ...)

The adapter tree contains ONLY arrays ({path: {"a", "b"}}) so it can be
handed straight to jax.grad / optax; the (alpha / r) scale is static
Python state carried by the caller (LlamaForCausalLM stores it), matching
how jit wants hyperparameters — baked into the trace, not traced.

which fits this repo's trainable/frozen split (models/base.py:10-13):
``adapters`` is the trainable subtree (tiny, f32 master), ``params`` stays
frozen (sharded / quantized), and XLA fuses the rank-r update into the
surrounding matmuls — no module surgery, no Python control flow in the hot
path. ``merge_lora`` is a no-op passthrough for non-target leaves, so the
merged tree has exactly the base tree's structure.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "v_proj")  # peft LoraConfig default in the ref


def _target_kernels(params: Any, targets: Sequence[str]):
    """Yield (path_tuple, leaf) for every ``<target>/kernel`` 2D leaf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", None) for p in path]
        if (len(keys) >= 2 and keys[-1] == "kernel"
                and keys[-2] in targets and getattr(leaf, "ndim", 0) == 2):
            yield tuple(keys), leaf


def init_lora(rng: jax.Array, params: Any, r: int,
              targets: Sequence[str] = DEFAULT_TARGETS,
              alpha: float | None = None,
              dtype: Any = jnp.float32) -> Dict[str, Any]:
    """Build the adapter tree: for each target kernel (in, out), an
    ``a`` (in, r) kaiming-uniform and ``b`` (r, out) zeros — so the merged
    model is EXACTLY the base model at init (peft semantics).

    Returns {"<joined/path>": {"a": ..., "b": ...}} — an all-array pytree
    the optimizer can own directly (no scalar metadata leaves).
    """
    layers = {}
    kernels = list(_target_kernels(params, targets))
    if not kernels:
        raise ValueError(f"no LoRA targets {tuple(targets)} in param tree")
    keys = jax.random.split(rng, len(kernels))
    for key, (path, leaf) in zip(keys, kernels):
        d_in, d_out = leaf.shape
        bound = 1.0 / (d_in ** 0.5)  # kaiming-uniform(a=sqrt(5)) on (in, r)
        layers["/".join(path)] = {
            "a": jax.random.uniform(key, (d_in, r), dtype, -bound, bound),
            "b": jnp.zeros((r, d_out), dtype),
        }
    return layers


def lora_scale(r: int, alpha: float | None = None) -> float:
    """peft's effective multiplier: alpha / r (alpha defaults to r)."""
    return float(alpha if alpha is not None else r) / float(r)


def merge_lora(params: Any, adapters: Dict[str, Any],
               scale: float = 1.0) -> Any:
    """Return ``params`` with every adapted kernel replaced by
    ``W + scale * a @ b`` (computed in f32, cast back to W's dtype).
    Pure function of both trees — safe and cheap inside jit (the rank-r
    outer product fuses; at r=8 it is ~0.2% of the kernel's own FLOPs)."""
    layers = adapters

    def rebuild(tree, prefix: Tuple[str, ...]):
        if not isinstance(tree, dict):
            key = "/".join(prefix)
            ad = layers.get(key)
            if ad is None:
                return tree
            delta = (ad["a"].astype(jnp.float32)
                     @ ad["b"].astype(jnp.float32)) * scale
            return (tree.astype(jnp.float32) + delta).astype(tree.dtype)
        return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}

    return rebuild(params, ())


def lora_param_count(adapters: Dict[str, Any]) -> int:
    return sum(l.size for l in jax.tree_util.tree_leaves(adapters))
