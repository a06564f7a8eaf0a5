"""Parameter/activation sharding rules.

Instead of translating the reference's DDP (replicated params) and vLLM TP
(``tensor_parallel_size``), parallelism is declared as PartitionSpec rules
matched against parameter path names, then applied with NamedSharding under
``jax.jit`` — GSPMD inserts the collectives.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thinkdiff_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, MODEL_AXIS


# Each rule: (regex over 'a/b/c' param path, PartitionSpec). First match wins.
# Conventions (flax linen):
#   Dense kernel: (in, out); attention projections qkv -> shard out dim over
#   model axis; output projection -> shard in dim (row parallel). Embeddings
#   (vocab, dim) -> shard vocab. MLP wi -> column, wo -> row.
DEFAULT_RULES: Sequence[Tuple[str, P]] = (
    (r".*(q_proj|k_proj|v_proj|wi|wi_0|wi_1|wi_fused|kv_fused|fc1|up_proj|gate_proj|gate_up|to_q|to_k|to_v|qkv|ff1)/kernel$",
     P(FSDP_AXIS, MODEL_AXIS)),
    (r".*(o_proj|wo|fc2|down_proj|to_out|proj_out|ff2)/kernel$",
     P(MODEL_AXIS, FSDP_AXIS)),
    # any flax nn.Embed table (leaf 'embedding'): (vocab, dim) -> vocab over
    # model, dim over fsdp. Covers embed_tokens (Qwen2-VL tied table, 622 MB
    # bf16 at 2B — replicated before this matched), shared (T5), etc.
    (r".*/embedding$", P(MODEL_AXIS, FSDP_AXIS)),
    (r".*lm_head/kernel$", P(FSDP_AXIS, MODEL_AXIS)),
    (r".*kernel$", P(FSDP_AXIS, None)),
    (r".*", P()),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def _spec_for_name(name: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.match(pattern, name):
            return spec
    return P()


def spec_for_param(path, value, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES) -> P:
    name = _path_str(path)
    base, _, leaf = name.rpartition("/")
    if leaf in ("kernel_q", "kernel_scale", "input_scale"):
        # quantized-kernel triplet (ops/quant layout): kernel_q shares the
        # fp kernel's (in, out) spec; kernel_scale (out,) takes the out
        # axis; input_scale (in,) takes the in axis — so an int8 frozen
        # tower shards exactly like its bf16 twin instead of replicating
        kspec = list(_spec_for_name(base + "/kernel", rules)) + [None, None]
        if leaf == "kernel_q":
            axes = kspec[:2]
        elif leaf == "kernel_scale":
            axes = [kspec[1]]
        else:
            axes = [kspec[0]]
    else:
        axes = list(_spec_for_name(name, rules))
    # Drop axes that exceed the leaf's rank.
    if len(axes) > value.ndim:
        axes = axes[: value.ndim]
    return P(*axes)


def shard_spec_tree(params: Any, rules: Sequence[Tuple[str, P]] = DEFAULT_RULES,
                    mesh: Mesh | None = None) -> Any:
    """PartitionSpec pytree matching ``params``.

    Without ``mesh`` the specs are RAW rule output: an axis whose mesh size
    does not divide the dim (e.g. a tiny future ``nn.Embed`` caught by the
    broad ``.*/embedding$`` rule) is still present and will fail if applied
    directly. Pass ``mesh`` (or use :func:`sharding_tree`, the production
    path) to demote such axes to replication."""
    def spec(p, v):
        s = spec_for_param(p, v, rules)
        return _valid_spec(s, v.shape, mesh) if mesh is not None else s

    return jax.tree_util.tree_map_with_path(spec, params)


def _valid_spec(spec: P, shape, mesh: Mesh) -> P:
    """Clear mesh axes that don't evenly divide the corresponding dim."""
    out = []
    for i, axes in enumerate(spec):
        if axes is None:
            out.append(None)
            continue
        ax_tuple = axes if isinstance(axes, tuple) else (axes,)
        size = 1
        for a in ax_tuple:
            size *= mesh.shape[a]
        if i < len(shape) and shape[i] % size == 0 and size > 1:
            out.append(axes)
        else:
            out.append(None)
    return P(*out)


def sharding_tree(params: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    """NamedSharding pytree for ``params`` on ``mesh``, with indivisible axes
    demoted to replication so tiny test shapes still compile."""

    def to_sharding(path, v):
        spec = spec_for_param(path, v, rules)
        spec = _valid_spec(spec, v.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    """Place a param pytree onto the mesh with the rule-derived shardings."""
    shardings = sharding_tree(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def with_batch_constraint(x, mesh: Mesh):
    """Constrain activations' leading dim onto the data axis."""
    spec = P((DATA_AXIS, FSDP_AXIS), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
