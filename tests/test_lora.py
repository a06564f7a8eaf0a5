"""LoRA adapter tests (models/lora.py) — the init_llm peft-path parity
(reference thinkdiff/models/base_model.py:171-207)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinkdiff_tpu.models.llama import LlamaForCausalLM, llama_config
from thinkdiff_tpu.models.lora import (
    init_lora, lora_param_count, merge_lora)


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = llama_config(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2)
    from thinkdiff_tpu.models.qwen2_vl import Qwen2VLModel

    model = Qwen2VLModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32),
        position_ids=jnp.zeros((3, 1, 4), jnp.int32))["params"]
    return cfg, params


def test_identity_at_init(tiny_llama):
    """b=0 at init => merged tree equals the base tree exactly (peft
    semantics: the LoRA model starts as the base model)."""
    cfg, params = tiny_llama
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 64, (2, 6)))
    base = LlamaForCausalLM(cfg, params)
    lora = LlamaForCausalLM(cfg, params, lora_r=4)
    np.testing.assert_allclose(
        np.asarray(base(ids)["logits"]), np.asarray(lora(ids)["logits"]),
        atol=0, rtol=0)


def test_adapter_tree_shape(tiny_llama):
    cfg, params = tiny_llama
    ad = init_lora(jax.random.PRNGKey(1), params, r=4)
    # default targets: q_proj + v_proj per layer
    assert len(ad) == 2 * cfg.num_layers
    for key, leaf in ad.items():
        assert key.endswith("/kernel"), key
        assert leaf["a"].shape[1] == 4 and leaf["b"].shape[0] == 4
        assert float(jnp.abs(leaf["b"]).max()) == 0.0
    assert lora_param_count(ad) == sum(
        l["a"].size + l["b"].size for l in ad.values())


def test_merge_changes_only_targets(tiny_llama):
    cfg, params = tiny_llama
    ad = init_lora(jax.random.PRNGKey(1), params, r=4)
    # plant nonzero b so deltas are visible
    ad = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.01, ad)
    merged = merge_lora(params, ad)
    flat_m = jax.tree_util.tree_flatten_with_path(merged)[0]
    flat_p = {tuple(getattr(p, "key", None) for p in path): leaf
              for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    n_changed = 0
    for path, leaf in flat_m:
        keys = tuple(getattr(p, "key", None) for p in path)
        same = bool(jnp.array_equal(leaf, flat_p[keys]))
        if keys[-1] == "kernel" and keys[-2] in ("q_proj", "v_proj"):
            assert not same, keys
            n_changed += 1
        else:
            assert same, keys
    assert n_changed == 2 * cfg.num_layers


def test_grads_flow_to_adapters_only(tiny_llama):
    """The trainable/frozen split this repo trains with (models/base.py:
    10-13): loss differentiates w.r.t. the adapter tree, base stays put."""
    cfg, params = tiny_llama
    lora = LlamaForCausalLM(cfg, params, lora_r=4)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(1, 64, (2, 6)))
    labels = jnp.asarray(rs.randint(1, 64, (2, 6)))

    def loss_fn(ad):
        return lora(ids, labels=labels, adapters=ad)["loss"]

    grads = jax.grad(loss_fn)(lora.adapters)
    # at init b == 0, so grad_a == 0 and grad_b != 0 (standard LoRA)
    gb = jnp.concatenate([grads[k]["b"].ravel() for k in grads])
    assert float(jnp.abs(gb).max()) > 0.0
    # one SGD step on adapters changes the loss
    ad2 = jax.tree_util.tree_map(lambda p, g: p - 0.5 * g,
                                 lora.adapters, grads)
    l0 = float(loss_fn(lora.adapters))
    l1 = float(loss_fn(ad2))
    assert l1 != l0
