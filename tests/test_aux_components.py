"""Auxiliary component tests: llama wrapper, EVA geometry, ChainDataset,
save_result merge, DatasetZoo, pipeline composition helpers."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.data.builders import DatasetZoo, load_dataset
from thinkdiff_tpu.data.pipeline import ChainDataset
from thinkdiff_tpu.models.llama import LlamaForCausalLM, llama_config
from thinkdiff_tpu.models.qwen2_vl import Qwen2VLModel
from thinkdiff_tpu.models.vit import ViTConfig
from thinkdiff_tpu.tasks.base_task import save_result


def test_llama_wrapper_loss_reductions():
    cfg = llama_config(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2)
    model = Qwen2VLModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32),
        position_ids=jnp.zeros((3, 1, 4), jnp.int32),
    )["params"]
    lm = LlamaForCausalLM(cfg, params)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(1, 64, (3, 6)))
    labels = ids.at[2, 3:].set(-100)
    out_mean = lm(ids, labels=labels, reduction="mean")
    out_none = lm(ids, labels=labels, reduction="none")
    assert out_mean["loss"].shape == ()
    assert out_none["loss"].shape == (3,)
    assert np.isfinite(float(out_mean["loss"]))


def test_eva_vit_geometry():
    cfg = ViTConfig.eva_vit_g()
    assert cfg.hidden_size == 1408 and cfg.num_layers == 39
    assert cfg.num_positions == 257


def test_chain_dataset_ratio_mixing():
    a = [("a", i) for i in range(50)]
    b = [("b", i) for i in range(50)]
    chain = ChainDataset([a, b], ratios=[9, 1], seed=0)
    out = [x for x in chain]
    assert len(out) == 100  # drains both
    first_30 = [s for s, _ in out[:30]]
    assert first_30.count("a") > first_30.count("b")


def test_save_result_merge(tmp_path):
    result = [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}, {"id": 1, "v": "x2"}]
    path = save_result(result, str(tmp_path), "res", remove_duplicate="id")
    merged = json.load(open(path))
    assert len(merged) == 2  # dedup on id


def test_dataset_zoo_lists_builders():
    zoo = DatasetZoo()
    names = zoo.get_names()
    assert "cc_sbu" in names
    assert "llava_instruct_mllama_embed_2" in names
    assert "cc_sbu_mllama_vllm_process_wids" in names


def test_pipeline_compose_and_encode_prompt():
    from thinkdiff_tpu.engines.flux_sampler import FluxSampler
    from thinkdiff_tpu.engines.pipeline import ThinkDiffPipeline
    from thinkdiff_tpu.models.flux import FluxConfig, FluxTransformer

    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, cfg.in_channels)),
        jnp.zeros((1, 2, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)), jnp.ones((1,)),
        jnp.zeros((4, 3)), jnp.zeros((2, 3)), jnp.ones((1,)),
    )["params"]
    pipe = ThinkDiffPipeline(FluxSampler(cfg, params))
    img1 = np.random.randn(3, cfg.joint_attention_dim).astype(np.float32)
    img2 = np.random.randn(2, cfg.joint_attention_dim).astype(np.float32)
    txt = np.random.randn(4, cfg.joint_attention_dim).astype(np.float32)
    cond = pipe.compose_clip_condition([img1, img2], txt, max_len=8)
    assert cond.shape == (8, cfg.joint_attention_dim)
    np.testing.assert_allclose(np.asarray(cond[:3]), img1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cond[3:5]), img2, atol=1e-6)

    embeds, pooled = pipe.encode_prompt("", cond)
    assert embeds.shape == (1, 8, cfg.joint_attention_dim)
    assert pooled.shape == (1, cfg.pooled_projection_dim)  # zero fallback


def test_wandb_optional_dependency(tmp_path):
    """wandb_log: True must degrade to a warning when wandb is absent
    (reference train.py:92-97 hard-requires it; we must not)."""
    import yaml as _yaml

    from thinkdiff_tpu.core.config import Config
    from thinkdiff_tpu.core.logging import init_wandb, wandb_log

    cfg_path = tmp_path / "w.yaml"
    cfg_path.write_text(_yaml.safe_dump({
        "model": {"arch": "x"}, "datasets": {},
        "run": {"task": "t", "wandb_log": True},
    }))
    cfg = Config(cfg_path=str(cfg_path))
    try:
        import wandb  # noqa: F401
        has_wandb = True
    except ImportError:
        has_wandb = False
    if not has_wandb:
        assert init_wandb(cfg, "job") is None
    wandb_log({"loss": 1.0})  # no-op without an active run, must not raise
