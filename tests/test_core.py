import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinkdiff_tpu.core.config import Config, ConfigNode, parse_options
from thinkdiff_tpu.core.optim import (
    linear_warmup_cosine_schedule, make_optimizer, make_schedule_from_config,
)
from thinkdiff_tpu.core.registry import registry
from thinkdiff_tpu.parallel.mesh import make_mesh
from thinkdiff_tpu.parallel.sharding import shard_params, shard_spec_tree


def test_registry_roundtrip():
    @registry.register_model("_test_model_xyz")
    class M:
        pass

    assert registry.get_model_class("_test_model_xyz") is M
    registry.register("a.b.c", 42)
    assert registry.get("a.b.c") == 42
    assert registry.get("a.b.missing", "d") == "d"


def test_confignode_merge_and_dotted():
    node = ConfigNode({"run": {"lr": 1e-4, "nested": {"x": 1}}})
    node.merge({"run": {"nested": {"y": 2}, "lr": 5e-5}})
    assert node.run.lr == 5e-5
    assert node.run.nested.x == 1 and node.run.nested.y == 2
    node.set_dotted("run.nested.z", 3)
    assert node.run.nested.z == 3


def test_parse_options_both_forms():
    opts = parse_options(["run.seed=7", "model.dtype", "bfloat16", "run.amp=true"])
    assert opts["run.seed"] == 7
    assert opts["model.dtype"] == "bfloat16"
    assert opts["run.amp"] is True


def test_config_loads_reference_style_yaml(tmp_path):
    cfg_yaml = tmp_path / "c.yaml"
    cfg_yaml.write_text(
        """
model:
  arch: _not_registered_arch
  dtype: bfloat16
datasets:
  my_ds:
    batch_size: 4
run:
  task: image_text_pretrain
  init_lr: 1e-4
  seed: 42
"""
    )

    class Args:
        cfg_path = str(cfg_yaml)
        options = ["run.seed=7"]

    cfg = Config(Args())
    assert cfg.run_cfg.seed == 7
    assert cfg.model_cfg.dtype == "bfloat16"
    assert cfg.datasets_cfg.my_ds.batch_size == 4
    assert float(cfg.run_cfg.init_lr) == 1e-4


def test_model_default_yaml_merge(tmp_path):
    """Per-model default YAML (configs/models/*.yaml) merges UNDER the user
    config — model knobs AND the preprocess section — exactly like the
    reference (common/config.py:62-82). A user config omitting them gets
    reference-identical defaults; a user override wins."""
    import thinkdiff_tpu.models  # noqa: F401 — register model classes

    cfg_yaml = tmp_path / "c.yaml"
    cfg_yaml.write_text(
        """
model:
  arch: mllama-vllm-t5-embed-decoder-2
  model_type: pretrain_mllama_vllm_t5_embed_decoder_2
datasets: {}
run:
  task: image_text_pretrain
"""
    )
    cfg = Config(cfg_path=str(cfg_yaml))
    # model defaults from configs/models/mllama_vllm_t5_embed_decoder_2.yaml
    assert cfg.model_cfg.image_size == 224
    assert cfg.model_cfg.prompt == ""
    assert cfg.model_cfg.num_query_token == 32
    assert cfg.model_cfg.freeze_vit is True
    # the preprocess section survives into the merged config
    pp = cfg.preprocess_cfg
    assert pp.vis_processor.train.name == "blip2_image_train"
    assert pp.vis_processor.eval.name == "blip2_image_eval"
    assert pp.vis_processor.train.image_size == 224
    assert pp.text_processor.train.name == "blip_caption"

    # user overrides (model knob + preprocess subtree) win over defaults
    cfg_yaml2 = tmp_path / "c2.yaml"
    cfg_yaml2.write_text(
        """
model:
  arch: blip-vision-t5-decoder
  model_type: pretrain_blip_vision_t5_decoder
  image_size: 448
preprocess:
  vis_processor:
    train:
      image_size: 448
datasets: {}
run:
  task: image_text_pretrain
"""
    )
    cfg2 = Config(cfg_path=str(cfg_yaml2))
    assert cfg2.model_cfg.image_size == 448
    assert cfg2.preprocess_cfg.vis_processor.train.image_size == 448
    # sibling default keys not overridden remain
    assert cfg2.preprocess_cfg.vis_processor.train.name == "blip2_image_train"
    assert cfg2.preprocess_cfg.text_processor.eval.name == "blip_caption"


def test_model_default_yaml_matches_reference():
    """The committed defaults must agree with the reference's model YAMLs
    key-for-key (when the reference tree is mounted)."""
    import yaml as _yaml

    ref_dir = "/root/reference/thinkdiff/configs/models"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not mounted")
    import thinkdiff_tpu  # noqa: F401

    repo_root = registry.get_path("repo_root")
    for name in ("blip_vision_t5_decoder", "mllama_vllm_generate_1",
                 "mllama_vllm_t5_embed_decoder_2",
                 "mllama_vllm_t5_embed_decoder_5"):
        with open(os.path.join(ref_dir, name + ".yaml")) as f:
            ref = _yaml.safe_load(f)
        with open(os.path.join(
                repo_root, "configs", "models", name + ".yaml")) as f:
            ours = _yaml.safe_load(f)
        assert ours["model"] == ref["model"], name
        assert ours["preprocess"] == ref["preprocess"], name


def test_default_config_path_unknown_type():
    import thinkdiff_tpu.models  # noqa: F401
    from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder

    with pytest.raises(KeyError):
        MllamaT5EmbedDecoder.default_config_path("bogus_type")
    p = MllamaT5EmbedDecoder.default_config_path(
        "pretrain_mllama_vllm_t5_embed_decoder_2")
    assert os.path.exists(p)


def test_lr_schedule_values():
    sched = linear_warmup_cosine_schedule(
        init_lr=1e-4, min_lr=8e-5, warmup_lr=1e-6, warmup_steps=10, total_steps=100
    )
    assert np.isclose(float(sched(0)), 1e-6)
    assert np.isclose(float(sched(10)), 1e-4, rtol=1e-2)
    assert np.isclose(float(sched(100)), 8e-5, rtol=1e-3)
    # monotone decrease after warmup
    assert float(sched(50)) < float(sched(20))


def test_make_optimizer_updates_params():
    run_cfg = {"lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-2,
               "min_lr": 1e-3, "warmup_lr": 1e-6, "warmup_steps": 0,
               "max_epoch": 1, "iters_per_epoch": 10, "weight_decay": 0.01,
               "use_clip_grad_norm": True, "max_grad_norm": 1.0}
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx, _ = make_optimizer(run_cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert not np.allclose(np.asarray(new_params["dense"]["kernel"]), 1.0)


def test_accum_grad_iters_schedule_in_micro_units():
    """With accum_grad_iters=k, the LR applied at optimizer update n must be
    schedule(n*k) in micro-iteration units (the reference steps its LR every
    micro-iter, base_task.py:235), not schedule(n)."""
    k = 4
    run_cfg = {"lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-2,
               "min_lr": 0.0, "warmup_lr": 0.0, "warmup_steps": 8,
               "max_epoch": 1, "iters_per_epoch": 16, "weight_decay": 0.0,
               "accum_grad_iters": k}
    params = {"w": jnp.ones((4, 4))}
    tx, schedule = make_optimizer(run_cfg, params)
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    p = params
    snapshots = []
    # 2k micro-steps -> two real updates (at inner counts 0 and 1)
    for i in range(2 * k):
        updates, state = tx.update(grads, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, updates)
        if (i + 1) % k == 0:
            snapshots.append(float(p["w"][0, 0]))
    # adam with constant unit grads: update magnitude ~= applied lr; the
    # second update runs at inner count 1 -> schedule(1*k) in micro units
    applied_lr = abs(snapshots[1] - snapshots[0])
    micro_lr = float(schedule(1 * k))
    wrong_lr = float(schedule(1))  # what an unscaled inner schedule would use
    assert abs(applied_lr - micro_lr) / micro_lr < 0.10, (applied_lr, micro_lr)
    assert abs(applied_lr - wrong_lr) / wrong_lr > 1.0


def test_mesh_and_param_sharding():
    assert jax.device_count() == 8
    mesh = make_mesh(data=2, fsdp=2, model=2)
    params = {
        "layer": {
            "q_proj": {"kernel": jnp.ones((256, 256))},
            "o_proj": {"kernel": jnp.ones((256, 256))},
            "norm": {"scale": jnp.ones((256,))},
        }
    }
    specs = shard_spec_tree(params)
    assert specs["layer"]["q_proj"]["kernel"] == jax.sharding.PartitionSpec("fsdp", "model")
    assert specs["layer"]["o_proj"]["kernel"] == jax.sharding.PartitionSpec("model", "fsdp")
    sharded = shard_params(params, mesh)
    k = sharded["layer"]["q_proj"]["kernel"]
    assert k.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(k), 1.0)


def test_mesh_tiny_dims_fall_back_to_replication():
    mesh = make_mesh(data=2, fsdp=2, model=2)
    params = {"q_proj": {"kernel": jnp.ones((3, 5))}}  # indivisible
    sharded = shard_params(params, mesh)
    assert sharded["q_proj"]["kernel"].sharding.is_fully_replicated


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """The persistent-cache helper points jax at the configured dir and is
    idempotent; THINKDIFF_COMPILE_CACHE=0 opts out."""
    import thinkdiff_tpu.core.distributed as dist

    monkeypatch.setattr(dist, "_cache_enabled", False)
    monkeypatch.setenv("THINKDIFF_COMPILE_CACHE", str(tmp_path / "xla"))
    dist.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    assert (tmp_path / "xla").is_dir()
    # idempotent: a second call with a different env does not re-point
    monkeypatch.setenv("THINKDIFF_COMPILE_CACHE", str(tmp_path / "other"))
    dist.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    # opt-out honored on a fresh module state
    monkeypatch.setattr(dist, "_cache_enabled", False)
    monkeypatch.setenv("THINKDIFF_COMPILE_CACHE", "0")
    dist.enable_compilation_cache()
    assert not dist._cache_enabled
