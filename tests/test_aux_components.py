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


def test_rel_pos_index_matches_bruteforce():
    """Independent derivation: walk every patch pair and compute its table
    id from the 2D offset directly (not via the vectorized construction in
    models/vit.py) — plus the three special cls ids (reference
    eva_vit.py:92-106)."""
    from thinkdiff_tpu.models.vit import rel_pos_index

    gh, gw = 3, 4
    idx, n_dist = rel_pos_index(gh, gw)
    assert n_dist == (2 * gh - 1) * (2 * gw - 1) + 3
    n = gh * gw + 1
    assert idx.shape == (n, n)
    for i in range(gh * gw):
        yi, xi = divmod(i, gw)
        for j in range(gh * gw):
            yj, xj = divmod(j, gw)
            expect = ((yi - yj) + gh - 1) * (2 * gw - 1) + ((xi - xj) + gw - 1)
            assert idx[i + 1, j + 1] == expect, (i, j)
    assert (idx[0, 1:] == n_dist - 3).all()
    assert (idx[1:, 0] == n_dist - 2).all()
    assert idx[0, 0] == n_dist - 1
    # every id in range, diagonal constant (zero offset maps to one id)
    assert idx.max() == n_dist - 1 and idx.min() >= 0
    assert len(set(idx[i + 1, i + 1] for i in range(gh * gw))) == 1


def test_vit_rel_pos_bias_forward():
    """Bias changes the forward; shared vs per-block trees differ; bias-off
    path is unchanged vs a no-bias model with the same non-bias params."""
    import jax
    from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer

    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.randn(2, 28, 28, 3).astype(np.float32))

    cfg0 = ViTConfig.tiny()
    cfg_blk = ViTConfig.tiny(use_rel_pos_bias=True)
    cfg_sh = ViTConfig.tiny(use_shared_rel_pos_bias=True)
    m0, mb, ms = (VisionTransformer(c) for c in (cfg0, cfg_blk, cfg_sh))
    p0 = m0.init(jax.random.PRNGKey(0), px)["params"]
    pb = mb.init(jax.random.PRNGKey(0), px)["params"]
    psh = ms.init(jax.random.PRNGKey(0), px)["params"]

    assert "rel_pos_bias" in pb["block_0"] and "rel_pos_bias" in pb["block_1"]
    assert "rel_pos_bias" in psh and "rel_pos_bias" not in psh["block_0"]

    # zero-init tables => identical output to the plain model (same seed)
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p0}, px)),
        np.asarray(mb.apply({"params": pb}, px)), atol=2e-5, rtol=1e-5)

    # nonzero table must change the output
    tbl = psh["rel_pos_bias"]["relative_position_bias_table"]
    psh2 = dict(psh)
    psh2["rel_pos_bias"] = {
        "relative_position_bias_table": tbl + 0.3 * jnp.asarray(
            rs.randn(*tbl.shape).astype(np.float32))}
    a = np.asarray(ms.apply({"params": psh}, px))
    c = np.asarray(ms.apply({"params": psh2}, px))
    assert np.abs(a - c).max() > 1e-4


def test_url_and_file_utils(tmp_path):
    """The common/utils.py:41-273 tail: URL predicates, gdrive transforms,
    multi-format save/load, cache layout, symlinks — downloads themselves
    are egress-gated (THINKDIFF_OFFLINE)."""
    import os
    import pytest
    from thinkdiff_tpu.core import utils as U

    assert U.is_url("https://x.y/z.pth") and U.is_url("http://a/b")
    assert not U.is_url("/local/path.pth") and not U.is_url("gs://bucket/x")

    view = "https://drive.google.com/file/d/137RyRjvTBkBiIfeYB/view"
    dl = U.to_google_drive_download_url(view)
    assert dl == ("https://drive.google.com/uc?export=download"
                  "&id=137RyRjvTBkBiIfeYB")
    assert U.google_drive_file_id(view) == "137RyRjvTBkBiIfeYB"
    assert U.google_drive_file_id(dl) == "137RyRjvTBkBiIfeYB"
    assert U.google_drive_file_id("https://x.y/z") is None

    # save_file/load_file round-trips
    p = tmp_path / "a.npy"
    U.save_file(np.arange(5), str(p))
    assert (U.load_file(str(p)) == np.arange(5)).all()
    pj = tmp_path / "m.json"
    U.save_file({"k": 1}, str(pj))
    U.save_file({"k": 2}, str(pj))  # appends a line
    lines = open(pj).read().strip().splitlines()
    assert len(lines) == 2 and json.loads(lines[1]) == {"k": 2}
    py = tmp_path / "c.yaml"
    U.save_file({"a": [1, 2]}, str(py))
    assert U.load_file(str(py)) == {"a": [1, 2]}

    # md5 + presence short-circuit: existing valid file is not re-fetched
    blob = tmp_path / "root" / "w.bin"
    os.makedirs(blob.parent)
    blob.write_bytes(b"hello")
    import hashlib
    md5 = hashlib.md5(b"hello").hexdigest()
    got = U.download_url("https://no.such.host/w.bin", str(blob.parent),
                         md5=md5)
    assert got == str(blob)

    # offline gate raises instead of attempting egress
    os.environ["THINKDIFF_OFFLINE"] = "1"
    try:
        with pytest.raises(RuntimeError, match="zero-egress"):
            U.download_url("https://no.such.host/x.bin", str(tmp_path))
    finally:
        os.environ.pop("THINKDIFF_OFFLINE")

    # symlink + size + cleanup
    link = tmp_path / "latest.bin"
    U.create_file_symlink(str(blob), str(link))
    assert link.resolve() == blob
    U.create_file_symlink(str(pj), str(link))  # replaces
    assert link.resolve() == pj
    assert abs(U.get_file_size(str(blob)) - 5 / 1024 / 1024) < 1e-9
    d = tmp_path / "junk"
    os.makedirs(d / "sub")
    U.cleanup_dir(str(d))
    assert not d.exists()
