"""The full reference workflow in miniature: wids-indexed image shards ->
embedding precompute (tiny Qwen2-VL engine) -> WebDataset embed shards ->
LVLM aligner training on those shards. Stages 1+2 of the ThinkDiff pipeline
wired end-to-end."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from tests.test_embed_engine import FakeTokenizer
from thinkdiff_tpu.core.config import Config, ConfigNode
from thinkdiff_tpu.data.tario import ShardWriter, tar_sample_iterator, write_wids_index
from thinkdiff_tpu.engines.embed_engine import EmbedEngine, MllamaVllmGenerateModel
from thinkdiff_tpu.models.qwen2_vl import Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower


def _tiny_engine(max_tokens=4):
    cfg = Qwen2VLConfig.tiny()
    rng = jax.random.PRNGKey(0)
    vision = Qwen2VisionTower(cfg.vision)
    lm = Qwen2VLModel(cfg)
    vp = vision.init(
        rng, jnp.zeros((4, cfg.vision.patch_dim)),
        jnp.zeros((4, cfg.vision.head_dim // 2)),
        jnp.zeros((4, cfg.vision.head_dim // 2)), None,
    )["params"]
    lp = lm.init(
        rng, input_ids=jnp.zeros((1, 4), jnp.int32),
        position_ids=jnp.zeros((3, 1, 4), jnp.int32),
    )["params"]
    return EmbedEngine(
        cfg, {"vision": vp, "lm": lp}, FakeTokenizer(),
        max_tokens=max_tokens, min_tokens=2, temperature=0.6, top_p=0.9,
        eos_ids=[242, 241], min_pixels=8 * 8, max_pixels=64 * 64,
    )


def _make_image_shards(tmp_path, n=8):
    from PIL import Image

    rs = np.random.RandomState(0)
    with ShardWriter(str(tmp_path / "img-%06d.tar"), maxcount=100) as w:
        for i in range(n):
            img = Image.fromarray((rs.rand(16, 16, 3) * 255).astype("uint8"))
            w.write({"__key__": f"img{i:06d}", "jpg": img,
                     "json": {"caption": f"caption {i}"}})
    index = str(tmp_path / "wids_index.json")
    write_wids_index([str(tmp_path / "img-000000.tar")], index, "test")
    return index


def test_precompute_to_training_roundtrip(tmp_path):
    import thinkdiff_tpu.data  # noqa: F401
    import thinkdiff_tpu.models  # noqa: F401
    import thinkdiff_tpu.runners  # noqa: F401
    import thinkdiff_tpu.tasks  # noqa: F401
    from thinkdiff_tpu.core.registry import registry
    from thinkdiff_tpu.tasks import setup_task

    index = _make_image_shards(tmp_path)

    # ---- stage 1: precompute ----
    cfg_dict = {
        "model": {"arch": "mllama-vllm-generate-1",
                  "vllm_config": {"embedding_layer_name": "model.norm"}},
        "datasets": {
            "cc_sbu_mllama_vllm_process_wids": {
                "batch_size": 4,
                "build_info": {"storage": index},
            },
        },
        "run": {
            "task": "image_text_process_data",
            "runner": "runner_process_data",
            "output_shard_path": [str(tmp_path / "embed"), "%06d.tar", 0],
            "seed": 0, "log_freq": 1,
        },
    }
    cfg_path = tmp_path / "pre.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))
    cfg = Config(cfg_path=str(cfg_path))
    task = setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = MllamaVllmGenerateModel(cfg.model_cfg, engine=_tiny_engine())
    runner_cls = registry.get_runner_class("runner_process_data")
    runner = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets)
    stats = runner.train()
    assert stats["num_samples"] == 8

    # shard contents have the reference field layout
    samples = list(tar_sample_iterator(
        str(tmp_path / "embed" / "000000.tar"), decode=True))
    assert len(samples) == 8
    s = samples[0]
    assert "model.norm.input_embed.pth" in s
    assert "model.norm.output_embed.pth" in s
    js = s["json"]
    assert "generated_text" in js and "output_token_ids" in js
    assert "output_text" in js  # reference field (image_text_process_data.py:100)
    emb = np.asarray(s["model.norm.output_embed.pth"])
    assert emb.shape == (len(js["output_token_ids"]), 64)
    assert np.asarray(s["model.norm.input_embed.pth"]).shape[0] == len(
        js["input_prompt_token_ids"])

    # ---- stage 2: train the aligner on those shards ----
    tiny_t5 = dict(vocab_size=300, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4, dropout_rate=0.0)
    train_cfg = {
        "model": {
            "arch": "mllama-vllm-t5-embed-decoder-2",
            "dtype": "float32", "load_pretrained": False,
            "vlm_hidden_size": 64, "t5_config": tiny_t5,
        },
        "datasets": {
            "llava_instruct_mllama_embed_2": {
                "batch_size": 8, "max_txt_len": 8,
                "build_info": {
                    "storage": str(tmp_path / "embed" / "{000000..000000}.tar"),
                    "use_input_embed": False, "use_output_embed": True,
                    "random_split_output_embed": True,
                    "output_embed_max_split_len": 3,
                },
            },
        },
        "run": {
            "task": "image_text_pretrain", "runner": "runner_clip_t5",
            "lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-2,
            "min_lr": 1e-3, "warmup_lr": 1e-6, "warmup_steps": 0,
            "weight_decay": 0.05, "max_epoch": 1, "iters_per_epoch": 3,
            "seed": 0, "output_dir": str(tmp_path / "out"),
        },
    }
    cfg_path2 = tmp_path / "train.yaml"
    cfg_path2.write_text(yaml.safe_dump(train_cfg))
    cfg2 = Config(cfg_path=str(cfg_path2))
    task2 = setup_task(cfg2)
    datasets2 = task2.build_datasets(cfg2)
    model2 = task2.build_model(cfg2)
    model2.t5_tokenizer = FakeTokenizer()
    model2.vlm_decode_fn = FakeTokenizer().decode
    runner2 = registry.get_runner_class("runner_clip_t5")(
        cfg=cfg2, task=task2, model=model2, datasets=datasets2, job_id="rt")
    stats2 = runner2.train()
    assert float(stats2["loss"]) > 0
