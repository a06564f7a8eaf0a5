"""CLI smoke tests: drive the actual entry points as subprocesses with tiny
configs (the BASELINE 'CPU-runnable' slice) — validates argument parsing,
registry imports, and the full wiring outside pytest's process."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

TINY_T5 = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_decoder_layers=2, num_heads=4, dropout_rate=0.0)
TINY_VIT = dict(hidden_size=16, intermediate_size=32, num_layers=2,
                num_heads=4, image_size=28, patch_size=14)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO
    return env


def _make_caption_shards(tmp_path, n=16):
    from PIL import Image

    from thinkdiff_tpu.data.tario import ShardWriter

    with ShardWriter(str(tmp_path / "%06d.tar"), maxcount=100) as w:
        rs = np.random.RandomState(0)
        for i in range(n):
            img = Image.fromarray((rs.rand(28, 28, 3) * 255).astype("uint8"))
            w.write({"__key__": f"{i:08d}", "jpg": img,
                     "json": {"caption": f"a tiny test image number {i}"}})
    return str(tmp_path / "{000000..000000}.tar")


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    storage = _make_caption_shards(tmp_path)
    cfg = {
        "model": {
            "arch": "blip-vision-t5-decoder", "dtype": "float32",
            "load_pretrained": False, "mm_projector_type": "mlp2x_gelu",
            "t5_config": TINY_T5, "vision_config": TINY_VIT,
        },
        "datasets": {
            "cc_sbu": {"batch_size": 8, "max_txt_len": 8,
                       "use_native_decode": False,
                       "vis_processor": {"train": {
                           "name": "blip2_image_train", "image_size": 28}},
                       "build_info": {"storage": storage}},
        },
        "run": {
            "task": "image_text_pretrain", "runner": "runner_clip_t5",
            "lr_sched": "linear_warmup_cosine_lr", "init_lr": 1e-2,
            "min_lr": 1e-3, "warmup_lr": 1e-6, "warmup_steps": 0,
            "weight_decay": 0.05, "max_epoch": 1, "iters_per_epoch": 2,
            "seed": 0, "output_dir": str(tmp_path / "out"),
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # The CLI needs a tokenizer; the cc_sbu bundle asserts injection. Use a
    # sitecustomize-style shim that installs a dummy tokenizer.
    shim = tmp_path / "shim.py"
    shim.write_text(
        "import sys\n"
        "sys.argv = ['train', '--cfg-path', %r, '--job-id', 'cli']\n"
        "import train as train_mod\n"
        "import thinkdiff_tpu.models.base as mb\n"
        "class Tok:\n"
        "    pad_token_id = 0\n"
        "    def encode(self, t, add_special_tokens=True):\n"
        "        return [min(len(w) + 1, 99) for w in t.split()][:8] or [1]\n"
        "mb.BaseModel.get_t5_tokenizer = lambda self: Tok()\n"
        "train_mod.main()\n" % str(cfg_path)
    )
    proc = subprocess.run(
        [sys.executable, str(shim)], env=_env(), cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = tmp_path / "out" / "cli" / "log.txt"
    assert log.exists()
    lines = [json.loads(line) for line in open(log)]
    assert any("train_loss" in e for e in lines)
    # checkpoint written
    ckpts = [f for f in os.listdir(tmp_path / "out" / "cli")
             if f.startswith("checkpoint_")]
    assert ckpts
