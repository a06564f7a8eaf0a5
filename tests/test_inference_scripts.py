"""Smoke tests for the inference CLI scripts added for reference parity:
flux_text (image+text composition), embed_multi_image (CoBSAT batch export),
multi_image_input_embed (text-only embed replay). Each drives the script's
main() with tiny models monkeypatched in (real weights need downloads)."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

TINY_T5 = dict(vocab_size=300, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_decoder_layers=2, num_heads=4, dropout_rate=0.0)
TINY_VIT = dict(hidden_size=16, intermediate_size=32, num_layers=2,
                num_heads=4, image_size=28, patch_size=14)


def _tiny_pipe(with_t5=True):
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
    if with_t5:
        rs = np.random.RandomState(0)

        def fake_t5(text, max_len=None):
            texts = [text] if isinstance(text, str) else list(text)
            n = min(len(texts[0].split()) + 1, max_len or 8)
            return rs.randn(len(texts), n,
                            cfg.joint_attention_dim).astype(np.float32)

        pipe.t5_embedder = fake_t5
    return pipe


def _write_images(tmp_path, names):
    from PIL import Image

    rs = np.random.RandomState(0)
    paths = []
    for n in names:
        p = str(tmp_path / f"{n}.jpg")
        Image.fromarray((rs.rand(28, 28, 3) * 255).astype("uint8")).save(p)
        paths.append(p)
    return paths


def _run_script(module_name, cfg_dict, tmp_path, monkeypatch):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))
    monkeypatch.setattr(
        sys, "argv", [module_name, "--cfg-path", str(cfg_path)])
    import importlib

    mod = importlib.import_module(module_name)
    mod.main()


def test_flux_text_script(tmp_path, monkeypatch):
    """Image+text composition: per-image prompts from prompt_json, multi-image
    list entries, [img...; text] concat order, skip-if-exists."""
    import thinkdiff_tpu.engines.pipeline as pipeline_mod
    import thinkdiff_tpu.models.base as mb

    paths = _write_images(tmp_path, ["imgA", "imgB"])
    prompts = {"imgA_imgB": "a thing on a table", "imgA": "solo"}
    pj = tmp_path / "prompts.json"
    pj.write_text(json.dumps(prompts))

    pipe = _tiny_pipe()
    monkeypatch.setattr(pipeline_mod.ThinkDiffPipeline, "from_pretrained",
                        classmethod(lambda cls, *a, **k: pipe))

    cfg = {
        "model": {
            "arch": "blip-vision-t5-decoder", "dtype": "float32",
            "load_pretrained": False, "mm_projector_type": "mlp2x_gelu_t5_norm",
            "t5_config": {**TINY_T5, "d_model": pipe.sampler.cfg.joint_attention_dim},
            "vision_config": TINY_VIT,
        },
        "datasets": {},
        "run": {
            "task": "image_text_pretrain", "seed": 0, "image_size": 28,
            "img_urls": [[paths[0], paths[1]]],  # multi-image entry
            "prompt_json": str(pj),
            "use_image_name_as_output_name": True,
            "output_dir": str(tmp_path / "out"),
            "flux_height": 64, "flux_width": 64,
            "flux_num_inference_steps": 2, "guidance_scale": 3.5,
            "flux_max_sequence_length": 16,
        },
    }
    _run_script("scripts.test.test_blip_vision_t5_decoder_flux_text",
                cfg, tmp_path, monkeypatch)
    out = tmp_path / "out" / "imgA_imgB.png"
    assert out.exists()
    mtime = out.stat().st_mtime
    # second run: skip-if-exists must leave the file untouched
    _run_script("scripts.test.test_blip_vision_t5_decoder_flux_text",
                cfg, tmp_path, monkeypatch)
    assert out.stat().st_mtime == mtime


def _engine_patch(monkeypatch):
    from tests.test_precompute_e2e import _tiny_engine
    from thinkdiff_tpu.engines import embed_engine as ee

    monkeypatch.setattr(ee.EmbedEngine, "from_config",
                        classmethod(lambda cls, cfg: _tiny_engine(max_tokens=6)))


def test_embed_multi_image_script(tmp_path, monkeypatch):
    """CoBSAT batch export: case JSONs -> .pth embeds + enriched .json."""
    import torch

    _engine_patch(monkeypatch)
    paths = _write_images(tmp_path, ["w1", "w2"])
    case_dir = tmp_path / "cases"
    case_dir.mkdir()
    (case_dir / "case0.json").write_text(json.dumps({
        "text_inputs": ["red##", "blue##", "green##"],
        "image_inputs": paths,
    }))

    cfg = {
        "model": {
            "arch": "mllama-vllm-t5-embed-decoder-5", "dtype": "float32",
            "load_pretrained": False, "vlm_hidden_size": 64,
            "t5_config": TINY_T5,
            "vllm_config": {"embedding_layer_name": "model.norm"},
        },
        "datasets": {},
        "run": {
            "task": "image_text_pretrain", "seed": 0,
            "image_folder": str(case_dir),
            "prompt": "Analyse then describe the next image.\n\n",
            "max_new_tokens": 6,
            "output_dir": str(tmp_path / "emb"),
        },
    }
    _run_script("scripts.test.test_mllama_t5_decoder_flux_embed_multi_image",
                cfg, tmp_path, monkeypatch)
    emb_path = tmp_path / "emb" / "case0.pth"
    assert emb_path.exists()
    t = torch.load(str(emb_path), weights_only=True)
    assert t.ndim == 2 and t.shape[1] == TINY_T5["d_model"]
    js = json.loads((tmp_path / "emb" / "case0.json").read_text())
    assert "generated_text" in js and js["prompt"].startswith("Analyse")


def test_text_only_script(tmp_path, monkeypatch):
    """Text-only CLI over the _5 text APIs: get_text (template and raw
    modes) and the composed generate -> T5 text chain."""
    _engine_patch(monkeypatch)

    base_cfg = {
        "model": {
            "arch": "mllama-vllm-t5-embed-decoder-5", "dtype": "float32",
            "load_pretrained": False, "vlm_hidden_size": 64,
            "t5_config": TINY_T5,
            "vllm_config": {"embedding_layer_name": "model.norm"},
        },
        "datasets": {},
        "run": {
            "task": "image_text_pretrain", "seed": 0,
            "prompts": ["tell me a story", "another one"],
            "max_new_tokens": 5, "t5_max_new_tokens": 3,
            "output_dir": str(tmp_path / "out"),
        },
    }
    cfg = {**base_cfg, "run": {**base_cfg["run"], "mode": "get_text"}}
    _run_script("scripts.test.test_mllama_t5_decoder_text",
                cfg, tmp_path, monkeypatch)
    res = json.loads((tmp_path / "out" / "get_text_results.json").read_text())
    assert len(res) == 2 and all("generated_text" in r for r in res)

    cfg = {**base_cfg, "run": {**base_cfg["run"], "mode": "generate",
                               "raw_prompts": True}}
    _run_script("scripts.test.test_mllama_t5_decoder_text",
                cfg, tmp_path, monkeypatch)
    res = json.loads((tmp_path / "out" / "generate_results.json").read_text())
    assert len(res) == 2
    assert all("t5_token_ids" in r and len(r["t5_token_ids"]) >= 1
               for r in res)


def test_multi_image_input_embed_script(tmp_path, monkeypatch):
    """Text-only embed replay: prompt -> aligned embeds -> pad to max_tokens
    -> FLUX sample."""
    import thinkdiff_tpu.engines.pipeline as pipeline_mod

    _engine_patch(monkeypatch)
    pipe = _tiny_pipe(with_t5=False)
    monkeypatch.setattr(pipeline_mod.ThinkDiffPipeline, "from_pretrained",
                        classmethod(lambda cls, *a, **k: pipe))

    cfg = {
        "model": {
            "arch": "mllama-vllm-t5-embed-decoder-5", "dtype": "float32",
            "load_pretrained": False, "vlm_hidden_size": 64,
            "t5_config": {**TINY_T5,
                          "d_model": pipe.sampler.cfg.joint_attention_dim},
            "vllm_config": {"embedding_layer_name": "model.norm"},
            "embedding_type": "output_embed",
        },
        "datasets": {},
        "run": {
            "task": "image_text_pretrain", "seed": 0,
            "prompts": ["a photo of a pink skateboard"],
            "image_names": ["skateboard"],
            "max_new_tokens": 6, "max_tokens": 12,
            "image_height": 64, "image_width": 64,
            "num_inference_steps": 2,
            "output_dir": str(tmp_path / "out"),
        },
    }
    _run_script(
        "scripts.test.test_mllama_t5_decoder_flux_multi_image_input_embed",
        cfg, tmp_path, monkeypatch)
    out = tmp_path / "out" / "skateboard_edit_4_flux_output_embed_0.png"
    assert out.exists()
