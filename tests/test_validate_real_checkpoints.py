"""The real-checkpoint validation harness must work the moment released
weights are mountable. Exercise it end-to-end on tiny HF checkpoints saved
to disk (same geometry-from-config.json code path the real weights hit)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = Path(__file__).resolve().parents[1]


def test_noop_without_paths():
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.validate_real_checkpoints"],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0
    assert "nothing to validate" in proc.stdout


def test_t5_section_on_saved_tiny_checkpoint(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        tie_word_embeddings=False, decoder_start_token_id=0)
    transformers.T5ForConditionalGeneration(cfg).eval().save_pretrained(
        tmp_path / "t5")
    report = tmp_path / "report.json"
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.validate_real_checkpoints",
         "--t5", str(tmp_path / "t5"), "--report", str(report)],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "t5.logits" in proc.stdout and "ALL OK" in proc.stdout
    assert report.exists()


def test_qwen2_vl_section_on_saved_tiny_checkpoint(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=1000000.0,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=4,
            in_channels=3, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2),
        tie_word_embeddings=False, image_token_id=250, video_token_id=251,
        vision_start_token_id=249, vision_end_token_id=248)
    transformers.Qwen2VLForConditionalGeneration(cfg).eval().save_pretrained(
        tmp_path / "qwen")
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.validate_real_checkpoints",
         "--qwen2-vl", str(tmp_path / "qwen")],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "qwen2_vl.hidden_tap" in proc.stdout and "ALL OK" in proc.stdout


def test_blip2_section_on_saved_tiny_checkpoint(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)
    transformers.Blip2VisionModel(cfg).eval().save_pretrained(
        tmp_path / "blip2")
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.validate_real_checkpoints",
         "--blip2", str(tmp_path / "blip2")],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "blip2.vision" in proc.stdout and "ALL OK" in proc.stdout


def test_aligner_section_on_synthetic_pth(tmp_path):
    """A released-format trainable-only .pth (reference runner_base.py:
    597-623 saves {'model': trainable_state_dict}) converts and reports."""
    sd = {
        "mm_projector.0.weight": torch.randn(32, 16),
        "mm_projector.0.bias": torch.randn(32),
        "mm_projector.2.weight": torch.randn(32, 32),
        "mm_projector.2.bias": torch.randn(32),
        "t5_norm.weight": torch.ones(32),
    }
    torch.save({"model": sd}, tmp_path / "thinkdiff_lvlm.pth")
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.validate_real_checkpoints",
         "--aligner-lvlm", str(tmp_path / "thinkdiff_lvlm.pth")],
        cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "trainable leaves" in proc.stdout
