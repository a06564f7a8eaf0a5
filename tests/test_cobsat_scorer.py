"""CoBSAT scoring harness: CLIP dual-encoder scorer mechanics on tiny
random weights + the accuracy protocol math with a deterministic fake
scorer (weight-day runs the same code with real CLIP weights)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from PIL import Image

from scripts.score_cobsat import find_case_image, score_cases
from thinkdiff_tpu.models.clip_scorer import (
    CLIPScorer, preprocess_clip_image,
)
from thinkdiff_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer


class FakeClipTokenizer:
    def encode(self, text):
        return [1] + [(hash(w) % 90) + 2 for w in text.split()] + [99]


@pytest.fixture(scope="module")
def tiny_scorer():
    vit_cfg = ViTConfig.tiny()
    text_cfg = CLIPTextConfig.tiny()
    rng = jax.random.PRNGKey(0)
    vparams = VisionTransformer(vit_cfg).init(
        rng, jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3))
    )["params"]
    tparams = CLIPTextEncoder(text_cfg).init(
        rng, jnp.zeros((1, 4), jnp.int32))["params"]
    rs = np.random.RandomState(0)
    params = {
        "vision": vparams, "text": tparams,
        "visual_projection": rs.randn(vit_cfg.hidden_size, 8).astype(
            np.float32),
        "text_projection": rs.randn(text_cfg.hidden_size, 8).astype(
            np.float32),
    }
    return CLIPScorer(vit_cfg, text_cfg, params,
                      tokenizer=FakeClipTokenizer())


def _img(seed, size=32):
    rs = np.random.RandomState(seed)
    return Image.fromarray((rs.rand(size, size, 3) * 255).astype("uint8"))


def test_preprocess_shapes_and_normalization():
    arr = preprocess_clip_image(_img(0, 50), image_size=28)
    assert arr.shape == (28, 28, 3)
    # CLIP-normalized values are roughly centered
    assert abs(float(arr.mean())) < 3.0


def test_scorer_encoders(tiny_scorer):
    emb_i = tiny_scorer.encode_images([_img(1), _img(2)])
    assert emb_i.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(emb_i, axis=-1), 1.0,
                               rtol=1e-5)
    emb_t = tiny_scorer.encode_texts(["a photo of a car",
                                      "a photo of a dog", "bird"])
    assert emb_t.shape == (3, 8)
    np.testing.assert_allclose(np.linalg.norm(emb_t, axis=-1), 1.0,
                               rtol=1e-5)
    sims = tiny_scorer.classify([_img(1)], ["a", "b"])
    assert sims.shape == (1, 2)
    assert (np.abs(sims) <= 1.0 + 1e-5).all()


class RiggedScorer:
    """classify() peaks at a chosen candidate per image filename."""

    def __init__(self, answers):
        self.answers = answers  # list of (latent_label, explicit_label)
        self.calls = 0

    def classify(self, images, texts):
        lat, exp = self.answers[self.calls]
        self.calls += 1
        sims = np.zeros((1, len(texts)))
        for i, t in enumerate(texts):
            if t == f"a photo of {lat}" or t == f"a photo of {exp}":
                sims[0, i] = 1.0
        return sims


def test_score_cases_protocol(tmp_path):
    """Both-correct criterion, per-variable accs, per-task breakdown,
    missing-image accounting."""
    for name in ("case0", "case1", "case2"):
        _img(3).save(str(tmp_path / f"{name}.png"))
    labels = {
        "case0": {"latent": "car", "explicit": "red", "task": "color-I",
                  "latent_candidates": ["car", "dog"],
                  "explicit_candidates": ["red", "blue"]},
        "case1": {"latent": "dog", "explicit": "blue", "task": "color-I",
                  "latent_candidates": ["car", "dog"],
                  "explicit_candidates": ["red", "blue"]},
        "case2": {"latent": "hat", "explicit": "wool", "task": "texture-I",
                  "latent_candidates": ["hat", "cup"],
                  "explicit_candidates": ["wool", "metal"]},
        "case_missing": {"latent": "x", "explicit": "y", "task": "t",
                         "latent_candidates": ["x"],
                         "explicit_candidates": ["y"]},
    }
    # case0 fully right; case1 latent wrong; case2 explicit wrong
    scorer = RiggedScorer([("car", "red"), ("car", "blue"),
                           ("hat", "metal")])
    res = score_cases(scorer, str(tmp_path), labels)
    assert res["n"] == 3 and res["missing"] == ["case_missing"]
    assert res["overall"] == pytest.approx(1 / 3)
    assert res["latent_acc"] == pytest.approx(2 / 3)
    assert res["explicit_acc"] == pytest.approx(2 / 3)
    assert res["per_task"] == {"color-I": 0.5, "texture-I": 0.0}
    assert res["cases"]["case1"]["pred_latent"] == "car"


def test_find_case_image_seed_suffix(tmp_path):
    _img(0).save(str(tmp_path / "caseA_seed42.png"))
    assert find_case_image(str(tmp_path), "caseA").endswith(
        "caseA_seed42.png")
    assert find_case_image(str(tmp_path), "caseB") is None


def test_score_cases_empty(tmp_path):
    res = score_cases(RiggedScorer([]), str(tmp_path), {})
    assert res["n"] == 0 and res["overall"] == 0.0


def test_score_cobsat_cli(tmp_path, monkeypatch):
    """End-to-end CLI with the tiny scorer patched in."""
    import sys

    import scripts.score_cobsat as sc

    _img(5).save(str(tmp_path / "c0.png"))
    labels = {"c0": {"latent": "car", "explicit": "red",
                     "latent_candidates": ["car", "dog"],
                     "explicit_candidates": ["red", "blue"]}}
    lp = tmp_path / "labels.json"
    lp.write_text(json.dumps(labels))

    rigged = RiggedScorer([("car", "red")])
    from thinkdiff_tpu.models import clip_scorer as cs

    monkeypatch.setattr(cs.CLIPScorer, "from_pretrained",
                        classmethod(lambda cls, p: rigged))
    out = tmp_path / "res.json"
    monkeypatch.setattr(sys, "argv", [
        "score_cobsat", "--images-dir", str(tmp_path),
        "--labels-json", str(lp), "--out-json", str(out)])
    sc.main()
    res = json.loads(out.read_text())
    assert res["overall"] == 1.0 and res["n"] == 1
