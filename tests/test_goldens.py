"""Committed golden-vector pack regression tests (VERDICT r2 item 6).

Every family in tests/goldens/ freezes (tiny torch-layout checkpoint, input,
torch-reference output) triples generated once by scripts/make_goldens.py.
These tests re-run OUR converter + model on the committed fixtures with no
torch in the loop, so:

  * weight-day validation is turnkey (`python -m
    scripts.validate_real_checkpoints --goldens` runs the same checks);
  * any refactor that silently changes converter key-mapping or model
    numerics fails here immediately.

The chat-template test at the bottom asserts our hand-rendered Qwen2-VL
prompt byte-matches HF ``apply_chat_template`` — it auto-skips until real
tokenizer files are mountable (zero-egress image), via
``THINKDIFF_QWEN2VL_TOKENIZER=/path/to/hf_dir``.
"""

import os

import pytest

from thinkdiff_tpu.models import golden_pack


@pytest.fixture(scope="module")
def root():
    r = golden_pack.default_root()
    if not r.exists():
        pytest.skip("tests/goldens/ not generated (scripts/make_goldens.py)")
    return r


@pytest.mark.parametrize("family", golden_pack.FAMILIES)
def test_golden_family(root, family):
    try:
        summary = golden_pack.CHECKS[family](root)
    except FileNotFoundError as exc:
        pytest.skip(f"fixture missing: {exc}")
    assert summary, family
    for label, err in summary.items():
        assert err <= golden_pack.ATOL * 10, (label, err)


def test_flatten_unflatten_roundtrip():
    import numpy as np

    tree = {"a": {"b": np.arange(3.0), "c": {"d": np.ones((2, 2))}},
            "e": np.zeros(1)}
    flat = golden_pack.flatten_params(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = golden_pack.unflatten_params(flat)
    assert np.array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])


# ---------------------------------------------------------------------------
# Chat-template equality vs HF apply_chat_template (auto-skip until tokenizer
# files exist — reference vLLM fork tokenizes exactly this rendering,
# mllama_vllm_generate_1.py:382-417).
# ---------------------------------------------------------------------------

def test_chat_template_matches_hf():
    tok_dir = os.environ.get("THINKDIFF_QWEN2VL_TOKENIZER")
    if not tok_dir or not os.path.isdir(tok_dir):
        pytest.skip("set THINKDIFF_QWEN2VL_TOKENIZER=/path/to/Qwen2-VL "
                    "tokenizer dir (weight day)")
    from transformers import AutoTokenizer

    from thinkdiff_tpu.engines.embed_engine import (
        DEFAULT_SYSTEM, render_chat_prompt)

    tok = AutoTokenizer.from_pretrained(tok_dir)
    for n_images, text in [(0, "Describe the image."),
                           (1, "Describe the image."),
                           (2, "What differs between these?")]:
        content = ([{"type": "image"}] * n_images
                   + [{"type": "text", "text": text}])
        messages = [
            {"role": "system", "content": DEFAULT_SYSTEM},
            {"role": "user", "content": content},
        ]
        want = tok.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        got = render_chat_prompt(DEFAULT_SYSTEM, text, n_images)
        assert got == want, (n_images, got, want)
        assert (tok.encode(got, add_special_tokens=False)
                == tok.encode(want, add_special_tokens=False))
