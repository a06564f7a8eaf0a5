"""Data layer: tar shard round trip, wids random access, collator golden
padding/masking semantics, pipeline shuffling."""

import io
import json
import os

import numpy as np
import pytest

from thinkdiff_tpu.data.collators import (
    CaptionSplitCollator, EmbedShardCollator, IGNORE_INDEX,
    LLAVA_BRIEF_INSTRUCTIONS, WidsProcessCollator, biased_random_split_string,
    random_split_string,
)
from thinkdiff_tpu.data.pipeline import (
    IterLoader, MapDatasetLoader, PrefetchLoader, WebDatasetPipeline,
)
from thinkdiff_tpu.data.tario import (
    ShardWriter, brace_expand, tar_sample_iterator, write_wids_index,
)
from thinkdiff_tpu.data.wids_reader import ChunkedSampler, ShardListDataset


class DummyTokenizer:
    """Whitespace tokenizer: token id = len(word) + 1, pad 0."""

    pad_token_id = 0

    def encode(self, text, add_special_tokens=True):
        ids = [min(len(w) + 1, 99) for w in text.split() if w]
        return ids + [1] if add_special_tokens else ids

    def decode(self, ids):
        return " ".join("x" * max(i - 1, 1) for i in ids)


def _make_shards(tmp_path, n_shards=2, per_shard=5):
    from PIL import Image

    paths = []
    idx = 0
    for s in range(n_shards):
        path = str(tmp_path / f"{s:06d}.tar")
        with ShardWriter(path.replace(f"{s:06d}", "%06d"), start_shard=s) as w:
            w.pattern = str(tmp_path / "%06d.tar")
            for _ in range(per_shard):
                img = Image.fromarray(
                    (np.random.RandomState(idx).rand(8, 8, 3) * 255).astype("uint8")
                )
                w.write({
                    "__key__": f"{idx:08d}",
                    "jpg": img,
                    "json": {"caption": f"a photo of thing number {idx}"},
                })
                idx += 1
        paths.append(path)
    return paths


def test_brace_expand():
    assert brace_expand("/x/{000000..000002}.tar") == [
        "/x/000000.tar", "/x/000001.tar", "/x/000002.tar"
    ]
    assert brace_expand("/plain.tar") == ["/plain.tar"]


def test_shard_roundtrip_and_wids_index(tmp_path):
    paths = _make_shards(tmp_path)
    samples = list(tar_sample_iterator(paths[0], decode=True))
    assert len(samples) == 5
    assert samples[0]["json"]["caption"].startswith("a photo")
    assert samples[0]["jpg"].size == (8, 8)

    index = write_wids_index(paths, str(tmp_path / "index.json"))
    assert index["__kind__"] == "wids-shard-index-v1"
    assert [s["nsamples"] for s in index["shardlist"]] == [5, 5]

    ds = ShardListDataset(str(tmp_path / "index.json"))
    assert len(ds) == 10
    s7 = ds[7]
    assert s7["__key__"] == "00000007"
    assert ds[-1]["__key__"] == "00000009"


def test_pth_field_torch_interchange(tmp_path):
    torch = pytest.importorskip("torch")
    emb = np.random.randn(6, 4).astype(np.float32)
    with ShardWriter(str(tmp_path / "%06d.tar")) as w:
        w.write({"__key__": "k0", "model.norm.output_embed.pth": emb,
                 "json": {"output_token_ids": [1, 2, 3]}})
    (sample,) = tar_sample_iterator(str(tmp_path / "000000.tar"), decode=True)
    np.testing.assert_allclose(sample["model.norm.output_embed.pth"], emb)


def test_pth_field_bfloat16_decode(tmp_path):
    """Reference/vLLM-written embed shards contain bfloat16 tensors; decode
    must not crash (numpy has no bf16) and must preserve exact bits."""
    torch = pytest.importorskip("torch")
    import io as _io

    import ml_dtypes

    emb = torch.randn(5, 4, dtype=torch.bfloat16)
    buf = _io.BytesIO()
    torch.save(emb, buf)
    with ShardWriter(str(tmp_path / "%06d.tar")) as w:
        w.write({"__key__": "k0", "model.norm.output_embed.pth": buf.getvalue()})
    (sample,) = tar_sample_iterator(str(tmp_path / "000000.tar"), decode=True)
    got = sample["model.norm.output_embed.pth"]
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got.astype(np.float32), emb.float().numpy())


def test_chunked_sampler_coverage():
    s = ChunkedSampler(25, chunksize=10, shuffle=True, seed=1)
    idxs = list(s)
    assert sorted(idxs) == list(range(25))
    s2 = ChunkedSampler(24, chunksize=10, shuffle=True, seed=1, rank=1, world_size=2)
    idxs2 = list(s2)
    assert len(idxs2) == 12 and all(0 <= i < 24 for i in idxs2)


def test_random_split_string_bounds():
    import random as _r

    rng = _r.Random(0)
    for _ in range(50):
        a, b = random_split_string("one two three four five", rng)
        assert a and b and (a + " " + b) == "one two three four five"
    assert random_split_string("single") == ("", "single")
    a, b = biased_random_split_string("w1 w2 w3 w4 w5 w6 w7 w8")
    assert (a + " " + b).split() == ["w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8"]


def test_caption_split_collator_static_shapes():
    tok = DummyTokenizer()
    coll = CaptionSplitCollator(tok, max_txt_len=8, seed=0)
    samples = [
        {"image": np.zeros((4, 4, 3), np.float32), "answer": "a short caption here"},
        {"image": np.ones((4, 4, 3), np.float32), "answer": "tiny"},
    ]
    batch = coll(samples)
    assert batch["pixel_values"].shape == (2, 4, 4, 3)
    assert batch["input_ids"].shape == (2, 8)
    assert batch["labels"].shape == (2, 8)
    # pad positions must be IGNORE_INDEX
    assert (batch["labels"][batch["labels"] != IGNORE_INDEX] > 0).all()
    # single-word caption -> empty first half -> mask reflects that
    assert batch["input_mask"][1].sum() <= 1  # just special token or empty


def test_embed_collator_random_split_semantics():
    tok = DummyTokenizer()
    decoded = []

    def vlm_decode(ids):
        decoded.append(list(ids))
        return " ".join("tok" for _ in ids)

    coll = EmbedShardCollator(
        tok, vlm_decode, use_output_embed=True, random_split_output_embed=True,
        output_embed_max_split_len=4, max_txt_len=6, seed=0,
    )
    emb = np.arange(60, dtype=np.float32).reshape(10, 6)
    samples = [{
        "model.norm.output_embed.pth": emb,
        "json": {"output_token_ids": list(range(100, 110))},
    }]
    batch = coll(samples)
    assert batch["embeds"].shape == (1, 4, 6)
    assert batch["labels"].shape == (1, 6)
    n_cond = int(batch["embed_mask"][0].sum())
    assert 1 <= n_cond <= 4
    # condition embeds are the PREFIX, target ids are the REMAINDER
    np.testing.assert_allclose(batch["embeds"][0, :n_cond], emb[:n_cond])
    assert decoded[0] == list(range(100 + n_cond, 110))


def test_embed_collator_plain_truncate():
    tok = DummyTokenizer()
    coll = EmbedShardCollator(
        tok, lambda ids: " ".join("t" for _ in ids),
        random_split_output_embed=False, output_embed_max_len=4, max_txt_len=6,
    )
    emb = np.random.randn(10, 6).astype(np.float32)
    batch = coll([{
        "norm.output_embed.pth": emb,
        "json": {"output_token_ids": list(range(10))},
    }])
    assert batch["embeds"].shape == (1, 4, 6)
    np.testing.assert_allclose(batch["embeds"][0], emb[:4])
    assert batch["embed_mask"][0].sum() == 4


def test_wids_process_collator():
    coll = WidsProcessCollator(seed=0)
    from PIL import Image

    img = Image.new("RGB", (8, 8))
    out = coll([{"jpg": img, "json": {"caption": "c"}, "__key__": "k1"}])
    assert out["answers"][0] in LLAVA_BRIEF_INSTRUCTIONS
    assert out["filenames"] == ["k1"]
    assert len(LLAVA_BRIEF_INSTRUCTIONS) == 16


def test_webdataset_pipeline_batches(tmp_path):
    paths = _make_shards(tmp_path, n_shards=2, per_shard=6)
    tok = DummyTokenizer()
    coll = CaptionSplitCollator(tok, max_txt_len=8, seed=0)

    def map_fn(s):
        return {"image": np.asarray(s["jpg"], np.float32) / 255.0,
                "answer": s["json"]["caption"]}

    pipe = WebDatasetPipeline(
        str(tmp_path / "{000000..000001}.tar"), resample=False,
        shuffle_buffer=4, map_fns=[map_fn], batch_size=4, collator=coll,
    )
    batches = list(pipe)
    assert len(batches) == 3
    assert batches[0]["pixel_values"].shape == (4, 8, 8, 3)

    # IterLoader wraps epochs infinitely
    pipe2 = WebDatasetPipeline(
        str(tmp_path / "{000000..000001}.tar"), resample=False,
        map_fns=[map_fn], batch_size=4, collator=coll,
    )
    it = IterLoader(PrefetchLoader(pipe2))
    got = [next(it) for _ in range(7)]
    assert len(got) == 7


def test_embed_collator_bucketed_lengths():
    """bucket_lengths=True pads to the power-of-two bucket of the per-batch
    longest (the static-shape analog of the reference's padding='longest',
    mllama_vllm_t5_embed_decoder_2.py:570), not to the configured maxima."""
    from thinkdiff_tpu.data.collators import bucket_length

    assert bucket_length(5, 128) == 32       # min bucket
    assert bucket_length(33, 128) == 64
    assert bucket_length(120, 128) == 128
    assert bucket_length(500, 128) == 128    # clamped to max

    tok = DummyTokenizer()
    coll = EmbedShardCollator(
        tok, lambda ids: " ".join("tok" for _ in ids),
        use_output_embed=True, random_split_output_embed=True,
        output_embed_max_split_len=128, max_txt_len=128,
        bucket_lengths=True, seed=0,
    )
    rs = np.random.RandomState(0)
    samples = [
        {"model.norm.output_embed.pth": rs.randn(n, 8).astype(np.float32),
         "json": {"output_token_ids": list(range(3, 3 + n))}}
        for n in (20, 35)
    ]
    batch = coll(samples)
    # splits are < 35 -> embeds bucket to 32; labels bucket to <=64
    assert batch["embeds"].shape[1] in (32, 64)
    assert batch["embeds"].shape[1] < 128
    assert batch["labels"].shape[1] in (32, 64)
    # masks mark only the real prefix
    assert int(batch["embed_mask"][0].sum()) < 20


# ------------------- map-style annotation datasets (§2.5) -------------------


def test_annotation_dataset_loads_both_json_layouts(tmp_path):
    import json

    from thinkdiff_tpu.data.pipeline import AnnotationDataset

    (tmp_path / "a.json").write_text(json.dumps(
        [{"image": "x.jpg", "caption": "a"}, {"image": "y.jpg", "caption": "b"}]))
    (tmp_path / "b.json").write_text(json.dumps(
        {"annotations": [{"image": "z.jpg", "caption": "c"}]}))
    ds = AnnotationDataset(ann_paths=[str(tmp_path / "a.json"),
                                      str(tmp_path / "b.json")])
    assert len(ds) == 3
    # instance ids are global, stringly (reference base_dataset.py:53-56)
    assert [s["instance_id"] for s in ds.annotation] == ["0", "1", "2"]
    batch = ds.collater([ds[0], ds[2]])
    assert batch["caption"] == ["a", "c"]


def test_concat_map_dataset_intersects_keys_on_collate(tmp_path):
    import json

    from thinkdiff_tpu.data.pipeline import AnnotationDataset, ConcatMapDataset

    (tmp_path / "a.json").write_text(json.dumps(
        [{"caption": "a", "extra": 1}, {"caption": "b", "extra": 2}]))
    (tmp_path / "b.json").write_text(json.dumps(
        [{"caption": "c", "other": 9}]))
    d1 = AnnotationDataset(ann_paths=[str(tmp_path / "a.json")])
    d2 = AnnotationDataset(ann_paths=[str(tmp_path / "b.json")])
    cat = ConcatMapDataset([d1, d2])
    assert len(cat) == 3 and cat[2]["caption"] == "c"
    # mixing samples from both: only shared keys survive
    batch = cat.collater([cat[0], cat[2]])
    assert set(batch) == {"caption", "instance_id"}
    assert batch["caption"] == ["a", "c"]


def test_default_collate_stacks_arrays():
    import numpy as np

    from thinkdiff_tpu.data.pipeline import default_collate

    out = default_collate([
        {"x": np.zeros((2, 3)), "n": 1, "s": "p"},
        {"x": np.ones((2, 3)), "n": 2, "s": "q"},
    ])
    assert out["x"].shape == (2, 2, 3)
    assert out["n"].tolist() == [1, 2] and out["s"] == ["p", "q"]


def test_token_budget_batching(tmp_path):
    """token_budget: batch size floats inversely with the length bucket;
    every emitted batch fits the padded-token budget and all window samples
    are consumed exactly once."""
    from thinkdiff_tpu.data.collators import bucket_length
    from thinkdiff_tpu.data.pipeline import WebDatasetPipeline

    rs = np.random.RandomState(0)
    lens = np.clip(rs.normal(60, 25, 96).astype(int), 16, 128)

    pipe = WebDatasetPipeline(
        ["unused"], batch_size=32, token_budget=2048,
        sample_len_fn=lambda s: s["n"], budget_len_cap=128,
        budget_window=48, min_batch=8,
        collator=lambda batch: batch,
    )
    pipe._sample_iter = lambda: iter([{"n": int(n), "i": i}
                                      for i, n in enumerate(lens)])
    batches = list(pipe)
    seen = [s["i"] for b in batches for s in b]
    assert len(seen) == len(set(seen))
    # windows roll their sub-min_batch tails forward: only the FINAL tail
    # (< 8 samples) may drop
    assert len(seen) >= 96 - 7
    for b in batches:
        assert 8 <= len(b) <= 32 and len(b) % 8 == 0
        cost = bucket_length(max(s["n"] for s in b), 128)
        assert len(b) * cost <= 2048, (len(b), cost)
    # short samples actually batch bigger than long ones
    sizes_by_len = [(max(s["n"] for s in b), len(b)) for b in batches]
    short = [bs for ln, bs in sizes_by_len if ln <= 64]
    long = [bs for ln, bs in sizes_by_len if ln > 96]
    assert short and long and max(short) > max(long)


def test_sorted_window_batching_two_level_grouping():
    """sort_window + assign_split (two-level length grouping): batches are
    homogeneous in (label bucket, split), every sample flows through
    exactly once, and the collator honors the pre-assigned split."""
    import random as _random

    from thinkdiff_tpu.data.collators import (
        EmbedShardCollator, bucket_length,
    )
    from thinkdiff_tpu.data.pipeline import WebDatasetPipeline

    rs = np.random.RandomState(1)
    rng = _random.Random(0)
    lens = np.clip(rs.normal(60, 25, 128).astype(int), 16, 200)
    samples = []
    for i, n in enumerate(lens):
        samples.append({
            "model.norm.output_embed.pth": rs.randn(int(n), 8).astype(np.float32),
            "json": {"generated_text": "t",
                     "output_token_ids": [int(x) for x in rs.randint(3, 90, int(n))]},
            "__key__": f"{i:08d}", "i": i,
        })

    mapped = [EmbedShardCollator.assign_split(dict(s), rng, 128, 128)
              for s in samples]
    assert all("__presplit__" in s and "__sortkey__" in s for s in mapped)

    pipe = WebDatasetPipeline(
        ["unused"], batch_size=8, sort_window=64,
        sample_sort_fn=lambda s: s["__sortkey__"],
        collator=lambda batch: batch,
    )
    pipe._sample_iter = lambda: iter(mapped)
    batches = list(pipe)
    seen = [s["i"] for b in batches for s in b]
    assert len(seen) == len(set(seen))
    assert len(seen) >= 128 - 7  # only the final sub-batch tail may drop

    # grouping quality: most batches span a single label bucket
    homogeneous = 0
    for b in batches:
        buckets = {s["__sortkey__"][0] for s in b}
        homogeneous += buckets == {max(buckets)} and len(buckets) == 1
    assert homogeneous >= len(batches) * 0.6, (homogeneous, len(batches))

    # collator honors the presplit: embeds length == bucket(max presplit)
    coll = EmbedShardCollator(
        DummyTokenizer(), lambda ids: " ".join("x" * max(i - 1, 1) for i in ids),
        bucket_lengths=True, seed=0)
    batch = batches[0]
    out = coll(batch)
    exp_rows = max(s["__presplit__"] for s in batch)
    assert out["embed_mask"].sum(axis=1).max() == exp_rows
    assert out["embeds"].shape[1] == bucket_length(exp_rows, 128)


def test_embed_collator_packed_mode():
    """pack_cap collates random-split samples into packed rows with
    segment ids (data/packing.py) instead of per-sample padding."""
    tok = DummyTokenizer()
    coll = EmbedShardCollator(
        tok, lambda ids: " ".join("tok" for _ in ids),
        use_output_embed=True, random_split_output_embed=True,
        output_embed_max_split_len=4, max_txt_len=8, pack_cap=16,
        pack_row_bucket=2, seed=0,
    )
    samples = []
    for i in range(6):
        n = 6 + i
        samples.append({
            "model.norm.output_embed.pth":
                np.random.RandomState(i).randn(n, 6).astype(np.float32),
            "json": {"output_token_ids": list(range(100, 100 + n))},
        })
    batch = coll(samples)
    assert set(batch) >= {"embeds", "embed_mask", "labels",
                          "decoder_input_ids", "enc_segments",
                          "dec_segments"}
    r = batch["labels"].shape[0]
    assert r % 2 == 0 and batch["labels"].shape[1] == 16
    assert batch["embeds"].shape[1] == 16
    # all 6 samples present as segments
    total = sum(len(np.unique(row[row > 0])) for row in batch["dec_segments"])
    assert total == 6
    # mask equals enc segment validity
    np.testing.assert_array_equal(
        batch["embed_mask"], (batch["enc_segments"] > 0).astype(np.int32))
