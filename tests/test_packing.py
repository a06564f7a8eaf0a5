"""Sequence packing (data/packing.py + segment ids through T5/flash
attention): the packed batch must reproduce the unpacked loss EXACTLY —
same token set, same per-token logits (T5 relative bias depends only on
i-j, so in-row offsets are invisible to it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.data.packing import pack_rows, packed_stats
from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder


def _samples(rs, n, d_vlm=16, vocab=64):
    out = []
    for _ in range(n):
        s = rs.randint(2, 12)
        l = rs.randint(2, 14)
        out.append({
            "embeds": rs.randn(s, d_vlm).astype(np.float32),
            "label_ids": rs.randint(1, vocab, (l,)).astype(np.int32),
        })
    return out


class TestPackRows:
    def test_structure_and_roundtrip(self):
        rs = np.random.RandomState(0)
        samples = _samples(rs, 9)
        batch = pack_rows(samples, enc_cap=24, dec_cap=28, row_bucket=2)
        assert batch["embeds"].shape[0] % 2 == 0
        st = packed_stats(batch)
        assert st["enc_fill"] > 0.3 and st["dec_fill"] > 0.3

        # reconstruct every sample from its (row, segment) and compare
        found = 0
        for r in range(batch["dec_segments"].shape[0]):
            for sid in np.unique(batch["dec_segments"][r]):
                if sid == 0:
                    continue
                dmask = batch["dec_segments"][r] == sid
                emask = batch["enc_segments"][r] == sid
                ids = batch["labels"][r][dmask]
                emb = batch["embeds"][r][emask]
                din = batch["decoder_input_ids"][r][dmask]
                # per-segment shift-right: starts with 0, then ids[:-1]
                assert din[0] == 0
                np.testing.assert_array_equal(din[1:], ids[:-1])
                match = [i for i, s in enumerate(samples)
                         if len(s["label_ids"]) == len(ids)
                         and (s["label_ids"] == ids).all()
                         and s["embeds"].shape[0] == emb.shape[0]
                         and np.allclose(s["embeds"], emb)]
                assert match, (r, sid)
                found += 1
        assert found == len(samples)
        # labels padding is -100, decoder pad positions are pad_id 0
        pad = batch["dec_segments"] == 0
        assert (batch["labels"][pad] == -100).all()

    def test_capacity_respected(self):
        rs = np.random.RandomState(1)
        samples = _samples(rs, 30)
        batch = pack_rows(samples, enc_cap=16, dec_cap=16)
        for r in range(batch["enc_segments"].shape[0]):
            assert (batch["enc_segments"][r] > 0).sum() <= 16
            assert (batch["dec_segments"][r] > 0).sum() <= 16

    def test_oversize_sample_rejected(self):
        with pytest.raises(AssertionError):
            pack_rows([{"embeds": np.zeros((9, 4)),
                        "label_ids": np.arange(3)}], enc_cap=8, dec_cap=8)


@pytest.fixture(scope="module")
def tiny_aligner():
    t5_over = dict(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=1, num_decoder_layers=2, num_heads=4,
                   dropout_rate=0.0)
    model = MllamaT5EmbedDecoder(ConfigNode({
        "dtype": "float32", "load_pretrained": False,
        "quantize_frozen": None, "chunked_ce": 0,
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "vlm_hidden_size": 16, "t5_config": t5_over,
    }))
    return model


class TestPackedLossEquivalence:
    def _unpacked_batch(self, samples, vocab=64):
        n = len(samples)
        se = max(s["embeds"].shape[0] for s in samples)
        sd = max(len(s["label_ids"]) for s in samples)
        d = samples[0]["embeds"].shape[1]
        embeds = np.zeros((n, se, d), np.float32)
        mask = np.zeros((n, se), np.int32)
        labels = np.full((n, sd), -100, np.int32)
        for i, s in enumerate(samples):
            embeds[i, :s["embeds"].shape[0]] = s["embeds"]
            mask[i, :s["embeds"].shape[0]] = 1
            labels[i, :len(s["label_ids"])] = s["label_ids"]
        return {"embeds": embeds, "embed_mask": mask, "labels": labels}

    @pytest.mark.parametrize("chunked", [0, 8])
    def test_loss_matches_unpacked(self, tiny_aligner, chunked):
        model = tiny_aligner
        model.cfg["chunked_ce"] = chunked
        rs = np.random.RandomState(3)
        samples = _samples(rs, 7)

        unpacked = {k: jnp.asarray(v) for k, v in
                    self._unpacked_batch(samples).items()}
        packed = {k: jnp.asarray(v) for k, v in
                  pack_rows(samples, enc_cap=24, dec_cap=32,
                            row_bucket=2).items()}

        l_un = float(model.loss_fn(model.trainable_params(), model.frozen,
                                   unpacked))
        l_pk = float(model.loss_fn(model.trainable_params(), model.frozen,
                                   packed))
        assert np.isfinite(l_un) and np.isfinite(l_pk)
        np.testing.assert_allclose(l_pk, l_un, rtol=2e-5)

    def test_packed_grads_match_unpacked(self, tiny_aligner):
        """The projector gradient (the trainable part) must agree too —
        i.e. packing is invisible to optimization, not just to the scalar
        loss."""
        model = tiny_aligner
        model.cfg["chunked_ce"] = 0
        rs = np.random.RandomState(5)
        samples = _samples(rs, 5)
        unpacked = {k: jnp.asarray(v) for k, v in
                    self._unpacked_batch(samples).items()}
        packed = {k: jnp.asarray(v) for k, v in
                  pack_rows(samples, enc_cap=24, dec_cap=32).items()}

        g_un = jax.grad(lambda tr: model.loss_fn(tr, model.frozen, unpacked)
                        )(model.trainable_params())
        g_pk = jax.grad(lambda tr: model.loss_fn(tr, model.frozen, packed)
                        )(model.trainable_params())
        for a, b in zip(jax.tree_util.tree_leaves(g_un),
                        jax.tree_util.tree_leaves(g_pk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


class TestOnlinePacker:
    def test_fixed_shape_stream(self):
        from thinkdiff_tpu.data.packing import OnlinePacker
        rs = np.random.RandomState(7)
        packer = OnlinePacker(rows=3, enc_cap=24, dec_cap=24)
        batches, n_in = [], 40
        for s in _samples(rs, n_in):
            b = packer.add(s)
            if b is not None:
                batches.append(b)
        tail = packer.flush()
        if tail is not None:
            batches.append(tail)
        assert len(batches) >= 2
        total = 0
        for b in batches:
            assert b["labels"].shape == (3, 24)
            assert b["embeds"].shape[:2] == (3, 24)
            # count segments across rows
            total += sum(len(np.unique(r[r > 0])) for r in b["dec_segments"])
        assert total == n_in  # every sample emitted exactly once
