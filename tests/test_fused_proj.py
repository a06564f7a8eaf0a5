"""fused_proj layout (T5 qkv / kv_fused / wi_fused): same math as the
unfused layout on the same weights — the fused kernels are exact
concatenations, so outputs must match to fp tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.models.aligner_lvlm import MllamaT5EmbedDecoder
from thinkdiff_tpu.models.t5 import (
    T5Config, T5ForConditionalGeneration, fuse_t5_params,
)
from thinkdiff_tpu.ops.quant import quantize_tree

TINY = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_decoder_layers=2, num_heads=4, dropout_rate=0.0)


def _init_unfused(seed=0):
    cfg = T5Config(**TINY)
    model = T5ForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(seed)
    ids = jnp.zeros((1, 4), jnp.int32)
    return model.init({"params": rng, "dropout": rng},
                      input_ids=ids, decoder_input_ids=ids)["params"]


def test_fused_forward_matches_unfused_fp():
    params = _init_unfused()
    fused_params = fuse_t5_params(params)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(1, 128, (2, 6)))
    dec = jnp.asarray(rs.randint(1, 128, (2, 5)))

    out_u = T5ForConditionalGeneration(T5Config(**TINY)).apply(
        {"params": params}, input_ids=ids, decoder_input_ids=dec)
    out_f = T5ForConditionalGeneration(
        T5Config(**TINY, fused_proj=True)).apply(
        {"params": fused_params}, input_ids=ids, decoder_input_ids=dec)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=1e-5)


def test_fused_quantized_triplets_match_unfused():
    params = jax.tree.map(np.asarray, _init_unfused())
    q_unfused = quantize_tree(params, min_size=0, w8a8=True)
    q_fused = fuse_t5_params(q_unfused)
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(1, 128, (2, 6)))
    dec = jnp.asarray(rs.randint(1, 128, (2, 5)))

    out_u = T5ForConditionalGeneration(
        T5Config(**TINY, quant_int8="w8a8")).apply(
        {"params": q_unfused}, input_ids=ids, decoder_input_ids=dec)
    out_f = T5ForConditionalGeneration(
        T5Config(**TINY, quant_int8="w8a8", fused_proj=True)).apply(
        {"params": q_fused}, input_ids=ids, decoder_input_ids=dec)
    # identical int8 weights + identical per-token activation quant (the
    # fused branches see the same input rows) -> bitwise-equal dots up to
    # the f32 epilogue reassociation
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_u, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_aligner_fused_loss_matches_unfused():
    base = {"dtype": "float32", "load_pretrained": False,
            "vlm_hidden_size": 24, "t5_config": TINY}
    m_u = MllamaT5EmbedDecoder(ConfigNode(base), seed=0)
    m_f = MllamaT5EmbedDecoder(ConfigNode(
        {**base, "t5_config": {**TINY, "fused_proj": True}}), seed=0)
    m_f.frozen = {"t5": fuse_t5_params(m_u.frozen["t5"])}
    m_f.trainable = m_u.trainable
    rs = np.random.RandomState(2)
    batch = {
        "embeds": jnp.asarray(rs.randn(2, 7, 24), jnp.float32),
        "embed_mask": jnp.ones((2, 7), jnp.int32),
        "labels": jnp.asarray(rs.randint(1, 128, (2, 10))),
    }
    lu = float(m_u.loss_fn(m_u.trainable, m_u.frozen, batch))
    lf = float(m_f.loss_fn(m_f.trainable, m_f.frozen, batch))
    np.testing.assert_allclose(lf, lu, rtol=1e-5)
    gu = jax.grad(m_u.loss_fn)(m_u.trainable, m_u.frozen, batch)
    gf = jax.grad(m_f.loss_fn)(m_f.trainable, m_f.frozen, batch)
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_qwen2_fused_decode_matches_unfused():
    """fused qkv (GQA sizes) + gate_up: same outputs and identical KV-cache
    decode as the unfused layout on the same weights (incl. q/k/v biases)."""
    import dataclasses

    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLModel, fuse_qwen2_params,
    )

    cfg = Qwen2VLConfig.tiny()
    cfg_f = dataclasses.replace(cfg, fused_proj=True)
    model_u, model_f = Qwen2VLModel(cfg), Qwen2VLModel(cfg_f)
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 200, (2, 6)))
    pos = jnp.broadcast_to(jnp.arange(6)[None, None], (3, 2, 6)).astype(jnp.int32)
    params_u = model_u.init(rng, input_ids=ids, position_ids=pos)["params"]
    params_f = fuse_qwen2_params(params_u)

    lo_u, hid_u, _ = model_u.apply({"params": params_u}, input_ids=ids,
                                   position_ids=pos)
    lo_f, hid_f, _ = model_f.apply({"params": params_f}, input_ids=ids,
                                   position_ids=pos)
    np.testing.assert_allclose(np.asarray(hid_f), np.asarray(hid_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lo_f), np.asarray(lo_u), atol=1e-4)

    # decode step with caches
    hd = cfg.head_dim
    caches = [(jnp.zeros((2, cfg.num_kv_heads, 16, hd)),
               jnp.zeros((2, cfg.num_kv_heads, 16, hd)))
              for _ in range(cfg.num_layers)]
    cache_len = jnp.zeros((2,), jnp.int32)
    _, h_u, c_u = model_u.apply({"params": params_u}, input_ids=ids,
                                position_ids=pos, caches=caches,
                                cache_len=cache_len, compute_logits=False)
    caches2 = [(jnp.zeros((2, cfg.num_kv_heads, 16, hd)),
                jnp.zeros((2, cfg.num_kv_heads, 16, hd)))
               for _ in range(cfg.num_layers)]
    _, h_f, c_f = model_f.apply({"params": params_f}, input_ids=ids,
                                position_ids=pos, caches=caches2,
                                cache_len=cache_len, compute_logits=False)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u), atol=1e-5)
    for (ku, vu), (kf, vf) in zip(c_u, c_f):
        np.testing.assert_allclose(np.asarray(kf), np.asarray(ku), atol=1e-5)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vu), atol=1e-5)


def test_qwen2_fused_quantized_triplets():
    import dataclasses

    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLModel, fuse_qwen2_params,
    )
    from thinkdiff_tpu.ops.quant import quantize_tree

    cfg = Qwen2VLConfig.tiny(quant_int8="w8a8")
    cfg_f = dataclasses.replace(cfg, fused_proj=True)
    cfg_fp = dataclasses.replace(cfg, quant_int8=False)
    model_fp = Qwen2VLModel(cfg_fp)
    rng = jax.random.PRNGKey(1)
    ids = jnp.asarray(np.random.RandomState(1).randint(1, 200, (2, 5)))
    pos = jnp.broadcast_to(jnp.arange(5)[None, None], (3, 2, 5)).astype(jnp.int32)
    params_fp = model_fp.init(rng, input_ids=ids, position_ids=pos)["params"]
    q_params = quantize_tree(jax.tree.map(np.asarray, params_fp),
                             min_size=0, w8a8=True)
    q_fused = fuse_qwen2_params(q_params)

    _, h_u, _ = Qwen2VLModel(cfg).apply({"params": q_params}, input_ids=ids,
                                        position_ids=pos)
    _, h_f, _ = Qwen2VLModel(cfg_f).apply({"params": q_fused}, input_ids=ids,
                                          position_ids=pos)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                               rtol=1e-4, atol=1e-4)


def test_fused_kernels_get_tensor_parallel_sharding():
    from jax.sharding import PartitionSpec as P

    from thinkdiff_tpu.parallel.sharding import DEFAULT_RULES, _spec_for_name

    for name in ("decoder/block_0/self_attn/qkv/kernel",
                 "decoder/block_0/cross_attn/kv_fused/kernel",
                 "decoder/block_0/ffn/wi_fused/kernel",
                 "lm/decoder/layer_0/self_attn/qkv/kernel",
                 "lm/decoder/layer_0/gate_up/kernel"):
        assert _spec_for_name(name, DEFAULT_RULES) == P("fsdp", "model"), name
