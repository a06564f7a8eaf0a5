"""T5 encoder-decoder in flax.linen, numerics-compatible with HF
``T5ForConditionalGeneration`` (flan-t5 family) so released checkpoints
convert losslessly.

The two ThinkDiff-specific behaviors live here as first-class API instead of
the reference's subclass monkey-patching
(reference: thinkdiff/models/blip_vision_t5_decoder.py:71-227):

  - ``extra_encoder_states`` / ``extra_attention_mask``: extra embedding
    tokens (projected vision/VLM features) concatenated BEFORE the text
    encoder states feeding decoder cross-attention
    (reference blip_vision_t5_decoder.py:186-189).
  - encoder-less decode: ``decode_with_encoder_states`` accepts arbitrary
    encoder states directly (the LVLM variant deletes the T5 encoder —
    reference mllama_vllm_t5_embed_decoder_2.py:703, 585-598).

T5 quirks preserved for parity: NO 1/sqrt(d) attention scaling, relative
position bias computed once and shared across layers, RMS (T5Layer) norms,
gated-gelu FFN for flan checkpoints, untied lm_head.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from thinkdiff_tpu.ops.flash_attention import flash_attention, mha_reference
from thinkdiff_tpu.ops.norms import rmsnorm

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # flan-t5; "relu" for t5v1.0
    tie_word_embeddings: bool = False
    dropout_rate: float = 0.1
    remat: bool = False  # jax.checkpoint each block: activations -> recompute
    # selective remat of ONLY the FFN: drops the (rows, d_ff) gate/up
    # activation saves (the round-2 batch-24/32 OOM driver — PERF.md
    # "memory ceiling") at the cost of recomputing the FFN forward in the
    # backward. Strictly weaker than ``remat``; ignored when remat is set.
    remat_ffn: bool = False
    # fused projection groups: self-attn q|k|v -> one 'qkv' kernel,
    # cross-attn k|v -> 'kv_fused', gated-FFN wi_0|wi_1 -> 'wi_fused'.
    # One wide dot per group instead of 2-3 thin ones: fewer dispatches and
    # larger N amortize the w8a8 int32-accum + dequant epilogue (round-2
    # measured s8 saturation at 41% of peak on the unfused layout —
    # PERF.md "MFU ceiling"). Param layout changes; ``fuse_t5_params``
    # converts an unfused tree (fp or quantized triplets).
    fused_proj: bool = False
    # False | True/"int8" (weight-only) | "w8a8" (int8 activations too) —
    # quantization of the frozen tower (see QDense)
    quant_int8: Any = False
    dtype: Any = jnp.float32

    @property
    def is_gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated-")

    @property
    def act_fn(self):
        act = self.feed_forward_proj.replace("gated-", "")
        if act == "gelu":
            # HF uses gelu_new (tanh approximation) for flan-t5.
            return lambda x: jax.nn.gelu(x, approximate=True)
        if act == "relu":
            return jax.nn.relu
        if act == "silu":
            return jax.nn.silu
        raise ValueError(act)

    @classmethod
    def tiny(cls, **kw):
        base = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                    num_decoder_layers=2, num_heads=4, dropout_rate=0.0)
        base.update(kw)
        return cls(**base)

    @classmethod
    def flan_t5_xxl(cls, **kw):
        return cls(**{**dict(dtype=jnp.bfloat16), **kw})


def relative_position_bucket(relative_position, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF T5 bucket function (T5Attention._relative_position_bucket)."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class QDense(nn.Module):
    """Dense; optionally stores the kernel as int8 + per-output f32 scales
    (quantization for FROZEN params). Param layout matches
    ops/quant.quantize_tree.

    ``quant`` modes:
      False          — plain bf16/f32 kernel.
      True / "int8"  — weight-only int8: dequant fuses into a bf16 matmul
                       (halves HBM weight footprint + reads).
      "w8a8"         — weights int8 AND activations dynamically quantized
                       per-token; the dot runs s8xs8 on the MXU at 2x bf16
                       peak (ops/quant.int8_dynamic_matmul, custom VJP —
                       frozen weights, dx-only backward).
    """

    features: int
    dtype: Any = jnp.float32
    quant: Any = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.quant:
            q = self.param(
                "kernel_q",
                lambda rng, shape: jnp.zeros(shape, jnp.int8),
                (in_dim, self.features),
            )
            scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,),
                jnp.float32,
            )
            rows = 1
            for dim in x.shape[:-1]:
                rows *= dim
            if self.quant == "w8a8":
                # dynamic per-token activation quant + s8xs8 dot: the MXU
                # consumes int8 directly (2x bf16 peak, wide shapes) and the
                # narrow decode matvec reads HALF the weight bytes with NO
                # bf16 materialization — the convert problem the Pallas gemv
                # works around simply doesn't exist here
                from thinkdiff_tpu.ops.quant import int8_dynamic_matmul

                # SmoothQuant-style channel equalization: activations are
                # divided by per-channel scales whose inverse lives in the
                # (re)quantized weights (ops/quant.equalize_quantized_tree)
                # — per-token absmax quant alone crushes non-outlier
                # channels on real T5 activations. Identity (ones) until a
                # calibration pass sets it.
                inv_s = 1.0 / self.param(
                    "input_scale", nn.initializers.ones, (in_dim,),
                    jnp.float32,
                ).astype(self.dtype)
                xs = x.astype(self.dtype) * inv_s
                # calibration hook: per-channel |x| max, folded across
                # calls/batches (no-op unless 'act_stats' is mutable)
                self.sow(
                    "act_stats", "amax",
                    jnp.max(jnp.abs(xs.astype(jnp.float32)).reshape(
                        -1, in_dim), axis=0),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros((in_dim,), jnp.float32),
                )
                y = int8_dynamic_matmul(xs, q, scale)
            elif rows <= 32 and jax.default_backend() in ("tpu", "axon"):
                # weight-only decode gemv: XLA's convert doesn't fuse into
                # narrow matvecs (measured 75x slow) — stream int8 in Pallas
                from thinkdiff_tpu.ops.int8_matmul import int8_matmul

                y = int8_matmul(x.astype(self.dtype), q, scale,
                                out_dtype=self.dtype)
            else:
                # wide path stays on XLA: the int8->bf16 convert fuses into
                # large dots inside a jitted step, and a Pallas kernel here
                # LOSES ~70 ms/step to launch overhead (~500 QDense calls
                # x ~0.14 ms; measured at the aligner operating point —
                # ops/int8_matmul.int8_matmul_wide exists for single-dispatch
                # contexts)
                # scale on the OUTPUT so no bf16 weight copy materializes
                y = jnp.dot(x.astype(self.dtype), q.astype(self.dtype),
                            preferred_element_type=self.dtype)
                y = y * scale.astype(self.dtype)[None]
        else:
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (in_dim, self.features), self.dtype,
            )
            y = jnp.dot(x.astype(self.dtype), kernel,
                        preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.dtype)
            y = y + bias.astype(self.dtype)
        return y


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        return rmsnorm(x.astype(self.dtype), weight.astype(self.dtype), self.eps)


class T5Attention(nn.Module):
    cfg: T5Config
    causal: bool = False

    @nn.compact
    def __call__(self, hidden, kv=None, position_bias=None, mask=None,
                 deterministic=True, q_segments=None, kv_segments=None):
        """hidden: (B, Tq, D); kv: cross-attn source (B, Tk, D) or None.

        mask: (B, Tk) 1/0 validity of keys; position_bias additive
        (1|B, H, Tq, Tk). q/kv_segments: (B, Tq)/(B, Tk) packing ids
        (>=1 real, 0 pad) — same-segment attention only. Returns (B, Tq, D).
        """
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: QDense(inner, dtype=cfg.dtype,
                                    quant=cfg.quant_int8, name=name)
        if cfg.fused_proj:
            if kv is None:
                qkv = QDense(3 * inner, dtype=cfg.dtype, quant=cfg.quant_int8,
                             name="qkv")(hidden)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = dense("q")(hidden)
                kvp = QDense(2 * inner, dtype=cfg.dtype, quant=cfg.quant_int8,
                             name="kv_fused")(kv)
                k, v = jnp.split(kvp, 2, axis=-1)
        else:
            source = hidden if kv is None else kv
            q = dense("q")(hidden)
            k = dense("k")(source)
            v = dense("v")(source)

        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        bias = position_bias
        if bias is not None:
            bias = bias.astype(jnp.float32)
        # key validity rides the kernel's kv_mask input — never materialized
        # as a broadcast (B, H, Tq, Tk) bias tensor
        kv_mask = None if mask is None else mask.astype(jnp.int32)

        if q_segments is None or kv_segments is None:
            q_segments = kv_segments = None  # ids only act in pairs
        # T5 has no 1/sqrt(d) scaling -> sm_scale=1.0
        out = flash_attention(q, k, v, bias, kv_mask, self.causal, 1.0,
                              512, 1024, q_segments, kv_segments)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, inner)
        return QDense(cfg.d_model, dtype=cfg.dtype, quant=cfg.quant_int8,
                      name="o")(out)


class T5RelativeBias(nn.Module):
    cfg: T5Config
    bidirectional: bool

    @nn.compact
    def __call__(self, q_len: int, k_len: int):
        cfg = self.cfg
        emb = self.param(
            "rel_embedding", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads), cfg.dtype,
        )
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, self.bidirectional,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias = emb[buckets]  # (Tq, Tk, H)
        return bias.transpose(2, 0, 1)[None]  # (1, H, Tq, Tk)


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        dense = lambda feat, name: QDense(feat, dtype=cfg.dtype,
                                          quant=cfg.quant_int8, name=name)
        if cfg.is_gated and cfg.fused_proj:
            both = dense(2 * cfg.d_ff, "wi_fused")(x)
            gate, up = jnp.split(both, 2, axis=-1)
            h = cfg.act_fn(gate) * up
        elif cfg.is_gated:
            gate = cfg.act_fn(dense(cfg.d_ff, "wi_0")(x))
            up = dense(cfg.d_ff, "wi_1")(x)
            h = gate * up
        else:
            h = cfg.act_fn(dense(cfg.d_ff, "wi")(x))
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return dense(cfg.d_model, "wo")(h)


class T5Block(nn.Module):
    cfg: T5Config
    causal: bool = False
    has_cross: bool = False

    @nn.compact
    def __call__(self, x, encoder_states=None, self_bias=None,
                 self_mask=None, cross_mask=None, deterministic=True,
                 segments=None, enc_segments=None):
        cfg = self.cfg
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype,
                        name="self_attn_norm")(x)
        h = T5Attention(cfg, causal=self.causal, name="self_attn")(
            h, position_bias=self_bias, mask=self_mask,
            deterministic=deterministic, q_segments=segments,
            kv_segments=segments,
        )
        x = x + nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        if self.has_cross:
            h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype,
                            name="cross_attn_norm")(x)
            h = T5Attention(cfg, causal=False, name="cross_attn")(
                h, kv=encoder_states, mask=cross_mask,
                deterministic=deterministic, q_segments=segments,
                kv_segments=enc_segments,
            )
            x = x + nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype,
                        name="ffn_norm")(x)
        ffn_cls = (nn.remat(T5FFN, static_argnums=(1,))
                   if cfg.remat_ffn and not cfg.remat else T5FFN)
        h = ffn_cls(cfg, name="ffn")(h, deterministic)
        return x + nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_embeds, mask=None, deterministic=True,
                 segments=None):
        cfg = self.cfg
        bias = T5RelativeBias(cfg, bidirectional=True, name="rel_bias")(
            input_embeds.shape[1], input_embeds.shape[1]
        )
        x = nn.Dropout(cfg.dropout_rate)(input_embeds, deterministic=deterministic)
        block_cls = (nn.remat(T5Block, static_argnums=(5,)) if cfg.remat
                     else T5Block)
        for i in range(cfg.num_layers):
            x = block_cls(cfg, causal=False, has_cross=False, name=f"block_{i}")(
                x, None, bias, mask, None, deterministic, segments
            )
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype,
                        name="final_norm")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)


class T5Decoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_embeds, encoder_states, self_mask=None,
                 cross_mask=None, deterministic=True, segments=None,
                 enc_segments=None):
        cfg = self.cfg
        t = input_embeds.shape[1]
        bias = T5RelativeBias(cfg, bidirectional=False, name="rel_bias")(t, t)
        x = nn.Dropout(cfg.dropout_rate)(input_embeds, deterministic=deterministic)
        block_cls = (nn.remat(T5Block, static_argnums=(5,)) if cfg.remat
                     else T5Block)
        for i in range(cfg.num_decoder_layers):
            x = block_cls(cfg, causal=True, has_cross=True, name=f"block_{i}")(
                x, encoder_states, bias, self_mask, cross_mask, deterministic,
                segments, enc_segments,
            )
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype,
                        name="final_norm")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)


class T5ForConditionalGeneration(nn.Module):
    """Full seq2seq stack + the ThinkDiff extra-embeds/encoder-less modes."""

    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared",
                               param_dtype=cfg.dtype, dtype=cfg.dtype)
        self.encoder = T5Encoder(cfg, name="encoder")
        self.decoder = T5Decoder(cfg, name="decoder")
        if not cfg.tie_word_embeddings:
            self.lm_head = QDense(cfg.vocab_size, dtype=cfg.dtype,
                                  quant=cfg.quant_int8, name="lm_head")

    def encode(self, input_ids=None, attention_mask=None, input_embeds=None,
               extra_encoder_states=None, extra_attention_mask=None,
               deterministic=True):
        """Returns (encoder_states, cross_mask).

        ``extra_encoder_states`` (projected image/VLM tokens) are concatenated
        BEFORE the text states, matching the reference concat order
        (reference blip_vision_t5_decoder.py:186-189,425-436).
        """
        if input_embeds is None:
            input_embeds = self.shared(input_ids)
        states = self.encoder(input_embeds, mask=attention_mask,
                              deterministic=deterministic)
        mask = attention_mask
        if mask is None:
            mask = jnp.ones(states.shape[:2], jnp.int32)
        if extra_encoder_states is not None:
            extra = extra_encoder_states.astype(states.dtype)
            if extra_attention_mask is None:
                extra_attention_mask = jnp.ones(extra.shape[:2], jnp.int32)
            states = jnp.concatenate([extra, states], axis=1)
            mask = jnp.concatenate([extra_attention_mask, mask], axis=1)
        return states, mask

    def decode_hidden(self, decoder_input_ids, encoder_states,
                      cross_mask=None, decoder_mask=None, deterministic=True,
                      decoder_segments=None, encoder_segments=None):
        """Decoder final hidden states (B, T, D) — the pre-lm_head tap.
        Callers that fuse the head (ops/chunked_ce) or tap embeddings use
        this; ``decode_with_encoder_states`` adds the head.
        decoder/encoder_segments enable packed rows (multiple samples per
        row, cross-attention restricted to the matching encoder segment)."""
        dec_embeds = self.shared(decoder_input_ids)
        return self.decoder(
            dec_embeds, encoder_states.astype(dec_embeds.dtype),
            self_mask=decoder_mask, cross_mask=cross_mask,
            deterministic=deterministic, segments=decoder_segments,
            enc_segments=encoder_segments,
        )

    def decode_with_encoder_states(self, decoder_input_ids, encoder_states,
                                   cross_mask=None, decoder_mask=None,
                                   deterministic=True, decoder_segments=None,
                                   encoder_segments=None):
        """Encoder-less path: any (B, S, D) states can condition the decoder
        (reference mllama_vllm_t5_embed_decoder_2.py:585-598 passes
        ``encoder_outputs=(proj,)``)."""
        hidden = self.decode_hidden(
            decoder_input_ids, encoder_states, cross_mask=cross_mask,
            decoder_mask=decoder_mask, deterministic=deterministic,
            decoder_segments=decoder_segments,
            encoder_segments=encoder_segments,
        )
        if self.cfg.tie_word_embeddings:
            hidden = hidden * (self.cfg.d_model ** -0.5)
            logits = self.shared.attend(hidden)
        else:
            logits = self.lm_head(hidden)
        return logits

    def __call__(self, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, input_embeds=None,
                 extra_encoder_states=None, extra_attention_mask=None,
                 decoder_mask=None, deterministic=True):
        states, mask = self.encode(
            input_ids, attention_mask, input_embeds,
            extra_encoder_states, extra_attention_mask, deterministic,
        )
        return self.decode_with_encoder_states(
            decoder_input_ids, states, cross_mask=mask,
            decoder_mask=decoder_mask, deterministic=deterministic,
        )


def _concat_dense_params(nodes, axis=1):
    """Concatenate QDense param dicts along the OUTPUT axis. Handles fp
    ({kernel}) and quantized triplets ({kernel_q, kernel_scale[,
    input_scale]}). Per-output-channel scales concatenate losslessly;
    input_scale is per-INPUT and must agree across the fused branches
    (identical ones on fresh trees; run equalization AFTER fusing)."""
    first = nodes[0]
    if "kernel" in first:
        out = {"kernel": jnp.concatenate(
            [n["kernel"] for n in nodes], axis=axis)}
        if "bias" in first:
            out["bias"] = jnp.concatenate([n["bias"] for n in nodes], axis=0)
        return out
    out = {
        "kernel_q": jnp.concatenate([n["kernel_q"] for n in nodes], axis=axis),
        "kernel_scale": jnp.concatenate(
            [n["kernel_scale"] for n in nodes], axis=0),
    }
    if "bias" in first:
        out["bias"] = jnp.concatenate([n["bias"] for n in nodes], axis=0)
    if "input_scale" in first:
        import numpy as _np

        for n in nodes[1:]:
            if not _np.allclose(_np.asarray(first["input_scale"]),
                                _np.asarray(n["input_scale"]), rtol=1e-5):
                raise ValueError(
                    "fuse_t5_params: branches have diverged input_scale "
                    "(equalization ran on the unfused layout) — re-fuse "
                    "from pre-equalization weights, then calibrate.")
        out["input_scale"] = first["input_scale"]
    return out


def fuse_t5_params(params):
    """Unfused T5 param tree -> the ``fused_proj=True`` layout.

    self_attn {q,k,v} -> qkv; cross_attn {k,v} -> kv_fused; gated FFN
    {wi_0,wi_1} -> wi_fused. Works on fp kernels and ops/quant triplets;
    use after ``convert_t5`` (HF checkpoints convert to the unfused
    layout)."""
    def rec(node, name=""):
        if not isinstance(node, dict):
            return node
        keys = set(node.keys())
        if name == "self_attn" and {"q", "k", "v"} <= keys:
            fused = {"qkv": _concat_dense_params(
                [node["q"], node["k"], node["v"]])}
            rest = {k: rec(v, k) for k, v in node.items()
                    if k not in ("q", "k", "v")}
            return {**fused, **rest}
        if name == "cross_attn" and {"k", "v"} <= keys:
            fused = {"kv_fused": _concat_dense_params([node["k"], node["v"]])}
            rest = {k: rec(v, k) for k, v in node.items()
                    if k not in ("k", "v")}
            return {**fused, **rest}
        if name == "ffn" and {"wi_0", "wi_1"} <= keys:
            fused = {"wi_fused": _concat_dense_params(
                [node["wi_0"], node["wi_1"]])}
            rest = {k: rec(v, k) for k, v in node.items()
                    if k not in ("wi_0", "wi_1")}
            return {**fused, **rest}
        return {k: rec(v, k) for k, v in node.items()}

    return rec(params)


def shift_right(labels, decoder_start_token_id: int = 0, pad_id: int = 0):
    """HF _shift_right: decoder inputs = labels shifted right, -100 -> pad."""
    shifted = jnp.pad(labels, ((0, 0), (1, 0)),
                      constant_values=decoder_start_token_id)[:, :-1]
    return jnp.where(shifted == -100, pad_id, shifted)


def cross_entropy_loss(logits, labels, ignore_index: int = -100):
    """Token-mean CE matching torch F.cross_entropy(ignore_index=-100)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    loss = -jnp.sum(token_ll * valid) / jnp.maximum(jnp.sum(valid), 1)
    return loss


def ce_stats(logits, labels, ignore_index: int = -100):
    """(loss, n_correct, n_tokens) — CE plus teacher-forced next-token
    accuracy counts over non-ignored positions. Monolithic-logits analog
    of ops/chunked_ce.chunked_head_ce_stats, for the eval-metrics path."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    count = jnp.sum(valid.astype(jnp.float32))
    loss = -jnp.sum(token_ll * valid) / jnp.maximum(count, 1.0)
    hit = (jnp.argmax(logp, axis=-1) == safe_labels) & valid
    return loss, jnp.sum(hit.astype(jnp.float32)), count
