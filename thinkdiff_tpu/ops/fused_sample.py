"""Fused lm_head + token-sampling Pallas kernel for decode.

The decode sampling chain costs more than the decode forward itself at
serving batch sizes: lm_head materializes (B, V~152k) f32 logits in HBM
(~39 MB write + read back), then ``lax.top_k`` pays a sort-network pass over
the full vocabulary (measured 2.9 ms/step at (64, 152k) with the k=64
prefilter; plain argmax — the floor for any full-V HBM pass — is 2.5 ms).

This kernel never materializes the logits: it streams the int8 lm_head
column-block by column-block (the same bytes the plain w8a8 dot reads — HBM
traffic is the weight stream, ~0.4 ms at v5e bandwidth), computes each
(B, bN) logit block on the MXU, perturbs it in VMEM, and keeps a running
per-row argmax across blocks. Output is just (B,) int32 token ids.

Two modes, selected statically:
  noise=False — exact argmax over ``logits * inv_temp + biases`` (greedy
      decoding, bit-identical to the XLA argmax path; min-index tie-break
      at every reduction level preserves jnp.argmax's first-occurrence
      semantics).
  noise=True  — Gumbel-max sampling: argmax(logits/T + G), G ~ Gumbel(0,1)
      from the on-core TPU PRNG. Mathematically exact temperature-softmax
      sampling over the FULL vocabulary (no nucleus truncation — see
      engines/embed_engine.sample_logits for the exact top-p path and
      tests/test_fused_sample.py for the distributional comparison at the
      serving operating point).

Why Gumbel instead of fusing top-k: a running top-64 across column blocks
needs a per-block sort merge in the VPU; a running max is one compare. The
reference's sampling (vLLM SamplingParams temperature/top_p,
/root/reference/thinkdiff/models/mllama_vllm_generate_1.py:33-35) is served
by either path; gumbel is the opt-in speed point (``sampler: gumbel``).

Biases (applied before noise, matching sample_logits' masking order):
  pad_bias (Vp,)  — -1e30 on padding columns appended to reach a 128-multiple
      vocab block; 0 elsewhere. Always applied.
  eos_bias (Vp,)  — -1e30 on EOS token columns, 0 elsewhere. Applied per row
      scaled by ``blocked`` (1.0 while gen_count < min_tokens-1 else 0.0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# test hook: tests force the interpret path (noise=False only — the TPU PRNG
# has no interpreter) by setting INTERPRET=True and patching available()
INTERPRET = False


def available() -> bool:
    """The kernel needs a real TPU (Mosaic PRNG + int8 MXU path)."""
    return jax.default_backend() in ("tpu", "axon")


def _bits_to_gumbel(bits):
    """uint32 random bits -> Gumbel(0,1) f32.

    Top 24 bits + 0.5 give u uniform on (2**-25, 1 - 2**-25) — strictly
    inside (0, 1), so both logs are finite. Shared by the kernel and the
    pure-numpy test reference (tests/test_fused_sample.py)."""
    top24 = jax.lax.bitcast_convert_type(
        jnp.right_shift(bits, jnp.uint32(8)), jnp.int32)
    # Mosaic has no uint32->f32 cast; after >>8 the value fits int32 exactly
    u = (top24.astype(jnp.float32) + 0.5) * (2.0 ** -24)
    return -jnp.log(-jnp.log(u))


def _fused_sample_kernel(seed_ref, xq_ref, sx_ref, w_ref, s_ref, pb_ref,
                         eb_ref, blk_ref, idx_ref, val_scr, col_scr, *,
                         num_j: int, inv_temp: float, noise: bool):
    """grid (nV,) over vocab column blocks.

    xq (B, D) s8; sx (1, B) f32 per-row act scales; w (1, D, bN) s8 — one
    CONTIGUOUS pre-tiled block; s/pb/eb (1, bN) f32; blk (1, B) f32;
    idx out (B, 1) i32; scratches val (B, 128) f32 / col (B, 128) i32 hold
    the per-lane running (max value, global column) across blocks."""
    j = pl.program_id(0)
    b = xq_ref.shape[0]
    bn = w_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        val_scr[...] = jnp.full_like(val_scr, _NEG * 2.0)
        col_scr[...] = jnp.zeros_like(col_scr)

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    logits = (acc.astype(jnp.float32)
              * sx_ref[0, :].astype(jnp.float32)[:, None]
              * s_ref[0, :].astype(jnp.float32)[None])
    per = (logits * inv_temp + pb_ref[0, :][None]
           + blk_ref[0, :][:, None] * eb_ref[0, :][None])
    if noise:
        # 2-arg form: Mosaic's 3-arg prng_seed lowering rejects a
        # program_id operand; fold the block index into the first word
        # (wrap-around add keeps int32)
        pltpu.prng_seed(seed_ref[0] + j * jnp.int32(1000003), seed_ref[1])
        bits = pltpu.bitcast(pltpu.prng_random_bits((b, bn)), jnp.uint32)
        per = per + _bits_to_gumbel(bits)

    # lane-parallel reduce (B, bN) -> (B, 128): max + FIRST-occurrence col.
    g = bn // 128
    per3 = per.reshape(b, g, 128)
    lane_max = per3.max(axis=1)
    grp = jax.lax.broadcasted_iota(jnp.int32, (b, g, 128), 1)
    first_grp = jnp.where(per3 == lane_max[:, None, :], grp, g).min(axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    col = j * bn + first_grp * 128 + lane
    # strict > keeps the earlier (lower-column) block on ties
    upd = lane_max > val_scr[...]
    col_scr[...] = jnp.where(upd, col, col_scr[...])
    val_scr[...] = jnp.where(upd, lane_max, val_scr[...])

    @pl.when(j == num_j - 1)
    def _fin():
        v = val_scr[...]
        best = v.max(axis=1)
        cand = jnp.where(v == best[:, None], col_scr[...],
                         jnp.int32(2**31 - 1))
        idx_ref[...] = cand.min(axis=1, keepdims=True)


def pack_lm_head(kernel_q, kernel_scale, input_scale=None, eos_ids=(),
                 block_n: int = 2048):
    """Pad the (D, V) int8 lm_head to a block_n-multiple vocab and build the
    kernel's bias vectors. Done ONCE at engine init (inside the decode scan
    a pad would recopy the 150 MB weight every step).

    Returns dict {q, scale, inv_input, pad_bias, eos_bias} of device arrays.
    """
    d, v = kernel_q.shape
    bn = int(block_n)
    while bn > 128 and bn > v:  # tiny test vocabs: shrink to the 128 floor
        bn //= 2
    vp = int(np.ceil(v / bn) * bn)
    q = jnp.asarray(kernel_q, jnp.int8)
    if vp > v:
        q = jnp.pad(q, ((0, 0), (0, vp - v)))
    # retile (D, Vp) -> (Vp/bn, D, bn): each grid step's weight block is
    # CONTIGUOUS in HBM. Column tiles of the flat layout are 2 KB strided
    # runs (one per row) — measured 160 GB/s effective stream vs the
    # ~800 GB/s a contiguous block DMA sustains.
    q = q.reshape(d, vp // bn, bn).transpose(1, 0, 2)
    scale = jnp.pad(jnp.asarray(kernel_scale, jnp.float32), (0, vp - v),
                    constant_values=1.0)
    pad_bias = np.zeros(vp, np.float32)
    pad_bias[v:] = _NEG
    eos_bias = np.zeros(vp, np.float32)
    for e in eos_ids:
        if 0 <= int(e) < v:
            eos_bias[int(e)] = _NEG
    inv_input = (1.0 / jnp.asarray(input_scale, jnp.float32)
                 if input_scale is not None else jnp.ones(d, jnp.float32))
    return {"q": q, "scale": scale, "inv_input": inv_input,
            "pad_bias": jnp.asarray(pad_bias), "eos_bias": jnp.asarray(eos_bias),
            "block_n": bn, "vocab": v}


def fused_lm_sample(x, pack, blocked, seed2, *, temperature: float,
                    noise: bool, interpret=None):
    """x (B, D) float hidden; pack from pack_lm_head; blocked (B,) f32
    (1.0 = EOS masked for that row); seed2 (2,) int32 PRNG seed (ignored
    when noise=False). Returns (B,) int32 sampled token ids.

    Matches QDense w8a8 lm_head semantics exactly: x / input_scale ->
    per-row absmax s8 -> s8xs8 dot -> sx * kernel_scale epilogue
    (models/t5.py QDense), then sample_logits' masking order.
    """
    from thinkdiff_tpu.ops.quant import _absmax_quant_rows

    if interpret is None:
        interpret = INTERPRET
    b, d = x.shape
    q, scale = pack["q"], pack["scale"]
    # shapes derive STATICALLY from the tiled (nB, D, bN) weight (the pack
    # dict may pass through a jit boundary, where its int entries are
    # tracers — the engine passes the pack as an ARGUMENT so the 150 MB
    # int8 table is a runtime buffer, not a compile-payload constant)
    nb, _, bn = q.shape
    vp = nb * bn
    inv_temp = 1.0 / temperature if (noise and temperature > 0) else 1.0
    xs = x.astype(jnp.float32) * pack["inv_input"][None]
    xq, sx = _absmax_quant_rows(xs)
    grid = (vp // bn,)
    idx = pl.pallas_call(
        functools.partial(_fused_sample_kernel, num_j=grid[0],
                          inv_temp=inv_temp, noise=noise),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, bn), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 1), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, 128), jnp.float32),
                        pltpu.VMEM((b, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * vp,
            bytes_accessed=d * vp + b * d + b * 4,
            transcendentals=2 * b * vp if noise else 0,
        ),
        interpret=interpret,
    )(jnp.asarray(seed2, jnp.int32), xq, sx.reshape(1, -1), q,
      scale.reshape(1, -1), pack["pad_bias"].reshape(1, -1),
      pack["eos_bias"].reshape(1, -1),
      blocked.astype(jnp.float32).reshape(1, -1))
    return idx[:, 0]
