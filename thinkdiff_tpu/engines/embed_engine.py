"""Qwen2-VL generation engine: the TPU-native replacement for the
reference's forked vLLM (reference: thinkdiff/models/mllama_vllm_generate_1.py
:382-417 — ``LLM(..., return_hidden_states=True)`` + SamplingParams).

Pipeline per batch:
  host:   smart-resize (PIL, uint8 out), chat-template tokenize, M-RoPE
          position ids
  device: normalize + patchify (HF processor-compatible ordering) -> vision
          tower over concatenated patches -> prefill (causal, padded
          static shapes, KV cache write) -> lax.scan decode with temp/top_p
          sampling -> final-RMSNorm hidden tap for BOTH prompt and generated
          tokens (the ``model.norm`` embeddings the aligner trains on)

Static shapes everywhere: prompts pad to ``max_prompt_len`` buckets, decode
always runs ``max_tokens`` steps (EOS handled by post-trim + logit masking
for min_tokens). The eval configs (min=max=128, ignore_eos — reference
configs/test_thinkdiff_lvlm_ccsbu_image_text.yaml:30-32) make this exact.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.models.qwen2_vl import (
    Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower, convert_qwen2_vl,
    get_mrope_position_ids, vision_cos_sin, vision_rot_pos_emb,
)

logger = logging.getLogger(__name__)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

DEFAULT_SYSTEM = "You are a helpful assistant."


def render_chat_prompt(system_prompt: str, text: str, n_images: int,
                       fmt: str = "qwen2_vl") -> str:
    """Chat template string for one user turn with ``n_images`` leading
    images. ``fmt='qwen2_vl'`` MUST byte-match HF
    ``tokenizer.apply_chat_template`` (tested in tests/test_goldens.py
    against real tokenizer files when available) because the reference's
    vLLM fork tokenizes exactly this (mllama_vllm_generate_1.py:382-417)
    and the aligner's ``input_no_system`` offset arithmetic counts tokens
    of this rendering.

    The other branches mirror the reference's per-VLM message shapes
    (mllama_vllm_generate_1.py:550-574): ``internvl`` = single user turn
    with ``<image>\\n`` before the prompt and NO system turn; ``generic``
    = single user turn of [image, text] with NO system turn. They are
    rendered in the serving tokenizer's chat markup (the engine runs
    Qwen2-VL-family models) — what they preserve from the reference is
    the message structure: system-turn presence and image/text layout."""
    vision_parts = "".join(
        "<|vision_start|><|image_pad|><|vision_end|>" for _ in range(n_images)
    )
    if fmt == "internvl":
        return (
            f"<|im_start|>user\n{vision_parts}\n{text}<|im_end|>\n"
            f"<|im_start|>assistant\n"
        )
    if fmt == "generic":
        return (
            f"<|im_start|>user\n{vision_parts}{text}<|im_end|>\n"
            f"<|im_start|>assistant\n"
        )
    return (
        f"<|im_start|>system\n{system_prompt}<|im_end|>\n"
        f"<|im_start|>user\n{vision_parts}{text}<|im_end|>\n"
        f"<|im_start|>assistant\n"
    )


# model-id -> prompt format, per the reference's branch conditions
# (mllama_vllm_generate_1.py:550-574: exact Qwen2-VL id list; "InternVL"
# substring; everything else generic)
_QWEN2_VL_IDS = ("Qwen2-VL-2B-Instruct", "Qwen2-VL-7B-Instruct",
                 "Qwen2-VL-72B-Instruct")
# llava ids whose generations carry a leading space the reference strips
# (mllama_vllm_generate_1.py:606-609)
_LLAVA_LEADING_SPACE_IDS = ("llava-v1.6-mistral-7b-hf", "llava-1.5-7b-hf")


def prompt_format_for_model(model_id: str) -> str:
    if any(q in str(model_id) for q in _QWEN2_VL_IDS):
        return "qwen2_vl"
    if "InternVL" in str(model_id):
        return "internvl"
    return "generic"


# ---------------------------------------------------------------------------
# Host-side image preprocessing (HF Qwen2VLImageProcessor semantics)
# ---------------------------------------------------------------------------

def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280
                 ) -> Tuple[int, int]:
    """Resize target dims: multiples of ``factor`` within the pixel budget."""
    if height < factor or width < factor:
        scale = factor / min(height, width)
        height, width = math.ceil(height * scale), math.ceil(width * scale)
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return max(h_bar, factor), max(w_bar, factor)


def resize_image_uint8(image, factor: int = 28, min_pixels: int = 56 * 56,
                       max_pixels: int = 12845056
                       ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """PIL/array image -> (uint8 (H, W, 3) smart-resized RGB, (H, W)).

    The host's ONLY vision work: PIL bicubic resize. Everything after
    (normalize, temporal tile, patchify) runs on device over the raw uint8
    bytes — 8x fewer host->device bytes than f32 patches (no x4 f32, no x2
    temporal duplication), which matters both over the dev tunnel
    (~43 MB/s measured) and on production PCIe hosts."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    image = image.convert("RGB")
    h_bar, w_bar = smart_resize(image.height, image.width, factor,
                                min_pixels, max_pixels)
    image = image.resize((w_bar, h_bar), Image.BICUBIC)
    return np.asarray(image, np.uint8), (h_bar, w_bar)


def patchify_normalize(imgs, patch_size: int = 14, merge: int = 2,
                       temporal: int = 2) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> f32 patches (B, N, C*T*P*P), on device.

    Exactly the HF Qwen2VLImageProcessor math (f32 scale + CLIP-mean/std
    normalize, frame duplicated over the temporal patch dim, patch vector
    ordering (C, T, Ph, Pw), sequence ordering (t, H/m, W/m, m, m)) so
    converted conv weights apply directly; parity with the host reference
    path is tested (tests/test_embed_engine.py)."""
    b, h_bar, w_bar, _ = imgs.shape
    x = imgs.astype(jnp.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD                            # (B, H, W, C)
    x = x.transpose(0, 3, 1, 2)                               # (B, C, H, W)
    x = jnp.tile(x[:, None], (1, temporal, 1, 1, 1))          # (B, T, C, H, W)

    grid_t = 1
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    p = patch_size
    x = x.reshape(
        b, grid_t, temporal, 3,
        grid_h // merge, merge, p,
        grid_w // merge, merge, p,
    )
    x = x.transpose(0, 1, 4, 7, 5, 8, 3, 2, 6, 9)
    return x.reshape(b, grid_t * grid_h * grid_w, 3 * temporal * p * p)


def preprocess_image(image, patch_size: int = 14, merge: int = 2,
                     temporal: int = 2, min_pixels: int = 56 * 56,
                     max_pixels: int = 12845056
                     ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """PIL/array image -> (patches (N, C*T*P*P), grid (t, h, w)).

    Host-side reference path (numpy) — the engine's serving path uploads
    uint8 pixels and patchifies on device (resize_image_uint8 +
    patchify_normalize); this function remains the numerics oracle and
    the entry for host-side callers/tests.
    """
    arr, (h_bar, w_bar) = resize_image_uint8(
        image, patch_size * merge, min_pixels, max_pixels)
    arr = arr.astype(np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD                       # (H, W, C)
    arr = arr.transpose(2, 0, 1)                              # (C, H, W)
    arr = np.tile(arr[None], (temporal, 1, 1, 1))             # (T, C, H, W)

    grid_t = 1
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    p = patch_size
    patches = arr.reshape(
        grid_t, temporal, 3,
        grid_h // merge, merge, p,
        grid_w // merge, merge, p,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = patches.reshape(grid_t * grid_h * grid_w, 3 * temporal * p * p)
    return patches.astype(np.float32), (grid_t, grid_h, grid_w)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def sample_logits(rng, logits, temperature: float, top_p: float,
                  top_k_prefilter: int = 64):
    """(B, V) logits -> (B,) token ids, temperature + nucleus sampling.

    Nucleus runs over a top-k prefilter (vLLM-style): a full 152k-vocab sort
    per step is far more expensive on TPU than top_k. Prefilter size is a
    decode-latency knob: on one v5e chip at (64, 152k) f32, lax.top_k costs
    10.9 ms at k=1024 but 2.9 ms at k=64 (argmax, the floor for any full-V
    pass, is 2.5 ms) — at the serving temp 0.6 the top_p=0.9 nucleus is a
    few dozen tokens (tests/test_embed_engine.py truncation-mass analysis
    gates k=64 at the real 152k vocab), so the engine defaults to 64 and
    only near-flat adversarial tails — already truncated at 1024 — see a
    different (smaller) keep set.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_p >= 1.0:
        return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
    k = min(top_k_prefilter, logits.shape[-1])
    top_vals, top_idx = jax.lax.top_k(logits, k)          # sorted desc
    probs = jax.nn.softmax(top_vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < top_p                            # always keeps top-1
    masked = jnp.where(keep, top_vals, -jnp.inf)
    choice = jax.random.categorical(rng, masked, axis=-1)
    return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


@dataclasses.dataclass
class GenerationResult:
    """Mirror of the reference's vLLM output consumption
    (mllama_vllm_generate_1.py:591-617). Hidden-state arrays are
    ml_dtypes.bfloat16 — the dtype the reference's vLLM fork returns
    (torch bf16) and what its precompute .pth shards store; keeping it
    end-to-end avoids host bf16->f32 casts (~13 M elem/s on a 1-vCPU
    host — seconds per serving iteration)."""

    texts: List[str]
    prompt_token_ids: List[List[int]]
    output_token_ids: List[List[int]]
    prompt_hidden_states: List[np.ndarray]   # (prompt_len, D) each, bf16
    hidden_states: List[np.ndarray]          # (gen_len, D) each, bf16
    input_prompts: List[str]


class _HostHidden:
    """Lazy device->host view of hidden-state buffers. The transfer is
    STARTED immediately (copy_to_host_async) but materialization waits
    until a consumer needs numpy — so the ~100 MB/iteration of prefill +
    decode hidden d2h streams over the tunnel WHILE the next decode chunk
    or refill computes, instead of serializing the serving loop (measured
    ~180 ms/decode-chunk + ~1 s/refill of pure blocked transfer at the
    64-slot operating point). Parts with a leading batch row dim can be
    indexed before resolve()."""

    __slots__ = ("parts", "axis", "_np")

    def __init__(self, parts, axis=1):
        for p in parts:
            if hasattr(p, "copy_to_host_async"):
                p.copy_to_host_async()
        self.parts = parts
        self.axis = axis
        self._np = None

    def resolve(self) -> np.ndarray:
        if self._np is None:
            ps = [np.asarray(p) for p in self.parts]
            self._np = ps[0] if len(ps) == 1 else np.concatenate(
                ps, axis=self.axis)
            self.parts = None  # release device refs
        return self._np


class EmbedEngine:
    def __init__(self, cfg: Qwen2VLConfig, params: Dict[str, Any],
                 tokenizer=None, *, max_prompt_len: int = 1024,
                 max_tokens: int = 256, min_tokens: int = 1,
                 temperature: float = 0.6, top_p: float = 0.9,
                 ignore_eos: bool = False, eos_ids: Sequence[int] = (),
                 system_prompt: str = DEFAULT_SYSTEM,
                 min_pixels: int = 56 * 56, max_pixels: int = 12845056,
                 limit_images_per_prompt: Optional[int] = None, mesh=None,
                 max_num_seqs: int = 16, kv_page_size: int = 64,
                 vision_batch: int = 32,
                 prefill_chunk: Optional[int] = None,
                 prompt_format: str = "qwen2_vl",
                 top_k_prefilter: int = 64,
                 preadmit_wave: int = 0,
                 eos_lag: int = 0,
                 sampler: str = "exact"):
        from thinkdiff_tpu.core.distributed import enable_compilation_cache

        # serving cold-start: persist compiled executables across engine
        # processes (~8 min of prefill/decode/vision compiles otherwise)
        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # Multi-chip serving: weights sharded by the PartitionSpec rules
            # (tensor parallel over `model`, ZeRO-style over `fsdp`); batch
            # dims shard over `data` implicitly through GSPMD propagation.
            from thinkdiff_tpu.parallel.sharding import shard_params

            params = {k: shard_params(v, mesh) for k, v in params.items()}
        self.params = params
        self.tokenizer = tokenizer
        self.max_prompt_len = max_prompt_len
        self.max_tokens = max_tokens
        self.min_tokens = min_tokens
        self.temperature = temperature
        self.top_p = top_p
        # nucleus prefilter width (see sample_logits): 64 saves ~8 ms/step
        # at the 64-slot/152k-vocab serving point vs the old 1024 default
        self.top_k_prefilter = int(top_k_prefilter)
        # 'exact' = lm_head logits + temperature/top_p nucleus
        # (sample_logits, the vLLM-parity default); 'gumbel' = fused
        # lm_head+Gumbel-max Pallas kernel (ops/fused_sample) — full-softmax
        # temperature sampling, no top_p truncation, logits never
        # materialized (~2.6 ms/step cheaper at the 64-slot/152k point).
        # Requires w8a8 LM quant + a real TPU; falls back to exact.
        self.sampler = str(sampler)
        self.ignore_eos = ignore_eos
        self.eos_ids = list(eos_ids)
        self.system_prompt = system_prompt
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.limit_images_per_prompt = limit_images_per_prompt
        # scheduler scale: the reference serves max_num_seqs: 256 through
        # vLLM (configs/qwen2_vl_embed_ccsbu.yaml:30); above ~32 slots the
        # engine switches to the paged KV pool (ops/paged_attention.py)
        self.max_num_seqs = max_num_seqs
        self.kv_page_size = kv_page_size
        self.vision_batch = max(1, int(vision_batch))
        # chunked prefill (vLLM enable_chunked_prefill analog): process
        # prompts in fixed (B, C) sequence chunks against the KV cache
        # instead of one power-of-2-bucketed pass. One compiled shape
        # serves every fill/refill regardless of prompt mix, and padded
        # tokens drop from pow2(bucket) to ceil(L/C)*C. Power of two so
        # chunk multiples divide the prompt buckets used by the paged
        # page-commit path.
        if prefill_chunk is not None:
            prefill_chunk = int(prefill_chunk)
            if prefill_chunk < 64 or prefill_chunk & (prefill_chunk - 1):
                raise ValueError(
                    "prefill_chunk must be a power of two >= 64")
        self.prefill_chunk = prefill_chunk
        # prefill-ahead (paged only): pre-prefill up to `preadmit_wave`
        # queued requests into spare KV pages at full-row geometry while
        # decode runs, so a refill is a page-table update instead of a
        # rows<=16 device prefill (87 vs 164 TF/s at the serving point —
        # scripts/bench_prefill_micro). 0 = off (admit-on-free).
        self.preadmit_wave = int(preadmit_wave or 0)
        # pipelined EOS accounting (paged, value-reading workloads): resolve
        # chunk c's tokens only after chunk c+eos_lag is dispatched, so the
        # token sync overlaps device compute instead of stalling dispatch.
        # EOS is detected up to eos_lag chunks late (outputs still cut
        # exactly); greedy streams are bit-identical to eos_lag=0.
        self.eos_lag = int(eos_lag or 0)
        self.prompt_format = prompt_format
        self.vision = Qwen2VisionTower(cfg.vision)
        self.lm = Qwen2VLModel(cfg)
        self._prefill_fn = None
        self._chunk_prefill_fn = None
        self._first_fn = None
        self._decode_fn = None
        self._vision_fn = None
        self._gather_fn = None
        self._img_bank = None  # device-resident (rows, hidden) from _prepare
        self.num_system_tokens = self._count_system_tokens()

    # -- construction -------------------------------------------------------
    @classmethod
    def from_config(cls, model_cfg: ConfigNode) -> "EmbedEngine":
        from thinkdiff_tpu.models.base import maybe_load_hf_weights, str_to_dtype

        path = model_cfg.get("mllama_pretrained_model_name_or_path",
                             "Qwen/Qwen2-VL-2B-Instruct")
        dtype = str_to_dtype(model_cfg.get("dtype", "bfloat16"))
        vcfg_early = model_cfg.get("vllm_config", {}) or {}
        # quantization: int8 (weight-only) | int8_dyn (w8a8 s8xs8 dots).
        # With fused projection groups (round 3) int8 decode is 1.57x
        # FASTER than bf16 and w8a8 is the measured serving optimum
        # (PERF.md round-4 ladder); the precompute config ships int8_dyn.
        # Also the 7B-on-one-16GB-chip capacity option.
        qname = str(vcfg_early.get("quantization", "")).lower()
        quant = {"int8": True, "int8_dyn": "w8a8", "w8a8": "w8a8"}.get(
            qname, False)
        # fused qkv/gate_up: default ON for quantized decode (the round-2
        # int8-decode regression was dispatch-bound thin dots; fusing cuts
        # per-layer projections 7 -> 4); overridable via vllm_config
        fused = bool(vcfg_early.get("fused_proj", bool(quant)))
        # vision-tower quant is a separate knob; int8 measured 42 -> 76
        # TF/s on the tower (scripts/bench_prefill_micro) = +9% engine
        # imgs/s, quality-gated at the hidden tap on golden weights
        # (tests/test_quant_quality.py). The precompute config ships int8.
        vqname = str(vcfg_early.get("vision_quantization", "")).lower()
        vquant = {"int8": True, "int8_dyn": "w8a8", "w8a8": "w8a8"}.get(
            vqname, False)
        if "7B" in str(path):
            cfg = Qwen2VLConfig.qwen2_vl_7b(dtype=dtype, quant_int8=quant,
                                            fused_proj=fused,
                                            vision_quant=vquant)
        else:
            cfg = Qwen2VLConfig.qwen2_vl_2b(dtype=dtype, quant_int8=quant,
                                            fused_proj=fused,
                                            vision_quant=vquant)
        sd = maybe_load_hf_weights(path)
        if sd is None:
            raise FileNotFoundError(
                f"Qwen2-VL weights for '{path}' not found locally; "
                "the engine cannot random-init a useful VLM."
            )
        params = convert_qwen2_vl(sd, dtype=np.dtype(jnp.bfloat16)
                                  if dtype == jnp.bfloat16 else None)
        if quant or vquant:
            from thinkdiff_tpu.ops.quant import quantize_tree

            if quant:
                params["lm"] = quantize_tree(params["lm"], min_size=0,
                                             w8a8=quant == "w8a8")
            if vquant:
                params["vision"] = quantize_tree(params["vision"], min_size=0,
                                                 w8a8=vquant == "w8a8")
        if fused:
            from thinkdiff_tpu.models.qwen2_vl import fuse_qwen2_params

            params["lm"] = fuse_qwen2_params(params["lm"])
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(path, local_files_only=True)
        vcfg = model_cfg.get("vllm_config", {}) or {}
        eos = [tokenizer.eos_token_id]
        im_end = tokenizer.convert_tokens_to_ids("<|im_end|>")
        if im_end is not None and im_end not in eos:
            eos.append(im_end)
        limit_mm = vcfg.get("limit_mm_per_prompt", None)
        if isinstance(limit_mm, dict):
            limit_mm = limit_mm.get("image")
        return cls(
            cfg, params, tokenizer,
            max_prompt_len=min(int(vcfg.get("max_model_len", 8192)), 8192),
            max_tokens=int(vcfg.get("max_tokens", 256)),
            min_tokens=int(vcfg.get("min_tokens", 1)),
            temperature=float(vcfg.get("temperature", 0.6)),
            top_p=float(vcfg.get("top_p", 0.9)),
            ignore_eos=bool(vcfg.get("ignore_eos", False)),
            eos_ids=eos,
            limit_images_per_prompt=limit_mm,
            max_num_seqs=int(vcfg.get("max_num_seqs", 16)),
            kv_page_size=int(vcfg.get("kv_page_size",
                                      vcfg.get("block_size", 64))),
            vision_batch=int(vcfg.get("vision_batch", 32)),
            top_k_prefilter=int(vcfg.get("top_k_prefilter", 64)),
            preadmit_wave=int(vcfg.get("preadmit_wave", 0)),
            eos_lag=int(vcfg.get("eos_lag", 0)),
            sampler=str(vcfg.get("sampler", "exact")),
            # vLLM flag name honored; explicit prefill_chunk sets the chunk
            # (0/None/absent = bucketed one-shot prefill)
            prefill_chunk=(int(vcfg.get("prefill_chunk") or 0)
                           or (256 if bool(vcfg.get("enable_chunked_prefill",
                                                    False)) else None)
                           or None),
            # per-VLM message shape (reference branches on mllama_model_id,
            # mllama_vllm_generate_1.py:550-574); explicit knob wins
            prompt_format=str(
                vcfg.get("prompt_format", "")
                or model_cfg.get("prompt_format", "")
                or prompt_format_for_model(
                    model_cfg.get("mllama_model_id", path))),
        )

    # -- prompt building ----------------------------------------------------
    def _count_system_tokens(self) -> int:
        """Tokens to skip for input_no_system — the reference's hardcoded
        ``[14:]`` (mllama_vllm_t5_embed_decoder_2.py:1107-1109).

        The 14 decomposes over the Qwen2 tokenizer as the ENTIRE prefix
        before the user content: ``<|im_start|>system\\n`` (3) + "You are a
        helpful assistant." (6) + ``<|im_end|>\\n`` (2) + the user-turn
        header ``<|im_start|>user\\n`` (3). Counting only the system turn
        (11) would leave the user-turn header in the "no system" embedding,
        silently offsetting every vision token by 3. Computed from the live
        tokenizer so a different system prompt stays correct."""
        if self.tokenizer is None or self.prompt_format != "qwen2_vl":
            return 0  # internvl/generic renderings carry no system turn
        text = (f"<|im_start|>system\n{self.system_prompt}<|im_end|>\n"
                f"<|im_start|>user\n")
        return len(self.tokenizer.encode(text, add_special_tokens=False))

    def tokenize_prompt(self, prompt: str,
                        image_token_counts: Sequence[int]) -> List[int]:
        """Tokenize an already-rendered prompt string, expanding each
        <|image_pad|> to its per-image token count. The raw-prompt entry
        point for pre-formatted inputs (the reference's vLLM accepts
        ``{"prompt": ...}`` dicts directly when callers skip processing —
        mllama_vllm_t5_embed_decoder_2.py:1185-1190 ``need_process=False``)."""
        ids = self.tokenizer.encode(prompt, add_special_tokens=False)
        pad_id = self.cfg.image_token_id
        out: List[int] = []
        img_i = 0
        for tid in ids:
            if tid == pad_id:
                out.extend([pad_id] * image_token_counts[img_i])
                img_i += 1
            else:
                out.append(tid)
        return out

    def build_prompt(self, text: str, n_images: int,
                     image_token_counts: Sequence[int]) -> Tuple[str, List[int]]:
        """Qwen2-VL chat template with expanded image pads. Returns
        (prompt_text, token_ids)."""
        prompt = render_chat_prompt(self.system_prompt, text, n_images,
                                    fmt=self.prompt_format)
        return prompt, self.tokenize_prompt(prompt, image_token_counts)

    # -- jitted device functions --------------------------------------------
    def _get_vision_fn(self):
        if self._vision_fn is None:
            vcfg = self.cfg.vision

            @jax.jit
            def run(params, imgs_u8, cos, sin, bias):
                # uint8 pixels in; normalize + temporal-tile + patchify +
                # bf16 cast all on DEVICE. 8x fewer h->d bytes than f32
                # patches, and the host does nothing but the PIL resize
                # (a host-side ml_dtypes bf16 cast measured ~1 M elem/s;
                # even the f32 normalize/transpose was seconds per group
                # on a 1-vCPU host).
                patches = patchify_normalize(
                    imgs_u8, vcfg.patch_size, vcfg.spatial_merge_size,
                    vcfg.temporal_patch_size)
                patches = patches.astype(vcfg.dtype)
                return self.vision.apply({"params": params}, patches, cos,
                                         sin, bias)

            self._vision_fn = run
        return self._vision_fn

    def _get_prefill_fn(self):
        """Prefill + FIRST-token sampling fused on device. Only the sampled
        token, bf16 hidden states and the caches leave the device — never
        full-sequence logits (a (B, T, 152k) f32 device->host transfer over
        the tunnel was the dominant cost of the naive formulation)."""
        if self._prefill_fn is None:
            sample_first = self._make_first_sampler()

            @functools.partial(jax.jit, donate_argnums=(6,))
            def prefill(params, input_ids, position_ids, mask, image_embeds,
                        image_mask, caches, last_idx, rng):
                b = input_ids.shape[0]
                _, hidden, caches = self.lm.apply(
                    {"params": params}, input_ids=input_ids,
                    position_ids=position_ids, mask=mask,
                    image_embeds=image_embeds, image_mask=image_mask,
                    caches=caches,
                    cache_len=jnp.zeros((b,), jnp.int32),
                    compute_logits=False,
                )
                last_hidden = hidden[jnp.arange(b), last_idx]
                last_logits = self.lm.apply(
                    {"params": params}, last_hidden, method=self.lm.logits
                )
                first = sample_first(last_logits, rng)
                return first, hidden.astype(jnp.bfloat16), caches

            self._prefill_fn = prefill
        return self._prefill_fn

    def _make_first_sampler(self):
        """Shared first-token epilogue (EOS blocking for min_tokens +
        temp/top_p sampling) — ONE policy for the fused one-shot prefill
        and the chunked-prefill tail, so a min_tokens/EOS change cannot
        silently diverge the two paths."""
        temperature, top_p = self.temperature, self.top_p
        top_k_pref = self.top_k_prefilter
        block_first_eos = (not self.ignore_eos) and self.min_tokens > 1
        eos_arr = jnp.asarray(
            self.eos_ids if self.eos_ids else [-1], jnp.int32
        )

        def sample_first(logits, rng):
            if block_first_eos:
                logits = jnp.where(
                    jnp.isin(jnp.arange(logits.shape[-1]), eos_arr)[None],
                    -jnp.inf, logits.astype(jnp.float32),
                )
            return sample_logits(rng, logits, temperature, top_p,
                                 top_k_prefilter=top_k_pref)

        return sample_first

    def _get_chunk_prefill_fn(self):
        """One prefill CHUNK: run (B, C) tokens against the dense caches at
        write offset ``base`` (absolute positions base..base+C-1). ``window``
        is the STATIC attention read bound (grows in 256 buckets across
        chunks). ``last_acc`` accumulates each row's last-prompt-token hidden
        state ON DEVICE (rows whose ``last_idx`` falls in this chunk update),
        so first-token sampling never waits on the host hidden transfer.
        Returns (hidden bf16 (B, C, D), caches, last_acc)."""
        if self._chunk_prefill_fn is None:
            @functools.partial(jax.jit, donate_argnums=(5, 7),
                               static_argnums=(9,))
            def chunk_prefill(params, input_ids, position_ids, image_embeds,
                              image_mask, caches, base, last_acc, last_idx,
                              window):
                # cache_len = base for the KV write; the model's cached-path
                # attention uses limit = (base + C) - C + i + 1 = base+i+1,
                # i.e. exact causality at absolute position base+i.
                b, c = input_ids.shape
                _, hidden, caches = self.lm.apply(
                    {"params": params}, input_ids=input_ids,
                    position_ids=position_ids,
                    image_embeds=image_embeds, image_mask=image_mask,
                    caches=caches, cache_len=base,
                    attn_window=window, compute_logits=False,
                )
                rel = last_idx - base
                rows = hidden[jnp.arange(b), jnp.clip(rel, 0, c - 1)]
                last_acc = jnp.where(
                    ((rel >= 0) & (rel < c))[:, None],
                    rows.astype(last_acc.dtype), last_acc)
                return hidden.astype(jnp.bfloat16), caches, last_acc

            self._chunk_prefill_fn = chunk_prefill
        return self._chunk_prefill_fn

    def _get_first_fn(self):
        """logits + first-token sampling from the last prompt hidden state
        (the chunked-prefill tail of _get_prefill_fn's fused epilogue).
        In gumbel mode the fused lm_head+sample kernel serves the FIRST
        token too, so every sampled token in a stream draws from the same
        (full-softmax) family."""
        if self._first_fn is None:
            if self._fused_sampler_pack() is not None:
                from thinkdiff_tpu.ops.fused_sample import fused_lm_sample

                block_first = float((not self.ignore_eos)
                                    and self.min_tokens > 1)
                temperature = self.temperature

                @jax.jit
                def first_fn(params, last_hidden, rng, lm_pack):
                    # lm_pack rides as an ARGUMENT: closing over it would
                    # embed the 150 MB int8 table in the compile payload
                    b = last_hidden.shape[0]
                    blocked = jnp.full((b,), block_first, jnp.float32)
                    seed2 = jax.lax.bitcast_convert_type(rng, jnp.int32)
                    return fused_lm_sample(
                        last_hidden.astype(self.cfg.dtype), lm_pack,
                        blocked, seed2, temperature=temperature,
                        noise=temperature > 0)

                self._first_fn = first_fn
                return self._first_fn
            sample_first = self._make_first_sampler()

            @jax.jit
            def first_fn(params, last_hidden, rng, lm_pack=None):
                logits = self.lm.apply(
                    {"params": params}, last_hidden.astype(self.cfg.dtype),
                    method=self.lm.logits,
                )
                return sample_first(logits, rng)

            self._first_fn = first_fn
        return self._first_fn

    def _get_decode_fn(self, max_steps: int, min_tokens: int,
                       temperature: float, top_p: float):
        # Memoize per sampling config — a fresh closure per call would create
        # a new jit cache entry and re-trace/re-compile the whole decode scan
        # on EVERY generate() (measured ~13 s/call of pure retrace).
        if self._decode_fn is None:
            self._decode_fn = {}
        cache_key = (max_steps, min_tokens, temperature, top_p)
        if cache_key in self._decode_fn:
            return self._decode_fn[cache_key]
        eos_arr = jnp.asarray(
            self.eos_ids if self.eos_ids else [-1], jnp.int32
        )
        ignore_eos = self.ignore_eos
        top_k_pref = self.top_k_prefilter

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode(params, caches, first_tokens, start_pos, prompt_len, rng):
            """first_tokens (B,); start_pos (B,) = prompt_len + delta;
            prompt_len (B,) = true prompt lengths (cache write offset)."""

            def step(carry, i):
                caches, tokens, cache_len, pos, rng = carry
                rng, sub = jax.random.split(rng)
                pos3 = jnp.broadcast_to(pos[None, :, None], (3, pos.shape[0], 1))
                _, hidden, caches = self.lm.apply(
                    {"params": params}, input_ids=tokens[:, None],
                    position_ids=pos3, caches=caches, cache_len=cache_len,
                    compute_logits=False,
                )
                logits_last = self.lm.apply(
                    {"params": params}, hidden[:, 0], method=self.lm.logits
                )
                if not ignore_eos:
                    block_eos = i < min_tokens - 1
                    logits_last = jnp.where(
                        jnp.logical_and(
                            block_eos,
                            jnp.isin(
                                jnp.arange(logits_last.shape[-1]), eos_arr
                            )[None],
                        ),
                        -jnp.inf, logits_last,
                    )
                nxt = sample_logits(sub, logits_last, temperature, top_p,
                                    top_k_prefilter=top_k_pref)
                return (
                    (caches, nxt, cache_len + 1, pos + 1, rng),
                    (nxt, hidden[:, 0].astype(jnp.bfloat16)),
                )

            init = (caches, first_tokens, prompt_len, start_pos, rng)
            (_, _, _, _, _), (tokens, hiddens) = jax.lax.scan(
                step, init, jnp.arange(max_steps)
            )
            # tokens: (steps, B); hiddens: (steps, B, D)
            return tokens.T, hiddens.transpose(1, 0, 2)

        self._decode_fn[cache_key] = decode
        return decode

    # -- request preparation --------------------------------------------------
    def _prepare(self, texts, images_per_sample, raw: bool = False):
        """Vision passes (grouped by grid) + prompts + M-RoPE positions.

        Returns a list of per-request dicts: {prompt, ids, pos, delta,
        img_bank_rows, img_local_idx} and sets ``self._img_bank`` — image
        embeddings stay ON DEVICE as one (total_rows, hidden) bank; prompts
        reference bank rows by index and prefill gathers them device-side.
        (Round 3 round-tripped every embedding host->device twice: a ~200 MB
        d2h of vision outputs plus a mostly-zero (rows, bucket, hidden)
        h2d per refill — ~40% of serving wall time over the 35 MB/s
        tunnel.) Vision chunks are dispatched WITHOUT per-chunk syncs, so
        upload/compute of successive chunks overlap; the first prefill is
        the sync point. Wall-time of the host/device sub-phases (PIL
        resize, vision pack+dispatch, prompt build) is recorded in
        ``self._prepare_phases`` for the serving breakdown.
        """
        import time as _time

        _ph = {"resize": 0.0, "vision_pack": 0.0, "vision": 0.0,
               "prompt": 0.0}
        _t0 = _time.perf_counter()
        b = len(texts)
        merge = self.cfg.vision.spatial_merge_size
        all_pixels, all_grids = [], []
        per_sample_grids: List[List[Tuple[int, int, int]]] = []
        for img_entry in images_per_sample:
            # None -> text-only request (no vision pass, no image tokens);
            # the chat template renders zero vision parts for it
            if img_entry is None:
                imgs: Sequence[Any] = []
            elif isinstance(img_entry, (list, tuple)):
                imgs = img_entry
            else:
                imgs = [img_entry]
            if self.limit_images_per_prompt is not None:
                # vllm_config.limit_mm_per_prompt parity (reference
                # mllama_vllm_t5_embed_decoder_2.py:790-823)
                imgs = list(imgs)[: self.limit_images_per_prompt]
            grids = []
            for img in imgs:
                pixels, (h_bar, w_bar) = resize_image_uint8(
                    img, self.cfg.vision.patch_size * merge,
                    self.min_pixels, self.max_pixels,
                )
                grid = (1, h_bar // self.cfg.vision.patch_size,
                        w_bar // self.cfg.vision.patch_size)
                all_pixels.append(pixels)
                all_grids.append(grid)
                grids.append(grid)
            per_sample_grids.append(grids)
        if not images_per_sample:
            per_sample_grids = [[] for _ in range(b)]
        _ph["resize"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # Vision pass: group same-grid images onto the batch axis (one call
        # per distinct grid). NEVER concatenate sequences with a dense
        # (S_total, S_total) cross-image bias — for 8x 1024-patch images that
        # bias alone is 268 MB of host->device traffic.
        bank_start = np.zeros((len(all_pixels),), np.int64)
        bank_count = np.zeros((len(all_pixels),), np.int64)
        bank_parts: List[Any] = []
        bank_off = 0
        if all_pixels:
            groups: Dict[Tuple[int, int, int], List[int]] = {}
            for i, g in enumerate(all_grids):
                groups.setdefault(tuple(g), []).append(i)

            for grid, idxs in groups.items():
                pos_hw = vision_rot_pos_emb(np.asarray([grid], np.int64), merge)
                cos, sin = vision_cos_sin(pos_hw, self.cfg.vision.head_dim)
                # Cap images per vision launch: at serving request counts
                # (generate_many n=256) one unchunked call OOMs HBM on a
                # single v5e (256 x 1024-patch activations); chunking also
                # keeps one static compiled shape warm across refills.
                for lo in range(0, len(idxs), self.vision_batch):
                    part = idxs[lo: lo + self.vision_batch]
                    _tc0 = _time.perf_counter()
                    # raw uint8 pixel upload; normalize/patchify on device
                    batch_pixels = np.stack([all_pixels[i] for i in part])
                    _ph["vision_pack"] += _time.perf_counter() - _tc0
                    # NO sync here: successive chunk uploads/compute
                    # overlap; the first prefill blocks on the bank.
                    embeds = self._get_vision_fn()(
                        self.params["vision"], jnp.asarray(batch_pixels),
                        jnp.asarray(cos), jnp.asarray(sin), None,
                    )                                   # (B, S/m^2, hidden)
                    s_m = embeds.shape[1]
                    bank_parts.append(embeds.reshape(-1, embeds.shape[-1]))
                    for j, i in enumerate(part):
                        bank_start[i] = bank_off + j * s_m
                        bank_count[i] = s_m
                    bank_off += len(part) * s_m
        if bank_parts:
            bank = (bank_parts[0] if len(bank_parts) == 1
                    else jnp.concatenate(bank_parts, axis=0))
            # pow2-bucket the row count so the gather jit sees a stable
            # shape set (axon remote-compiles cost seconds even for takes)
            rows_pad = 1 << max(0, (bank.shape[0] - 1).bit_length())
            if rows_pad != bank.shape[0]:
                bank = jnp.pad(bank, ((0, rows_pad - bank.shape[0]), (0, 0)))
            img_bank = bank
        else:
            img_bank = jnp.zeros((1, self.cfg.hidden_size), self.cfg.dtype)
        _ph["vision"] = _time.perf_counter() - _t0 - _ph["vision_pack"]
        _t0 = _time.perf_counter()

        prepared = []
        img_i = 0
        for i in range(b):
            grids = per_sample_grids[i]
            counts = [t * h * w // (merge ** 2) for t, h, w in grids]
            if raw:
                # pre-formatted prompt: tokenize as-is (need_process=False)
                prompt = texts[i]
                ids = self.tokenize_prompt(prompt, counts)
            else:
                prompt, ids = self.build_prompt(texts[i], len(grids), counts)
            pos, delta = get_mrope_position_ids(
                np.asarray(ids), np.asarray(grids, np.int64).reshape(-1, 3),
                self.cfg.image_token_id, merge,
            )
            is_img = np.asarray(ids) == self.cfg.image_token_id
            img_bank_rows = None
            img_local_idx = None
            if is_img.any():
                n_img = len(grids)
                img_bank_rows = np.concatenate([
                    np.arange(bank_start[g], bank_start[g] + bank_count[g])
                    for g in range(img_i, img_i + n_img)
                ]).astype(np.int32)
                img_local_idx = np.nonzero(is_img)[0]
                img_i += n_img
            prepared.append(dict(prompt=prompt, ids=ids, pos=pos,
                                 delta=int(delta),
                                 img_bank_rows=img_bank_rows,
                                 img_local_idx=img_local_idx))
        _ph["prompt"] = _time.perf_counter() - _t0
        return prepared, img_bank, _ph

    def prepare_requests(self, samples: Dict[str, Any], raw: bool = None):
        """STREAMING ADMISSION: build a request batch's host+device inputs
        (PIL resize, vision-tower dispatch, prompt/M-RoPE build) WITHOUT
        touching engine serving state, so it can run in a worker thread
        while a previous batch is still decoding — the vLLM
        add_request/step split. Pass the result to ``generate_many(...,
        preprepared=...)``; greedy streams are identical to the
        synchronous path (same prepared inputs, same seeds). Host work
        (numpy/PIL) releases the GIL and the vision dispatches are async,
        so the overlap is real on one chip."""
        images_per_sample = samples.get("images", [])
        if raw is None:
            raw = bool(samples.get("raw_prompts"))
        texts = (samples.get("raw_prompts") or samples.get("answers")
                 or samples.get("prompts"))
        prepared, img_bank, phases = self._prepare(
            texts, images_per_sample, raw=raw)
        return {"prepared": prepared, "img_bank": img_bank,
                "phases": phases, "texts": texts}

    def _pack_prompt_buffers(self, prepared, rows, pad_to):
        """Host-side padded prompt buffers shared by both prefill paths.
        Returns (input_ids, mask, positions, img_gather, img_mask) with
        ``rows >= len(prepared)`` rows (extra bucket-padding rows stay
        zero). img_gather is an int32 row-index map into ``self._img_bank``
        — the dense (rows, pad_to, hidden) embedding buffer is gathered ON
        DEVICE by _gather_img_embeds, so the host uploads 4 bytes per
        position instead of a mostly-zero hidden-size row."""
        input_ids = np.zeros((rows, pad_to), np.int32)
        mask = np.zeros((rows, pad_to), np.int32)
        positions = np.zeros((3, rows, pad_to), np.int32)
        img_gather = np.zeros((rows, pad_to), np.int32)
        img_mask = np.zeros((rows, pad_to), np.int32)
        for i, p in enumerate(prepared):
            L = len(p["ids"])
            input_ids[i, :L] = p["ids"]
            mask[i, :L] = 1
            positions[:, i, :L] = p["pos"]
            if p["img_bank_rows"] is not None:
                img_gather[i, p["img_local_idx"]] = p["img_bank_rows"]
                img_mask[i, p["img_local_idx"]] = 1
        return input_ids, mask, positions, img_gather, img_mask

    def _gather_img_embeds(self, img_gather):
        """(rows, T) bank-row indices -> (rows, T, hidden) embeddings,
        gathered from the on-device bank (one jitted take; the masked-out
        positions read bank row 0 and are ignored via img_mask)."""
        if self._gather_fn is None:
            self._gather_fn = jax.jit(
                lambda bank, idx: jnp.take(bank, idx, axis=0))
        return self._gather_fn(self._img_bank, jnp.asarray(img_gather))

    def _prefill(self, prepared, max_tokens, rng, cache_size=None):
        """Padded-buffer prefill over a request list.

        Returns (first (m,), hidden np f32 (m, pad, D), caches, prompt_lens,
        last_idx np, start_pos np)."""
        if self.prefill_chunk:
            return self._prefill_chunked(prepared, max_tokens, rng,
                                         cache_size=cache_size)
        m = len(prepared)
        prompt_lens = [len(p["ids"]) for p in prepared]
        pad_to = 1 << max(6, (max(prompt_lens) - 1).bit_length())  # bucket
        pad_to = min(pad_to, self.max_prompt_len)
        assert max(prompt_lens) <= pad_to, "prompt exceeds max_prompt_len"
        cache_size = cache_size or (pad_to + max_tokens)

        input_ids, mask, positions, img_gather, img_mask = \
            self._pack_prompt_buffers(prepared, m, pad_to)

        hd = self.cfg.head_dim
        caches = [
            (jnp.zeros((m, self.cfg.num_kv_heads, cache_size, hd), self.cfg.dtype),
             jnp.zeros((m, self.cfg.num_kv_heads, cache_size, hd), self.cfg.dtype))
            for _ in range(self.cfg.num_layers)
        ]
        last_idx = np.asarray(prompt_lens) - 1
        first, hidden_dev, caches = self._get_prefill_fn()(
            self.params["lm"], jnp.asarray(input_ids),
            jnp.asarray(positions), jnp.asarray(mask),
            self._gather_img_embeds(img_gather), jnp.asarray(img_mask),
            caches, jnp.asarray(last_idx), rng,
        )
        # keep bf16 (host bf16->f32 casts are ~13 M elem/s on a 1-vCPU
        # host) and LAZY: the d2h streams behind subsequent device work
        hidden = _HostHidden([hidden_dev])
        start_pos = np.asarray(
            [prompt_lens[i] + prepared[i]["delta"] for i in range(m)],
            np.int32)
        return (first, hidden, caches, prompt_lens, last_idx, start_pos)

    def _prefill_chunked(self, prepared, max_tokens, rng, cache_size=None):
        """Chunked prefill: same contract as _prefill, but the prompt runs
        in fixed (m, C) sequence chunks against the caches (write offset
        k*C per chunk) instead of one bucketed pass. ceil(Lmax/C)*C padded
        tokens instead of pow2(Lmax), and every fill/refill reuses the one
        (m, C) compiled shape. vLLM's enable_chunked_prefill analog
        (reference serves via vLLM — mllama_vllm_generate_1.py:382-413).

        Correctness of the cache formulation: chunk k's queries sit at
        absolute positions kC+i; decode_attention's per-query limit with
        cache_len=kC and Tq=C is exactly kC+i+1 (strict causality). Rows
        whose prompt ended before kC write garbage KV at positions >= L,
        but any LATER chunk's valid queries exist only if chunk k was
        fully valid — and decode overwrites position L onward — so
        garbage keys are only ever attended by garbage queries.

        Sampling note: with temperature > 0 the first token is drawn over
        the m_pad-padded logits batch, so it is NOT bit-identical to the
        dense path under the same seed (the perf knob preserves the
        sampling distribution, not the draw); greedy decoding matches
        exactly (tested)."""
        m = len(prepared)
        # batch-size bucket: refill groups vary 1..slots per call and every
        # distinct m is a fresh 28-layer trace+compile (tens of seconds on
        # the axon tunnel); padding m to a power of two keeps the compiled
        # (m_pad, C) shape set logarithmic. Dummy rows cost one chunk's
        # FLOPs each and are sliced off everywhere below.
        m_pad = 1 << max(0, (m - 1).bit_length())
        prompt_lens = [len(p["ids"]) for p in prepared]
        bucket = 1 << max(6, (max(prompt_lens) - 1).bit_length())
        bucket = min(bucket, self.max_prompt_len)
        assert max(prompt_lens) <= bucket, "prompt exceeds max_prompt_len"
        cache_size = cache_size or (bucket + max_tokens)
        # the chunk grid is clamped to the pow2 bucket: when max_prompt_len
        # is not a multiple of C (bucket clamped to it), the LAST chunk
        # narrows to bucket - k*C instead of overrunning the cache (the
        # paged commit path sizes its page copies from the caller's bucket)
        c = min(self.prefill_chunk, bucket)
        n_chunks = -(-max(prompt_lens) // c)
        pad_to = min(n_chunks * c, bucket)
        assert pad_to <= cache_size

        input_ids, _, positions, img_gather, img_mask = \
            self._pack_prompt_buffers(prepared, m_pad, pad_to)

        hd = self.cfg.head_dim
        caches = [
            (jnp.zeros((m_pad, self.cfg.num_kv_heads, cache_size, hd),
                       self.cfg.dtype),
             jnp.zeros((m_pad, self.cfg.num_kv_heads, cache_size, hd),
                       self.cfg.dtype))
            for _ in range(self.cfg.num_layers)
        ]
        last_idx = np.asarray(prompt_lens) - 1
        last_idx_dev = jnp.zeros((m_pad,), jnp.int32).at[:m].set(
            jnp.asarray(last_idx, jnp.int32))
        last_acc = jnp.zeros((m_pad, self.cfg.hidden_size), self.cfg.dtype)
        fn = self._get_chunk_prefill_fn()
        hid_chunks = []
        for k in range(n_chunks):
            lo, hi = k * c, min((k + 1) * c, pad_to)
            window = min(-(-hi // 256) * 256, cache_size)
            hidden_k, caches, last_acc = fn(
                self.params["lm"], jnp.asarray(input_ids[:, lo:hi]),
                jnp.asarray(positions[:, :, lo:hi]),
                self._gather_img_embeds(img_gather[:, lo:hi]),
                jnp.asarray(img_mask[:, lo:hi]), caches,
                jnp.full((m_pad,), lo, jnp.int32), last_acc, last_idx_dev,
                window,
            )
            hid_chunks.append(hidden_k)
        first = self._get_first_fn()(self.params["lm"], last_acc, rng,
                                     self._fused_sampler_pack())[:m]
        if m_pad != m:
            caches = jax.tree.map(lambda a: a[:m], caches)
        # bf16 + lazy (see _prefill); padding rows >= m are never indexed
        hidden = _HostHidden(hid_chunks, axis=1)
        start_pos = np.asarray(
            [prompt_lens[i] + prepared[i]["delta"] for i in range(m)],
            np.int32)
        return (first, hidden, caches, prompt_lens, last_idx, start_pos)

    # -- generation ---------------------------------------------------------
    def generate(self, samples: Dict[str, Any], max_new_tokens: Optional[int] = None,
                 seed: int = 0) -> GenerationResult:
        """samples: {"images": [PIL or [PIL,...]], "answers": [str]} (the
        precompute collator output) — or {"prompts": [...]} pre-built.

        Static-batch path: one prefill, one decode scan to max_tokens,
        post-trim at EOS. Exact for ignore_eos eval configs; for EOS-heavy
        precompute workloads prefer :meth:`generate_many` (continuous
        batching)."""
        images_per_sample = samples.get("images", [])
        raw = bool(samples.get("raw_prompts"))
        texts = (samples.get("raw_prompts") or samples.get("answers")
                 or samples.get("prompts"))
        b = len(texts)
        max_tokens = int(max_new_tokens or self.max_tokens)

        prepared, self._img_bank, self._prepare_phases = self._prepare(
            texts, images_per_sample, raw=raw)
        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        first, hidden, caches, prompt_lens, last_idx, start_pos = \
            self._prefill(prepared, max_tokens, sub)
        hidden = hidden.resolve()  # static path consumes immediately

        decode = self._get_decode_fn(
            max_tokens - 1, self.min_tokens, self.temperature, self.top_p
        ) if max_tokens > 1 else None
        prompt_len_arr = jnp.asarray(prompt_lens, jnp.int32)
        if decode is not None:
            gen_tokens, gen_hidden = decode(
                self.params["lm"], caches, first, jnp.asarray(start_pos),
                prompt_len_arr, rng,
            )
            gen_tokens = np.concatenate(
                [np.asarray(first)[:, None], np.asarray(gen_tokens)], axis=1
            )
            # hidden for the step that PRODUCED each token: prefill's last
            # hidden produced token 0; decode step i produced token i+1.
            first_hidden = hidden[np.arange(b), last_idx][:, None]
            gen_hidden = np.concatenate(
                [first_hidden, np.asarray(gen_hidden)], axis=1
            )  # bf16 end-to-end (host f32 casts measured ~13 M elem/s)
        else:
            gen_tokens = np.asarray(first)[:, None]
            gen_hidden = hidden[np.arange(b), last_idx][:, None]

        # trim at EOS + detokenize
        out_texts, out_ids, out_hidden, prompt_hidden = [], [], [], []
        for i in range(b):
            toks = gen_tokens[i].tolist()
            if not self.ignore_eos and self.eos_ids:
                for j, t in enumerate(toks):
                    if t in self.eos_ids and j >= self.min_tokens - 1:
                        toks = toks[: j + 1]
                        break
            n = len(toks)
            out_ids.append(toks)
            out_hidden.append(gen_hidden[i, :n])
            prompt_hidden.append(hidden[i, : prompt_lens[i]])
            text = self.tokenizer.decode(
                [t for t in toks if t not in self.eos_ids],
                skip_special_tokens=True,
            ) if self.tokenizer else ""
            out_texts.append(text)

        return GenerationResult(
            texts=out_texts,
            prompt_token_ids=[list(p["ids"]) for p in prepared],
            output_token_ids=out_ids, prompt_hidden_states=prompt_hidden,
            hidden_states=out_hidden,
            input_prompts=[p["prompt"] for p in prepared],
        )


    # -- continuous batching --------------------------------------------------
    def _get_chunk_decode_fn(self, chunk: int, min_tokens: int,
                             temperature: float, top_p: float,
                             window: int):
        """K-step decode scan with per-slot generation counters and a STATIC
        attention window (length-aware decode: short contexts read `window`
        cache bytes instead of the full static cache)."""
        if not hasattr(self, "_chunk_fns"):
            self._chunk_fns = {}
        key = (chunk, min_tokens, temperature, top_p, window)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        eos_arr = jnp.asarray(self.eos_ids if self.eos_ids else [-1], jnp.int32)
        ignore_eos = self.ignore_eos
        top_k_pref = self.top_k_prefilter

        @functools.partial(jax.jit, donate_argnums=(1,))
        def chunk_decode(params, caches, tokens, cache_len, pos, gen_count, rng):
            def step(carry, i):
                caches, tokens, cache_len, pos, gen_count, rng = carry
                rng, sub = jax.random.split(rng)
                pos3 = jnp.broadcast_to(pos[None, :, None], (3, pos.shape[0], 1))
                _, hidden, caches = self.lm.apply(
                    {"params": params}, input_ids=tokens[:, None],
                    position_ids=pos3, caches=caches, cache_len=cache_len,
                    compute_logits=False, attn_window=window,
                )
                logits_last = self.lm.apply(
                    {"params": params}, hidden[:, 0], method=self.lm.logits
                )
                if not ignore_eos:
                    # per-slot: token being sampled has overall index
                    # gen_count; EOS blocked while gen_count < min_tokens - 1
                    block = (gen_count < min_tokens - 1)[:, None]
                    logits_last = jnp.where(
                        jnp.logical_and(
                            block,
                            jnp.isin(jnp.arange(logits_last.shape[-1]),
                                     eos_arr)[None]),
                        -jnp.inf, logits_last.astype(jnp.float32))
                nxt = sample_logits(sub, logits_last, temperature, top_p,
                                    top_k_prefilter=top_k_pref)
                return ((caches, nxt, cache_len + 1, pos + 1,
                         gen_count + 1, rng),
                        (nxt, hidden[:, 0].astype(jnp.bfloat16)))

            init = (caches, tokens, cache_len, pos, gen_count, rng)
            (caches, tokens, cache_len, pos, gen_count, rng), \
                (out_tokens, out_hidden) = jax.lax.scan(
                    step, init, jnp.arange(chunk))
            return (caches, tokens, cache_len, pos, gen_count,
                    out_tokens.T, out_hidden.transpose(1, 0, 2))

        self._chunk_fns[key] = chunk_decode
        return chunk_decode

    def _get_scatter_fn(self):
        """Scatter a refill sub-batch's caches/state into slot rows."""
        if getattr(self, "_scatter_fn", None) is None:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def scatter(big, slots, sub):
                return jax.tree.map(
                    lambda b, s: b.at[slots].set(s.astype(b.dtype)), big, sub)

            self._scatter_fn = scatter
        return self._scatter_fn

    def _fused_sampler_pack(self):
        """Padded lm_head pack for the fused sample kernel, or None when the
        gumbel sampler can't run (exact mode, non-w8a8 LM, or no TPU).
        Built once; ~1.5 MB of padding on the 152k vocab."""
        if self.sampler != "gumbel":
            return None
        if getattr(self, "_lm_pack", None) is not None:
            return self._lm_pack
        from thinkdiff_tpu.ops import fused_sample as _fs

        if (getattr(self.cfg, "quant_int8", None) != "w8a8"
                or not _fs.available()):
            return None
        from thinkdiff_tpu.ops.fused_sample import pack_lm_head

        eos = self.eos_ids if not self.ignore_eos else ()
        head = self.params["lm"].get("lm_head")
        if head is not None and "kernel_q" in head:
            self._lm_pack = pack_lm_head(
                head["kernel_q"], head["kernel_scale"],
                input_scale=head.get("input_scale"), eos_ids=eos)
            return self._lm_pack
        emb = (self.params["lm"].get("embed_tokens") or {}).get("embedding")
        if emb is None or not getattr(self.cfg, "tie_word_embeddings", False):
            return None
        # tied-embedding logits (2B): the attend() path reads the full
        # (V, D) bf16 table per decode step — the one unquantized straggler
        # in a w8a8 engine. Quantize per token ON DEVICE (pulling 620 MB
        # through the tunnel to numpy is minutes) into the kernel's
        # (D, V) layout; per-channel int8 logit error is the same <=0.4%
        # class as every other w8a8 projection (tests/test_quant.py), but
        # greedy fused-vs-attend is no longer bit-identical — gumbel mode
        # only, never silently applied to the exact path.
        @jax.jit
        def _q(emb):
            w = emb.astype(jnp.float32)            # (V, D)
            amax = jnp.max(jnp.abs(w), axis=1)     # per token
            scale = jnp.where(amax == 0, 1.0, amax / 127.0)
            q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127
                         ).astype(jnp.int8)
            return q.T, scale.astype(jnp.float32)  # (D, V), (V,)

        q, scale = _q(emb)
        self._lm_pack = pack_lm_head(q, scale, eos_ids=eos)
        return self._lm_pack

    def _get_paged_chunk_fn(self, chunk: int, min_tokens: int,
                            temperature: float, top_p: float):
        """K-step decode scan over the paged KV pool. One compiled fn per
        sampling config (the page table carries per-slot extents, so no
        per-window retraces like the dense path)."""
        if not hasattr(self, "_paged_chunk_fns"):
            self._paged_chunk_fns = {}
        key = (chunk, min_tokens, temperature, top_p, self.sampler)
        if key in self._paged_chunk_fns:
            return self._paged_chunk_fns[key]
        eos_arr = jnp.asarray(self.eos_ids if self.eos_ids else [-1], jnp.int32)
        ignore_eos = self.ignore_eos
        top_k_pref = self.top_k_prefilter
        @functools.partial(jax.jit, donate_argnums=(2,))
        def chunk_decode(params, lm_pack, pools, page_table, tokens,
                         cache_len, pos, gen_count, rng):
            def step(carry, i):
                pools, tokens, cache_len, pos, gen_count, rng = carry
                rng, sub = jax.random.split(rng)
                pos3 = jnp.broadcast_to(pos[None, :, None], (3, pos.shape[0], 1))
                _, hidden, pools = self.lm.apply(
                    {"params": params}, input_ids=tokens[:, None],
                    position_ids=pos3, caches=pools, cache_len=cache_len,
                    compute_logits=False, page_table=page_table,
                )
                if lm_pack is not None:
                    # fused lm_head+sample: logits never leave VMEM
                    from thinkdiff_tpu.ops.fused_sample import fused_lm_sample

                    blocked = (jnp.zeros_like(gen_count, jnp.float32)
                               if ignore_eos else
                               (gen_count < min_tokens - 1).astype(
                                   jnp.float32))
                    seed2 = jax.lax.bitcast_convert_type(sub, jnp.int32)
                    nxt = fused_lm_sample(
                        hidden[:, 0], lm_pack, blocked, seed2,
                        temperature=temperature,
                        noise=temperature > 0)
                else:
                    logits_last = self.lm.apply(
                        {"params": params}, hidden[:, 0],
                        method=self.lm.logits
                    )
                    if not ignore_eos:
                        block = (gen_count < min_tokens - 1)[:, None]
                        logits_last = jnp.where(
                            jnp.logical_and(
                                block,
                                jnp.isin(jnp.arange(logits_last.shape[-1]),
                                         eos_arr)[None]),
                            -jnp.inf, logits_last.astype(jnp.float32))
                    nxt = sample_logits(sub, logits_last, temperature, top_p,
                                        top_k_prefilter=top_k_pref)
                return ((pools, nxt, cache_len + 1, pos + 1,
                         gen_count + 1, rng),
                        (nxt, hidden[:, 0].astype(jnp.bfloat16)))

            init = (pools, tokens, cache_len, pos, gen_count, rng)
            (pools, tokens, cache_len, pos, gen_count, rng), \
                (out_tokens, out_hidden) = jax.lax.scan(
                    step, init, jnp.arange(chunk))
            return (pools, tokens, cache_len, pos, gen_count,
                    out_tokens.T, out_hidden.transpose(1, 0, 2))

        self._paged_chunk_fns[key] = chunk_decode
        return chunk_decode

    def _get_commit_fn(self):
        """Scatter dense prefill caches into the page pools (all layers)."""
        if getattr(self, "_commit_fn", None) is None:
            from thinkdiff_tpu.ops.paged_attention import commit_pages

            @functools.partial(jax.jit, donate_argnums=(0,))
            def commit(pools, dense, rows):
                return jax.tree.map(
                    lambda p, d: commit_pages(p, d, rows), pools, dense)

            self._commit_fn = commit
        return self._commit_fn

    @staticmethod
    def _page_rows(table_np, slot_ids, prompt_lens, pad_to, page):
        """Destination page ids for commit_pages: (m * pad_to//page,) —
        page-rows beyond a prompt's page count go to the trash page 0."""
        rows = []
        for j, si in enumerate(slot_ids):
            npg = -(-prompt_lens[j] // page)
            for k in range(pad_to // page):
                rows.append(int(table_np[si, k]) if k < npg else 0)
        return np.asarray(rows, np.int32)

    def generate_many(self, samples: Dict[str, Any],
                      max_new_tokens: Optional[int] = None, seed: int = 0,
                      slots: Optional[int] = None, chunk: int = 32,
                      paged: Optional[bool] = None,
                      refill_batch: int = 0,
                      preprepared: Optional[Dict[str, Any]] = None
                      ) -> GenerationResult:
        """Continuous batching over an arbitrary request list (the scheduler
        role vLLM plays for the reference — thinkdiff/models/
        mllama_vllm_generate_1.py:382-413): a fixed pool of `slots` decode
        lanes; finished (EOS) sequences are replaced by freshly-prefilled
        requests at `chunk`-step boundaries; the decode attention window
        grows in 256-step buckets (no full-cache reads for short contexts).

        `refill_batch` caps every prefill group (initial fill AND refills)
        to that many rows; 0 = auto (whole group up to 64 slots, 32-row
        sub-batches above). Admission is longest-first, so each sub-batch
        gets its OWN pow2 prompt bucket — at 128/256 slots this avoids
        padding every refill row to the global bucket (the round-3 bottleneck
        that made 64 slots the throughput peak).
        """
        images_per_sample = samples.get("images", [])
        raw = bool(samples.get("raw_prompts"))
        texts = (samples.get("raw_prompts") or samples.get("answers")
                 or samples.get("prompts"))
        n = len(texts)
        max_tokens = int(max_new_tokens or self.max_tokens)
        slots = int(slots or min(n, self.max_num_seqs))
        if paged is None:
            # above ~32 lanes a dense per-slot cache (global prompt bucket +
            # max_tokens each) stops fitting; the paged pool holds only
            # ceil(len/page) pages per live sequence
            paged = slots > 32
        slots = min(slots, n)
        if not paged and (n <= slots or max_tokens <= chunk or self.ignore_eos):
            # static batching is optimal when nothing can finish early
            return self.generate(samples, max_new_tokens=max_new_tokens,
                                 seed=seed)
        # Length-determined serving: when token VALUES never steer the loop
        # — no EOS scan (ignore_eos, or no eos_ids) and no value-reading
        # stop hook (stop_len_fn, the count-only hook, is fine) —
        # completions are slot_gen-counted on the host and refill timing is
        # deterministic, so the whole decode+refill pipeline runs
        # DISPATCH-ONLY: per-chunk token matrices become lazy host pieces
        # (copy_to_host_async) resolved after the loop, and _assign gathers
        # preadmitted first tokens device-side. Without this the per-chunk
        # np.asarray(chunk_tokens) queues behind the hidden d2h stream
        # (~59 MB per 16-row refill group at 7B over a slow host link) and
        # the device idles a transfer RTT per chunk — the round-4 7B
        # median/best bimodality (PERF.md "7B serving operating point").
        # Disable via self.lazy_tokens = False (parity tests).
        lazy_tok = bool(paged
                        and (self.ignore_eos or not self.eos_ids)
                        and getattr(self, "stop_fn", None) is None
                        and getattr(self, "lazy_tokens", True))
        # When token values ARE read (EOS scan / stop_fn), eos_lag = L >= 1
        # pipelines the accounting instead (vLLM async output processing):
        # chunk c's tokens resolve only after chunk c+L is dispatched, so
        # the sync overlaps a full chunk of device compute. EOS lands up to
        # L chunks late — outputs are still cut exactly at EOS in _finish; a
        # dying slot decodes <= L extra garbage chunks into its own slack
        # pages (sized below) and those rows are skipped via valid_from.
        # Greedy token streams are bit-identical to lag=0; sampled runs draw
        # from the same distribution but not the same stream (refill
        # boundaries shift rng consumption — same caveat as chunked
        # prefill, _prefill_chunked docstring).
        lag = (0 if lazy_tok or not paged
               else max(0, int(getattr(self, "eos_lag", 0))))

        import os as _os
        import time as _time
        dbg = _os.environ.get("THINKDIFF_ENGINE_DEBUG")
        _tp0 = _time.perf_counter()
        if preprepared is not None:
            # streaming admission (prepare_requests ran concurrently with
            # the previous batch's decode): adopt its bank + inputs
            prepared = preprepared["prepared"]
            self._img_bank = preprepared["img_bank"]
            self._prepare_phases = dict(preprepared["phases"],
                                        overlapped=1.0)
        else:
            prepared, self._img_bank, self._prepare_phases = self._prepare(
                texts, images_per_sample, raw=raw)
        t_prepare = _time.perf_counter() - _tp0
        # longest-first: early refill groups get the big prompt buckets
        order = sorted(range(n), key=lambda i: -len(prepared[i]["ids"]))
        queue = list(order)
        rng = jax.random.PRNGKey(seed)

        max_prompt = max(len(p["ids"]) for p in prepared)
        prompt_bucket = 1 << max(6, (max_prompt - 1).bit_length())
        prompt_bucket = min(prompt_bucket, self.max_prompt_len)
        # + chunk: a slot finishing mid-chunk keeps writing garbage KV rows
        # until the boundary
        cache_size = prompt_bucket + max_tokens + chunk

        page = self.kv_page_size
        wave = 0  # prefill-ahead is a paged-pool feature (set below)
        if paged:
            assert page <= 64 and 64 % page == 0, (
                "kv_page_size must divide the 64-token minimum prompt bucket")
            hd, hkv = self.cfg.head_dim, self.cfg.num_kv_heads
            # worst-case pages a request can ever hold (its OWN prompt, not
            # the global bucket — the memory win over the dense cache)
            # + chunk*(1+lag): a slot finishing mid-chunk keeps writing
            # garbage KV until the boundary, plus up to `lag` in-flight
            # chunks before pipelined accounting notices the finish
            need = [-(-(len(p["ids"]) + max_tokens + chunk * (1 + lag))
                      // page)
                    for p in prepared]
            mp = max(need)
            # requests are admitted longest-first, so the initial fill is
            # the worst-case concurrent set: pool = sum of the S largest
            # (+1 for the trash page) and refills can never run dry
            pool_pages = 1 + sum(sorted(need, reverse=True)[:slots])
            # prefill-ahead holds PROMPT pages only (generation pages are
            # allocated at slot assignment); budget two waves of the
            # largest prompt-page counts so a wave can be in flight while
            # the store drains
            wave = self.preadmit_wave if n > slots else 0
            if wave:
                # budget over the queue AFTER the initial fill (the S
                # longest prompts are already counted in pool_pages above)
                # capped at the max concurrent ahead entries: _preadmit
                # refires at len(ahead) <= wave//2, so at most ~1.5*wave
                # entries ever hold prompt pages at once
                rest = order[slots:]
                pneed = sorted((-(-len(prepared[r]["ids"]) // page)
                                for r in rest), reverse=True)
                pool_pages += sum(pneed[:min((3 * wave + 1) // 2,
                                             len(rest))])
            free = list(range(pool_pages - 1, 0, -1))
            table_np = np.zeros((slots, mp), np.int32)
            slot_pages: List[List[int]] = [[] for _ in range(slots)]
            pools = [
                (jnp.zeros((pool_pages, hkv, page, hd), self.cfg.dtype),
                 jnp.zeros((pool_pages, hkv, page, hd), self.cfg.dtype))
                for _ in range(self.cfg.num_layers)
            ]

        # ---- slot state (populated by _admit) ----
        results: Dict[int, Tuple] = {}
        slot_req = [-1] * slots
        slot_tokens: List[List[int]] = [[] for _ in range(slots)]
        slot_hidden: List[List[np.ndarray]] = [[] for _ in range(slots)]
        slot_prompt_hidden: List[Any] = [None] * slots
        slot_gen = np.zeros((slots,), np.int64)
        slot_active = np.ones((slots,), bool)
        # first chunk index whose decode rows belong to the slot's CURRENT
        # request (admissions set it to the next-dispatched chunk's index;
        # earlier in-flight chunks are another request's garbage — eos_lag)
        valid_from = np.zeros((slots,), np.int64)

        tokens_dev = jnp.zeros((slots,), jnp.int32)
        cache_len = jnp.zeros((slots,), jnp.int32)
        pos = jnp.zeros((slots,), jnp.int32)
        gen_count = jnp.ones((slots,), jnp.int32)
        if paged:
            table_dev = jnp.asarray(table_np)
        else:
            hd = self.cfg.head_dim
            caches = [
                (jnp.zeros((slots, self.cfg.num_kv_heads, cache_size, hd),
                           self.cfg.dtype),
                 jnp.zeros((slots, self.cfg.num_kv_heads, cache_size, hd),
                           self.cfg.dtype))
                for _ in range(self.cfg.num_layers)
            ]

        group = (int(refill_batch) if refill_batch
                 else (slots if slots <= 64 else 32))

        # first-token d2h is LAZY like the hidden states: _admit starts the
        # (m,)-int32 copy and returns without waiting for the prefill to
        # finish, so the host immediately dispatches the next decode chunk
        # (the device runs prefill -> chunk back-to-back with no host-RTT
        # bubble per refill group). The values are resolved at the next
        # accounting pass — after that chunk's token sync, when the
        # transfer is guaranteed complete. EOS on a first token is thus
        # detected one chunk late (the cut in _finish keeps outputs exact).
        pending_first: List[Tuple[Any, List[int]]] = []

        def _admit(reqs, slot_ids):
            """Prefill `reqs` into `slot_ids` in sub-batches of <= `group`
            rows. Both the initial fill and every refill go through here, so
            a prefill batch never exceeds `group`; with longest-first
            admission each sub-batch's pow2 prompt bucket is tight to its
            own rows instead of the global maximum."""
            nonlocal pools, table_dev, caches, tokens_dev, cache_len
            nonlocal pos, gen_count, rng
            for g0 in range(0, len(reqs), group):
                g_reqs = list(reqs[g0:g0 + group])
                g_slots = list(slot_ids[g0:g0 + group])
                batch = [prepared[r] for r in g_reqs]
                for j, si in enumerate(g_slots):
                    slot_req[si] = g_reqs[j]
                rng, sub = jax.random.split(rng)
                if paged:
                    r_pad = min(1 << max(6, (max(len(p["ids"])
                                                 for p in batch)
                                             - 1).bit_length()),
                                self.max_prompt_len)
                    (r_first, r_hidden, r_caches, r_lens, r_last,
                     r_start) = self._prefill(batch, max_tokens, sub,
                                              cache_size=r_pad)
                    for j, si in enumerate(g_slots):
                        free.extend(slot_pages[si])
                        k = need[slot_req[si]]
                        slot_pages[si] = [free.pop() for _ in range(k)]
                        table_np[si, :] = 0
                        table_np[si, :k] = slot_pages[si]
                    rows = self._page_rows(table_np, g_slots, r_lens,
                                           r_pad, page)
                    pools = self._get_commit_fn()(pools, r_caches,
                                                  jnp.asarray(rows))
                    table_dev = jnp.asarray(table_np)
                else:
                    (r_first, r_hidden, r_caches, r_lens, r_last,
                     r_start) = self._prefill(batch, max_tokens, sub,
                                              cache_size=cache_size)
                    caches = self._get_scatter_fn()(
                        caches, jnp.asarray(g_slots, jnp.int32), r_caches)
                sl = jnp.asarray(g_slots, jnp.int32)
                tokens_dev = tokens_dev.at[sl].set(r_first)
                cache_len = cache_len.at[sl].set(jnp.asarray(r_lens,
                                                             jnp.int32))
                pos = pos.at[sl].set(jnp.asarray(r_start))
                gen_count = gen_count.at[sl].set(1)
                if hasattr(r_first, "copy_to_host_async"):
                    r_first.copy_to_host_async()
                cell = {"dev": r_first, "arr": None} if lazy_tok else None
                if not lazy_tok:
                    pending_first.append((r_first, list(g_slots)))
                for j, si in enumerate(g_slots):
                    # lazy mode: the first token stays a device-backed piece
                    # (resolved with the chunk pieces after the loop)
                    slot_tokens[si] = [("f", cell, j)] if lazy_tok else []
                    valid_from[si] = n_chunks
                    # lazy hidden PIECES (resolved at result assembly so
                    # the d2h overlaps decode): ("seed"/"gen", lazy, row,
                    # take) and ("prompt", lazy, row, prompt_len)
                    slot_hidden[si] = [("seed", r_hidden, j,
                                        int(r_last[j]))]
                    slot_prompt_hidden[si] = ("prompt", r_hidden, j,
                                              int(r_lens[j]))
                    slot_gen[si] = 1

        # ---- prefill-ahead store (paged only; see self.preadmit_wave) ----
        # Each entry is a request whose prompt is already prefilled into
        # pool pages (prompt pages only) with its first token sampled and
        # its hidden pieces lazily in flight. Assigning it to a freed slot
        # costs a page-table update + a few .at[] sets — no device prefill
        # at rows<=16 geometry on the refill path.
        ahead: List[Dict[str, Any]] = []

        def _preadmit():
            nonlocal pools, rng
            take = min(wave, len(queue))
            if take <= 0:
                return
            reqs = [queue.pop(0) for _ in range(take)]
            for g0 in range(0, take, group):
                g_reqs = reqs[g0:g0 + group]
                batch = [prepared[r] for r in g_reqs]
                rng, sub = jax.random.split(rng)
                r_pad = min(1 << max(6, (max(len(p["ids"]) for p in batch)
                                         - 1).bit_length()),
                            self.max_prompt_len)
                (r_first, r_hidden, r_caches, r_lens, r_last,
                 r_start) = self._prefill(batch, max_tokens, sub,
                                          cache_size=r_pad)
                rows, pages_of = [], []
                for j, r in enumerate(g_reqs):
                    npg = -(-r_lens[j] // page)
                    pgs = [free.pop() for _ in range(npg)]
                    pages_of.append(pgs)
                    rows.extend(pgs + [0] * (r_pad // page - npg))
                pools = self._get_commit_fn()(pools, r_caches,
                                              jnp.asarray(rows, jnp.int32))
                if hasattr(r_first, "copy_to_host_async"):
                    r_first.copy_to_host_async()
                # one shared cell per prefill group: the device array is
                # resolved to np exactly once at first assignment, then the
                # device handle is dropped. Keyed by identity of the CELL
                # (held alive by every entry of the group), never by id()
                # of a GC-able jax array — id reuse across waves would
                # alias a stale group's tokens.
                cell = {"dev": r_first, "arr": None}
                for j, r in enumerate(g_reqs):
                    ahead.append({
                        "req": r, "cell": cell, "row": j,
                        "stamp": n_chunks,
                        "pages": pages_of[j], "plen": int(r_lens[j]),
                        "start": int(r_start[j]),
                        "seed": ("seed", r_hidden, j, int(r_last[j])),
                        "prompt": ("prompt", r_hidden, j, int(r_lens[j])),
                    })

        def _assign(slot_ids):
            """Point freed slots at prefill-ahead entries (FIFO). By the
            time a slot frees, the entry's prefill ran chunks ago, so the
            async first-token transfer has landed — resolving it here is a
            memo lookup, not a device sync."""
            nonlocal tokens_dev, cache_len, pos, gen_count, table_dev
            entries = [ahead.pop(0) for _ in slot_ids]
            firsts = []
            for a, si in zip(entries, slot_ids):
                free.extend(slot_pages[si])
                k = need[a["req"]]
                slot_pages[si] = a["pages"] + [
                    free.pop() for _ in range(k - len(a["pages"]))]
                table_np[si, :] = 0
                table_np[si, :k] = slot_pages[si]
                cell = a["cell"]
                if lazy_tok:
                    # device-side scalar gather: no host sync on the refill
                    # path (the async d2h keeps streaming for the final
                    # resolve, which reads cell["arr"] or re-asks the dev)
                    firsts.append(cell["dev"][a["row"]])
                    slot_tokens[si] = [("f", cell, a["row"])]
                else:
                    if cell["arr"] is None:
                        cell["arr"] = np.asarray(cell["dev"])
                        cell["dev"] = None  # drop the device handle
                    tok = int(cell["arr"][a["row"]])
                    firsts.append(tok)
                    slot_tokens[si] = [tok]
                slot_req[si] = a["req"]
                slot_hidden[si] = [a["seed"]]
                slot_prompt_hidden[si] = a["prompt"]
                slot_gen[si] = 1
                valid_from[si] = n_chunks
            table_dev = jnp.asarray(table_np)
            sl = jnp.asarray(slot_ids, jnp.int32)
            tokens_dev = tokens_dev.at[sl].set(
                jnp.stack(firsts) if lazy_tok
                else jnp.asarray(firsts, jnp.int32))
            cache_len = cache_len.at[sl].set(jnp.asarray(
                [a["plen"] for a in entries], jnp.int32))
            pos = pos.at[sl].set(jnp.asarray(
                [a["start"] for a in entries], jnp.int32))
            gen_count = gen_count.at[sl].set(1)

        # ---- initial fill ----
        n_chunks = 0  # defined pre-fill: _preadmit stamps entries with it
        _tp0 = _time.perf_counter()
        _admit([queue.pop(0) for _ in range(slots)], list(range(slots)))
        if wave:
            _preadmit()  # wave 1 dispatches behind the initial fill
        t_first = _time.perf_counter() - _tp0

        def _finish(si):
            req = slot_req[si]
            toks = slot_tokens[si]
            if lazy_tok:
                # pieces stay lazy; text decode happens at final resolve
                # (ignore_eos: cut is the host-side counter, no EOS scan)
                cut = min(int(slot_gen[si]), max_tokens)
                results[req] = (None, list(prepared[req]["ids"]),
                                ("lazy", list(toks), cut),
                                slot_prompt_hidden[si],
                                (list(slot_hidden[si]), cut),
                                prepared[req]["prompt"])
                return
            cut = len(toks)
            if not self.ignore_eos and self.eos_ids:
                for j, t in enumerate(toks):
                    if t in self.eos_ids and j >= self.min_tokens - 1:
                        cut = j + 1
                        break
            cut = min(cut, max_tokens)
            toks = toks[:cut]
            p = prepared[req]
            text = self.tokenizer.decode(
                [t for t in toks if t not in self.eos_ids],
                skip_special_tokens=True) if self.tokenizer else ""
            # hidden stays as lazy pieces; assembled after the decode loop
            results[req] = (text, list(p["ids"]), toks,
                            slot_prompt_hidden[si],
                            (list(slot_hidden[si]), cut), p["prompt"])

        t_decode = t_sync = t_refill = t_account = 0.0
        pending_acct: List[Tuple[Any, Any, int]] = []

        def _account(tok, chunk_hidden, cidx):
            """Token accounting + EOS/stop/finish + refill for chunk `cidx`.
            `tok` is an (S, chunk) np array (sync), a device handle
            (eos_lag — resolved here, `lag` chunks after dispatch), or a
            lazy cell dict (lazy_tok — never resolved here)."""
            nonlocal t_sync, t_account, t_refill
            if not lazy_tok and not isinstance(tok, np.ndarray):
                _ts = _time.perf_counter()
                tok = np.asarray(tok)                        # (S, chunk)
                t_sync += _time.perf_counter() - _ts
            _ta0 = _time.perf_counter()
            if pending_first:  # resolve admitted first tokens (sync modes)
                for r_first, g_slots in pending_first:
                    arr = np.asarray(r_first)
                    for j, si in enumerate(g_slots):
                        slot_tokens[si].insert(0, int(arr[j]))
                pending_first.clear()
            finished_slots = []
            for si in range(slots):
                if not slot_active[si] or cidx < valid_from[si]:
                    # rows dispatched before this slot's admission (eos_lag:
                    # a refilled slot's in-flight chunks) are garbage
                    continue
                take = min(chunk, max_tokens - slot_gen[si])
                if lazy_tok:
                    slot_tokens[si].append(("c", tok, si, int(take)))
                else:
                    slot_tokens[si].extend(
                        int(t) for t in tok[si, :take])
                slot_hidden[si].append(("gen", chunk_hidden, si, int(take)))
                slot_gen[si] += take
                done = slot_gen[si] >= max_tokens
                if not done and not self.ignore_eos and self.eos_ids:
                    toks = slot_tokens[si]
                    done = any(t in self.eos_ids
                               for j, t in enumerate(toks)
                               if j >= self.min_tokens - 1)
                if not done and getattr(self, "stop_len_fn", None) is not None:
                    # count-only stop hook (length-emulating benches): needs
                    # no token values, so it composes with lazy_tok
                    done = bool(self.stop_len_fn(slot_req[si],
                                                 int(slot_gen[si])))
                if not done and getattr(self, "stop_fn", None) is not None:
                    # extension point for stop-sequences (vLLM
                    # SamplingParams.stop); reads VALUES — excludes lazy_tok
                    done = bool(self.stop_fn(slot_req[si], slot_tokens[si]))
                if done:
                    _finish(si)
                    finished_slots.append(si)
            t_account += _time.perf_counter() - _ta0

            if finished_slots:
                _t0 = _time.perf_counter()
                assign_slots, refill_reqs, refill_slots = [], [], []
                # prefer entries preadmitted at least one chunk ago: their
                # async first-token d2h has certainly landed, so _assign is
                # a memo lookup. Same-chunk entries are still eligible as a
                # last resort (the np.asarray sync beats idling the slot).
                avail = sum(1 for a in ahead if a["stamp"] < n_chunks)
                hot = len(ahead) - avail
                for si in finished_slots:
                    if avail > 0:
                        assign_slots.append(si)
                        avail -= 1
                    elif queue:
                        refill_reqs.append(queue.pop(0))
                        refill_slots.append(si)
                    elif hot > 0:
                        assign_slots.append(si)
                        hot -= 1
                    else:
                        slot_active[si] = False
                if assign_slots:
                    _assign(assign_slots)
                if refill_reqs:
                    _admit(refill_reqs, refill_slots)
                if wave and len(ahead) <= wave // 2 and queue:
                    _preadmit()  # next wave while this one drains
                t_refill += _time.perf_counter() - _t0

        _t_loop0 = _time.perf_counter()
        while slot_active.any():
            rng, sub = jax.random.split(rng)
            _t0 = _time.perf_counter()
            if paged:
                fn = self._get_paged_chunk_fn(
                    chunk, self.min_tokens, self.temperature, self.top_p)
                (pools, tokens_dev, cache_len, pos, gen_count,
                 chunk_tokens, chunk_hidden) = fn(
                    self.params["lm"], self._fused_sampler_pack(), pools,
                    table_dev, tokens_dev, cache_len, pos, gen_count, sub)
            else:
                max_len = int(np.asarray(cache_len)[slot_active].max()) + chunk
                window = min(-(-max_len // 256) * 256, cache_size)
                fn = self._get_chunk_decode_fn(
                    chunk, self.min_tokens, self.temperature, self.top_p,
                    window)
                (caches, tokens_dev, cache_len, pos, gen_count,
                 chunk_tokens, chunk_hidden) = fn(
                    self.params["lm"], caches, tokens_dev, cache_len, pos,
                    gen_count, sub)
            _t1 = _time.perf_counter()
            # hidden d2h is LAZY (streams behind the next chunk's compute);
            # only the token matrix blocks the loop — and in lazy_tok /
            # eos_lag modes not even that: lazy_tok turns the (S, chunk)
            # matrix into a host piece resolved after the loop; eos_lag
            # resolves it `lag` chunks after dispatch (_account)
            chunk_hidden = _HostHidden([chunk_hidden])
            if lazy_tok:
                if hasattr(chunk_tokens, "copy_to_host_async"):
                    chunk_tokens.copy_to_host_async()
                tok = {"dev": chunk_tokens, "arr": None}
            elif lag:
                if hasattr(chunk_tokens, "copy_to_host_async"):
                    chunk_tokens.copy_to_host_async()
                tok = chunk_tokens                 # resolved in _account
            else:
                _ts = _time.perf_counter()
                tok = np.asarray(chunk_tokens)               # (S, chunk)
                t_sync += _time.perf_counter() - _ts
            t_decode += _t1 - _t0
            n_chunks += 1
            pending_acct.append((tok, chunk_hidden, n_chunks - 1))
            while len(pending_acct) > lag:
                _account(*pending_acct.pop(0))
        while pending_acct:  # eos_lag tail: account the in-flight chunks
            _account(*pending_acct.pop(0))

        # wall-time breakdown (always recorded; bench scripts emit it):
        #   prepare_resize  host PIL resize + smart_resize math
        #   prepare_vispack host np.stack of uint8 chunk batches
        #   prepare_vision  vision-chunk dispatch (ASYNC — compute/upload
        #                   overlap; sync lands in first_prefill)
        #   prepare_prompt  tokenize + M-RoPE position build
        #   first_prefill   initial slot fill (device prefill + hidden d2h
        #                   — also absorbs the queued vision compute)
        #   decode_dispatch async chunk-scan dispatch cost
        #   decode_sync     wait for chunk compute + tokens/hidden d2h
        #   account         host python: token lists, EOS scan, finishes
        #   refill_prefill  refill groups (device prefill + hidden d2h
        #                   + page-commit/scatter)
        prep = getattr(self, "_prepare_phases",
                       {"resize": 0.0, "vision_pack": 0.0, "vision": 0.0,
                        "prompt": 0.0})
        self.last_phase_stats = {
            "n_requests": n, "slots": slots, "chunks": n_chunks,
            "prepare_total": round(t_prepare, 3),
            "prepare_resize": round(prep["resize"], 3),
            "prepare_vispack": round(prep["vision_pack"], 3),
            "prepare_vision": round(prep["vision"], 3),
            "prepare_prompt": round(prep["prompt"], 3),
            "first_prefill": round(t_first, 3),
            "decode_dispatch": round(t_decode, 3),
            "decode_sync": round(t_sync, 3),
            "account": round(t_account, 3),
            "refill_prefill": round(t_refill, 3),
            "decode_loop_total": round(_time.perf_counter() - _t_loop0, 3),
        }

        # materialize the lazy hidden pieces (transfers already done or in
        # flight — this is host-side assembly, not a device sync point)
        def _hid(piece):
            kind, h, row, k = piece
            arr = h.resolve()
            return arr[row, k][None] if kind == "seed" else arr[row, :k]

        def _tokcell(cell):
            if cell["arr"] is None:
                cell["arr"] = np.asarray(cell["dev"])
                cell["dev"] = None
            return cell["arr"]

        _t0 = _time.perf_counter()
        final = []
        for i in range(n):
            text, ids, toks, prompt_piece, (gen_pieces, cut), prm = results[i]
            if isinstance(toks, tuple) and toks[0] == "lazy":
                _, pieces, tcut = toks
                out = []
                for p in pieces:
                    if p[0] == "f":
                        out.append(int(_tokcell(p[1])[p[2]]))
                    else:
                        out.extend(int(t)
                                   for t in _tokcell(p[1])[p[2], :p[3]])
                toks = out[:tcut]
                text = (self.tokenizer.decode(
                    [t for t in toks if t not in self.eos_ids],
                    skip_special_tokens=True) if self.tokenizer else "")
            hid = np.concatenate([_hid(p) for p in gen_pieces], axis=0)[:cut]
            final.append((text, ids, toks, _hid(prompt_piece), hid, prm))
        self.last_phase_stats["final_resolve"] = round(
            _time.perf_counter() - _t0, 3)
        if dbg:
            logger.warning("generate_many phases: %s", self.last_phase_stats)
        ordered = final
        cols = list(zip(*ordered))
        return GenerationResult(
            texts=list(cols[0]), prompt_token_ids=list(cols[1]),
            output_token_ids=list(cols[2]),
            prompt_hidden_states=list(cols[3]),
            hidden_states=list(cols[4]), input_prompts=list(cols[5]),
        )


class MllamaVllmGenerateModel:
    """Registry model wrapping the engine for the precompute task — the
    reference's ``mllama-vllm-generate-1`` (mllama_vllm_generate_1.py:364)."""

    default_model_type = "pretrain_mllama_vllm_generate_1"
    PRETRAINED_MODEL_CONFIG_DICT = {
        "pretrain_mllama_vllm_generate_1":
            "configs/models/mllama_vllm_generate_1.yaml",
    }

    @classmethod
    def default_config_path(cls, model_type: str) -> str:
        # engine wrapper, not a BaseModel subclass — same resolution
        from thinkdiff_tpu.models.base import BaseModel

        return BaseModel.default_config_path.__func__(cls, model_type)

    def __init__(self, cfg: ConfigNode, engine: Optional[EmbedEngine] = None):
        self.cfg = cfg
        self.engine = engine if engine is not None else EmbedEngine.from_config(cfg)
        vcfg = cfg.get("vllm_config", {}) or {}
        self.embedding_layer_name = vcfg.get("embedding_layer_name", "model.norm")
        # which batch key carries the prompts (reference text_input_key,
        # mllama_vllm_generate_1.py:542-545; None -> "answers")
        self.text_input_key = cfg.get("text_input_key", None) or "answers"
        # llava models emit a leading space the reference strips from the
        # recorded generated text (mllama_vllm_generate_1.py:606-609)
        model_id = str(cfg.get("mllama_model_id",
                               cfg.get("mllama_pretrained_model_name_or_path",
                                       "")))
        self._strip_leading_space = any(
            l in model_id for l in _LLAVA_LEADING_SPACE_IDS)
        # device-batch size — the scheduler role vLLM's continuous batcher
        # plays (reference dataset batch_size is 8192 with vLLM scheduling
        # internally; configs/qwen2_vl_embed_ccsbu.yaml max_num_seqs)
        self.max_num_seqs = int(vcfg.get("max_num_seqs", 32))

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg)

    def load_checkpoint_from_config(self, cfg):
        pass  # frozen inference model

    def forward(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host batch (any size) -> length-sorted device chunks of
        ``max_num_seqs`` -> merged results in the original order."""
        texts = batch[self.text_input_key]
        n = len(texts)
        images = batch.get("images", [None] * n)

        def est_tokens(i):
            img = images[i]
            imgs = img if isinstance(img, (list, tuple)) else [img]
            total = 0
            for im in imgs:
                if im is None:
                    continue
                w, h = getattr(im, "size", (448, 448))
                hb, wb = smart_resize(
                    h, w, self.engine.cfg.vision.patch_size
                    * self.engine.cfg.vision.spatial_merge_size,
                    self.engine.min_pixels, self.engine.max_pixels,
                )
                total += (hb // 28) * (wb // 28)
            return total

        order = sorted(range(n), key=est_tokens)
        out: Dict[int, Any] = {}
        # image-size-sorted groups of max_num_seqs share one vision/prefill
        # geometry; inside each group the engine continuous-batches over
        # `max_num_seqs` decode slots (EOS frees a slot for the next prompt
        # — the role vLLM's scheduler plays for the reference)
        group = self.max_num_seqs * 4
        for start in range(0, n, group):
            idxs = order[start: start + group]
            sub = {
                "images": [images[i] for i in idxs],
                "answers": [texts[i] for i in idxs],
            }
            result = self.engine.generate_many(
                sub, seed=start, slots=self.max_num_seqs)
            for j, i in enumerate(idxs):
                out[i] = (
                    result.texts[j], result.input_prompts[j],
                    result.prompt_token_ids[j], result.output_token_ids[j],
                    result.prompt_hidden_states[j], result.hidden_states[j],
                )
        cols = list(zip(*[out[i] for i in range(n)]))
        gen_texts = list(cols[0])
        if self._strip_leading_space:
            gen_texts = [t.replace(" ", "", 1) if t[:1] == " " else t
                         for t in gen_texts]
        return {
            "generated_texts": gen_texts,
            "input_prompts": list(cols[1]),
            "prompt_token_ids": list(cols[2]),
            "output_token_ids": list(cols[3]),
            "prompt_hidden_states": list(cols[4]),
            "hidden_states": list(cols[5]),
            "embedding_layer_name": self.embedding_layer_name,
        }


from thinkdiff_tpu.core.registry import registry  # noqa: E402

registry.register_model("mllama-vllm-generate-1")(MllamaVllmGenerateModel)
