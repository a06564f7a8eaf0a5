"""ThinkDiff inference pipeline: aligned tokens -> FLUX images.

The glue the reference spreads across FluxPipelineRewritePrompt and the test
scripts (reference: thinkdiff/models/flux_prompt.py:37-121,
scripts/test/test_mllama_t5_decoder_flux.py:134-196,
scripts/test/test_blip_vision_t5_decoder_flux.py:84-238):

  - ``encode_prompt(prompt, prompt_embeds)``: external embeds pass through
    untouched; the CLIP-L pooled embedding comes from the (usually empty)
    text prompt;
  - LVLM path: model.get_embed -> aligned tokens -> sample;
  - CLIP path: per-image forward_encoder projections concatenated, then
    optional T5 text embeds appended (reference flux.py:216 concat order
    [img_1; img_2; text]).
"""

from __future__ import annotations

import logging
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.engines.flux_sampler import FluxSampler, save_images
from thinkdiff_tpu.models.clip_text import (
    CLIPTextConfig, CLIPTextEncoder, convert_clip_text,
)

logger = logging.getLogger(__name__)


class T5TextEmbedder:
    """T5 encoder text embeds — diffusers' _get_t5_prompt_embeds equivalent,
    used when composing [image tokens; text embeds] conditions
    (reference scripts/test/test_blip_vision_t5_decoder_flux.py:216)."""

    def __init__(self, t5_model, t5_params, tokenizer,
                 max_sequence_length: int = 512):
        self.t5 = t5_model
        self.params = t5_params
        self.tokenizer = tokenizer
        self.max_sequence_length = max_sequence_length

    @classmethod
    def from_pretrained(cls, path: str = "google/flan-t5-xxl",
                        dtype=jnp.bfloat16, max_sequence_length: int = 512):
        from transformers import AutoTokenizer

        from thinkdiff_tpu.models.base import maybe_load_hf_weights
        from thinkdiff_tpu.models.convert import convert_t5
        from thinkdiff_tpu.models.t5 import T5Config, T5ForConditionalGeneration

        sd = maybe_load_hf_weights(path)
        if sd is None:
            raise FileNotFoundError(f"T5 weights not found for {path}")
        np_dtype = np.dtype(jnp.bfloat16) if dtype == jnp.bfloat16 else None
        cfg = T5Config.flan_t5_xxl(dtype=dtype, dropout_rate=0.0)
        params = convert_t5(sd, dtype=np_dtype)
        tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        return cls(T5ForConditionalGeneration(cfg), {"params": params}, tok,
                   max_sequence_length)

    def __call__(self, text, max_len: Optional[int] = None):
        """text (str or list) -> (B, S, d_model) encoder states."""
        texts = [text] if isinstance(text, str) else list(text)
        max_len = max_len or self.max_sequence_length
        ids = [self.tokenizer.encode(t)[:max_len] for t in texts]
        width = max(len(i) for i in ids)
        arr = np.zeros((len(ids), width), np.int32)
        mask = np.zeros((len(ids), width), np.int32)
        for i, row in enumerate(ids):
            arr[i, : len(row)] = row
            mask[i, : len(row)] = 1
        states, _ = self.t5.apply(
            self.params, method=self.t5.encode,
            input_ids=jnp.asarray(arr), attention_mask=jnp.asarray(mask),
        )
        return np.asarray(states, np.float32)


class ThinkDiffPipeline:
    def __init__(self, sampler: FluxSampler, clip_encoder=None,
                 clip_params=None, clip_tokenizer=None,
                 t5_embedder=None, max_sequence_length: int = 512):
        self.sampler = sampler
        self.clip_encoder = clip_encoder
        self.clip_params = clip_params
        self.clip_tokenizer = clip_tokenizer
        self.t5_embedder = t5_embedder  # callable text -> (S, 4096) embeds
        self.max_sequence_length = max_sequence_length
        self._pooled_cache = {}

    @classmethod
    def from_pretrained(cls, flux_path: str = "black-forest-labs/FLUX.1-dev",
                        dtype=jnp.bfloat16) -> "ThinkDiffPipeline":
        from thinkdiff_tpu.models.base import maybe_load_hf_weights

        sampler = FluxSampler.from_pretrained(flux_path, dtype=dtype)
        clip_encoder = clip_params = clip_tok = None
        sd = maybe_load_hf_weights(flux_path)
        clip_keys = [k for k in (sd or {}) if k.startswith("text_encoder.")]
        if clip_keys:
            clip_sd = {k.replace("text_encoder.", "", 1): v
                       for k, v in sd.items() if k.startswith("text_encoder.")}
            clip_encoder = CLIPTextEncoder(CLIPTextConfig.clip_l(dtype=dtype))
            clip_params = convert_clip_text(clip_sd)
        try:
            from transformers import AutoTokenizer

            clip_tok = AutoTokenizer.from_pretrained(
                "openai/clip-vit-large-patch14", local_files_only=True
            )
        except Exception:
            clip_tok = None
        # The FLUX repo ships T5-xxl as text_encoder_2 — build the text
        # embedder from it so [image; text] composition works without a
        # separate flan-t5 download (reference encode_prompt uses the
        # pipeline's own T5, flux_prompt.py:96-104).
        t5_embedder = None
        t5_sub = {k.split(".", 1)[1]: v for k, v in (sd or {}).items()
                  if k.startswith("text_encoder_2.")}
        if t5_sub:
            try:
                from transformers import AutoTokenizer as _AT

                from thinkdiff_tpu.models.convert import convert_t5
                from thinkdiff_tpu.models.t5 import (
                    T5Config, T5ForConditionalGeneration,
                )

                np_dtype = (np.dtype(jnp.bfloat16)
                            if dtype == jnp.bfloat16 else None)
                t5_cfg = T5Config.flan_t5_xxl(dtype=dtype, dropout_rate=0.0)
                t5_params = convert_t5(t5_sub, dtype=np_dtype)
                t5_tok = _AT.from_pretrained(
                    "google/flan-t5-xxl", local_files_only=True)
                t5_embedder = T5TextEmbedder(
                    T5ForConditionalGeneration(t5_cfg),
                    {"params": t5_params}, t5_tok)
            except Exception as e:
                logger.warning("FLUX text_encoder_2 present but T5 embedder "
                               "unavailable: %s", e)
        return cls(sampler, clip_encoder, clip_params, clip_tok,
                   t5_embedder=t5_embedder)

    # -- encode_prompt (reference flux_prompt.py:37-121) ---------------------
    def pooled_from_prompt(self, prompt: str, batch: int = 1) -> np.ndarray:
        """CLIP-L pooled embeds of the text prompt (empty string at ThinkDiff
        inference — reference passes prompt='')."""
        if self.clip_encoder is None or self.clip_tokenizer is None:
            # zero pooled conditioning when no CLIP is available
            return np.zeros(
                (batch, self.sampler.cfg.pooled_projection_dim), np.float32
            )
        key = (prompt, batch)
        if key not in self._pooled_cache:
            ids = self.clip_tokenizer(
                [prompt] * batch, padding="max_length", max_length=77,
                truncation=True, return_tensors="np",
            )["input_ids"]
            _, pooled = self.clip_encoder.apply(
                {"params": self.clip_params}, jnp.asarray(ids)
            )
            self._pooled_cache[key] = np.asarray(pooled, np.float32)
        return self._pooled_cache[key]

    def encode_prompt(self, prompt: str = "", prompt_embeds=None,
                      batch: int = 1):
        """Pass external embeds through; pooled from the text prompt."""
        assert prompt_embeds is not None, "ThinkDiff always supplies embeds"
        prompt_embeds = jnp.asarray(prompt_embeds)
        if prompt_embeds.ndim == 2:
            prompt_embeds = prompt_embeds[None]
        pooled = self.pooled_from_prompt(prompt, batch=prompt_embeds.shape[0])
        return prompt_embeds, pooled

    # -- generation ----------------------------------------------------------
    def generate(self, prompt_embeds, prompt: str = "", height: int = 1024,
                 width: int = 1024, num_steps: int = 28,
                 guidance: float = 3.5, seed: int = 0):
        embeds, pooled = self.encode_prompt(prompt, prompt_embeds)
        return self.sampler.sample(
            embeds, pooled, height=height, width=width, num_steps=num_steps,
            guidance=guidance, seed=seed,
        )

    def compose_clip_condition(self, image_projections: Sequence[Any],
                               text_embeds=None, max_len: Optional[int] = None):
        """ThinkDiff-CLIP multi-image composition: concat per-image projected
        tokens then text embeds (reference scripts/test/..._flux.py:170-194,
        216)."""
        parts = [jnp.asarray(p) for p in image_projections]
        if text_embeds is not None:
            parts.append(jnp.asarray(text_embeds))
        cond = jnp.concatenate(parts, axis=-2)
        if max_len is not None:
            cond = cond[..., :max_len, :]
        return cond
