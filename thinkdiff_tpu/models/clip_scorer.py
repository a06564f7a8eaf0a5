"""CLIP dual-encoder scorer — the CoBSAT accuracy judge.

The CoBSAT benchmark (the reference's headline metric, README.md:27 — 46.3%
multimodal in-context reasoning accuracy) scores each generated image with a
CLIP classifier: the image embedding is compared against text prompts for
every candidate label of (a) the LATENT variable the model must infer from
the demonstration images and (b) the EXPLICIT attribute named in the final
text input; the prediction is correct iff BOTH argmaxes hit the ground
truth. The reference repo delegates scoring to the external CoBSAT
evaluation code; this module is the in-tree equivalent so weight-day needs
one command (scripts/score_cobsat.py).

Weights: ``from_pretrained("openai/clip-vit-large-patch14")`` via the local
HF cache (zero-egress: ``maybe_load_hf_weights``); both towers reuse the
in-tree ViT (models/vit.py, ``ViTConfig.clip_vit_l``) and CLIP text encoder
(models/clip_text.py) with the existing converters.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from thinkdiff_tpu.models.clip_text import (
    CLIPTextConfig, CLIPTextEncoder, convert_clip_text,
)
from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer

logger = logging.getLogger(__name__)

# HF CLIPImageProcessor constants (openai/clip-vit-large-patch14)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip_image(img, image_size: int = 224) -> np.ndarray:
    """PIL image -> (H, W, 3) float32, CLIP resize+center-crop+normalize."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(image_size, int(round(w * scale))),
                      max(image_size, int(round(h * scale)))),
                     Image.Resampling.BICUBIC)
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


class CLIPScorer:
    """Dual-encoder similarity scorer.

    ``params`` = {"vision": ..., "text": ..., "visual_projection" (Dv, P),
    "text_projection" (Dt, P)}; embeddings are L2-normalized so ``classify``
    returns cosine similarities (the CLIP logit scale is monotonic and
    irrelevant for argmax classification).
    """

    def __init__(self, vit_cfg: ViTConfig, text_cfg: CLIPTextConfig,
                 params: Dict[str, Any], tokenizer=None):
        self.vit_cfg = vit_cfg
        self.text_cfg = text_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.vision = VisionTransformer(vit_cfg)
        self.text = CLIPTextEncoder(text_cfg)
        self._img_fn = None
        self._txt_fn = None

    @classmethod
    def from_pretrained(cls, path: str = "openai/clip-vit-large-patch14"):
        from thinkdiff_tpu.models.base import maybe_load_hf_weights

        sd = maybe_load_hf_weights(path)
        if sd is None:
            raise FileNotFoundError(f"CLIP weights not found for {path}")
        vit_cfg = ViTConfig.clip_vit_l()
        text_cfg = CLIPTextConfig.clip_l()
        from thinkdiff_tpu.models.convert import convert_clip_vit

        params = {
            "vision": convert_clip_vit(sd, prefix="vision_model."),
            "text": convert_clip_text(sd, prefix="text_model."),
            "visual_projection": np.asarray(sd["visual_projection.weight"]).T,
            "text_projection": np.asarray(sd["text_projection.weight"]).T,
        }
        tok = None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        except Exception as e:  # zero-egress without cached tokenizer
            logger.warning("CLIP tokenizer unavailable: %s", e)
        return cls(vit_cfg, text_cfg, params, tokenizer=tok)

    # -- encoders -----------------------------------------------------------
    def encode_images(self, images: Sequence[Any]) -> np.ndarray:
        """PIL images (or pre-processed (H, W, 3) arrays) -> (B, P)
        L2-normalized embeddings."""
        arrs = [img if isinstance(img, np.ndarray)
                else preprocess_clip_image(img, self.vit_cfg.image_size)
                for img in images]
        if self._img_fn is None:
            @jax.jit
            def run(params, pixels):
                hidden = self.vision.apply({"params": params["vision"]},
                                           pixels)
                pooled = hidden[:, 0]  # post-norm CLS (HF pooler_output)
                emb = pooled @ jnp.asarray(params["visual_projection"],
                                           pooled.dtype)
                return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

            self._img_fn = run
        return np.asarray(self._img_fn(self.params, jnp.asarray(
            np.stack(arrs))))

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        """-> (N, P) L2-normalized embeddings."""
        assert self.tokenizer is not None, "no CLIP tokenizer available"
        ids = [self.tokenizer.encode(t)[: self.text_cfg.max_positions]
               for t in texts]
        t_max = max(len(i) for i in ids)
        batch = np.full((len(ids), t_max), self.text_cfg.eos_token_id,
                        np.int32)
        for r, i in enumerate(ids):
            batch[r, : len(i)] = i
        if self._txt_fn is None:
            @jax.jit
            def run(params, input_ids):
                _, pooled = self.text.apply({"params": params["text"]},
                                            input_ids)
                emb = pooled @ jnp.asarray(params["text_projection"],
                                           pooled.dtype)
                return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

            self._txt_fn = run
        return np.asarray(self._txt_fn(self.params, jnp.asarray(batch)))

    def classify(self, images: Sequence[Any],
                 candidate_texts: Sequence[str]) -> np.ndarray:
        """(B, N) cosine similarities image x candidate text."""
        return self.encode_images(images) @ self.encode_texts(
            candidate_texts).T
