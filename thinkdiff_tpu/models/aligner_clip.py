"""ThinkDiff-CLIP aligner: frozen BLIP-2/CLIP ViT -> trainable MLP projector
-> frozen T5, trained with caption-split cross-entropy.

TPU-native re-design of the reference ``blip-vision-t5-decoder``
(reference: thinkdiff/models/blip_vision_t5_decoder.py:256-642):
  - the caption random-split + tokenization is host-side collator work
    (see thinkdiff_tpu/data/collators.py), so the model's loss is a pure
    static-shape jittable function of arrays;
  - frozen towers live in a separate bf16 ``frozen`` pytree (no optimizer
    state, no grads — the reference freezes via requires_grad=False);
  - the optional ``vision_downsample_factor`` CLS-preserving bilinear pool
    (reference :393-410) runs on device inside the jitted step.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from thinkdiff_tpu.core.config import ConfigNode
from thinkdiff_tpu.core.registry import registry
from thinkdiff_tpu.models.base import BaseModel, maybe_load_hf_weights, str_to_dtype
from thinkdiff_tpu.models.convert import convert_clip_vit, convert_t5
from thinkdiff_tpu.models.projector import (
    build_vision_projector, convert_projector_torch,
)
from thinkdiff_tpu.models.t5 import (
    T5Config, T5ForConditionalGeneration, ce_stats, cross_entropy_loss,
    shift_right,
)
from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer, vision_downsample

logger = logging.getLogger(__name__)


@registry.register_model("blip-vision-t5-decoder")
class BlipVisionT5Decoder(BaseModel):
    default_model_type = "pretrain_flant5xxl"
    PRETRAINED_MODEL_CONFIG_DICT = {
        "pretrain_blip_vision_t5_decoder":
            "configs/models/blip_vision_t5_decoder.yaml",
    }
    DEFAULT_CONFIG = {
        "mm_projector_type": "mlp2x_gelu_t5_norm",
        "dtype": "bfloat16",
        "max_txt_len": 128,
        "vision_downsample_factor": None,
        "layer_norm_reinit_weight_with_language_encoder": False,
    }

    def __init__(self, cfg: Optional[ConfigNode] = None, seed: int = 0):
        super().__init__(cfg)
        cfg = self.cfg
        self.dtype = str_to_dtype(cfg.get("dtype", "bfloat16"))
        # quantize_frozen: None | "int8" (weight-only) | "int8_dyn" (w8a8)
        qmode = cfg.get("quantize_frozen", None)
        if qmode not in (None, "int8", "int8_dyn"):
            raise ValueError(f"Unsupported quantize_frozen '{qmode}'")
        self.quantize_frozen = qmode is not None
        t5_over = dict(cfg.get("t5_config", {}))
        vit_over = dict(cfg.get("vision_config", {}))
        self.t5_cfg = T5Config(**{
            **dict(dtype=self.dtype, dropout_rate=0.0,
                   quant_int8={"int8": True, "int8_dyn": "w8a8"}.get(
                       qmode, False)),
            **t5_over,
        })
        self.vit_cfg = ViTConfig(**{**dict(dtype=self.dtype), **vit_over})
        self.t5 = T5ForConditionalGeneration(self.t5_cfg)
        self.vision = VisionTransformer(self.vit_cfg)
        self.projector = build_vision_projector(
            cfg.get("mm_projector_type", "mlp2x_gelu_t5_norm"),
            self.t5_cfg.d_model, dtype=self.dtype,
        )
        self.downsample_factor = cfg.get("vision_downsample_factor", None)
        self._build_params(seed)

    # -- parameters ---------------------------------------------------------
    def _build_params(self, seed: int):
        import dataclasses as _dc

        cfg = self.cfg
        rng = jax.random.PRNGKey(seed)
        img = jnp.zeros(
            (1, self.vit_cfg.image_size, self.vit_cfg.image_size, 3), self.dtype
        )
        vis_vars = self.vision.init(rng, img)
        ids = jnp.zeros((1, 4), jnp.int32)
        t5_fp = T5ForConditionalGeneration(
            _dc.replace(self.t5_cfg, quant_int8=False)
        )

        def _init_fp():
            return t5_fp.init(
                {"params": rng, "dropout": rng},
                input_ids=ids, decoder_input_ids=ids,
            )

        if self.quantize_frozen:
            # random-init path (real use converts HF weights): generate +
            # quantize leaf-by-leaf on device — the fp tower never exists
            from thinkdiff_tpu.ops.quant import quantize_leaves_on_device

            shapes = jax.eval_shape(_init_fp)
            t5_vars = quantize_leaves_on_device(
                shapes, seed,
                w8a8=cfg.get("quantize_frozen") == "int8_dyn")
        else:
            t5_vars = _init_fp()

        blip_path = cfg.get("blip_pretrained_model_name_or_path",
                            "Salesforce/blip2-flan-t5-xxl")
        t5_path = cfg.get("text_pretrained_model_name_or_path", "google/flan-t5-xxl")
        if cfg.get("load_pretrained", True):
            sd = maybe_load_hf_weights(blip_path)
            if sd is not None and any(k.startswith("vision_model.") for k in sd):
                vis_vars = {"params": convert_clip_vit(
                    sd, "vision_model.", dtype=self.dtype)}
                logger.info("Loaded BLIP-2 vision weights from %s", blip_path)
            t5_sd = maybe_load_hf_weights(t5_path)
            if t5_sd is not None and "shared.weight" in t5_sd:
                t5_vars = {"params": convert_t5(t5_sd, dtype=self.dtype)}
                logger.info("Loaded T5 weights from %s", t5_path)

        t5_params = t5_vars["params"]
        if self.quantize_frozen:
            from thinkdiff_tpu.ops.quant import quantize_tree

            t5_params = quantize_tree(
                t5_params, min_size=0,
                w8a8=cfg.get("quantize_frozen") == "int8_dyn")
        self.frozen = {"vision": vis_vars["params"], "t5": t5_params}

        vis_dim = self.vit_cfg.hidden_size
        proj_vars = self.projector.init(rng, jnp.zeros((1, 1, vis_dim), self.dtype))
        proj_params = proj_vars["params"]
        if (cfg.get("layer_norm_reinit_weight_with_language_encoder", False)
                and "t5_norm" in proj_params):
            # Reference blip_vision_t5_decoder.py:530-536: init projector's
            # T5LayerNorm from the T5 *encoder* final_layer_norm.
            proj_params["t5_norm"]["weight"] = (
                self.frozen["t5"]["encoder"]["final_norm"]["weight"]
                .astype(proj_params["t5_norm"]["weight"].dtype)
            )
        self.trainable = {"projector": proj_params}

    def trainable_params(self) -> Any:
        return self.trainable

    def load_trainable(self, params: Any) -> None:
        self.trainable = jax.tree.map(jnp.asarray, params)

    def convert_reference_checkpoint(self, sd: Dict) -> Any:
        return {"projector": convert_projector_torch(
            {k: v for k, v in sd.items() if "mm_projector" in k})}

    def export_reference_checkpoint(self, trainable: Dict) -> Dict:
        from thinkdiff_tpu.models.projector import export_projector_torch

        ptype = (self.cfg.get("mm_projector_type", "mlp2x_gelu_t5_norm")
                 if getattr(self, "cfg", None) else None)
        return export_projector_torch(trainable["projector"], ptype)

    # -- pure compute -------------------------------------------------------
    def encode_image(self, frozen, pixel_values):
        """pixel_values (B, H, W, 3) -> projected tokens (B, N, d_model).
        This is the whole inference path of the reference ``forward_encoder``
        (reference blip_vision_t5_decoder.py:566-642)."""
        tokens = self.vision.apply({"params": frozen["vision"]}, pixel_values)
        tokens = jax.lax.stop_gradient(tokens)
        if self.downsample_factor:
            tokens = vision_downsample(tokens, int(self.downsample_factor))
        return tokens

    def project(self, trainable, tokens):
        return self.projector.apply({"params": trainable["projector"]}, tokens)

    def loss_fn(self, trainable, frozen, batch, rng=None):
        """batch: pixel_values (B,H,W,3); input_ids/input_mask — first caption
        half; labels (B,To) — second half with pad -> -100.
        Mirrors reference forward/forward_inner (blip_vision_t5_decoder.py:
        339-499): vision no-grad -> optional pool -> projector -> T5 with
        extra embeds -> CE.
        """
        tokens = self.encode_image(frozen, batch["pixel_values"])
        proj = self.project(trainable, tokens)
        labels = batch["labels"]
        dec_in = shift_right(labels)
        logits = self.t5.apply(
            {"params": frozen["t5"]},
            input_ids=batch["input_ids"],
            attention_mask=batch.get("input_mask"),
            decoder_input_ids=dec_in,
            extra_encoder_states=proj,
        )
        return cross_entropy_loss(logits, labels)

    def eval_metrics_fn(self, trainable, frozen, batch):
        """(loss, n_correct, n_tokens) with teacher-forced next-token
        accuracy — see aligner_lvlm.eval_metrics_fn; opt-in via
        ``run.best_metric: token_acc``."""
        tokens = self.encode_image(frozen, batch["pixel_values"])
        proj = self.project(trainable, tokens)
        labels = batch["labels"]
        logits = self.t5.apply(
            {"params": frozen["t5"]},
            input_ids=batch["input_ids"],
            attention_mask=batch.get("input_mask"),
            decoder_input_ids=shift_right(labels),
            extra_encoder_states=proj,
        )
        return ce_stats(logits, labels)

    def forward_encoder(self, pixel_values):
        """Host-callable inference: image -> aligned T5-space tokens."""
        tokens = self.encode_image(self.frozen, jnp.asarray(pixel_values))
        return self.project(self.trainable, tokens)
