"""Llama-family causal LM, expressed over the Qwen2 decoder stack.

The reference carries a LlamaForCausalLM wrapper with a per-sample-loss
``reduction`` knob (reference: thinkdiff/models/modeling_llama.py:78-111,
used only by BaseModel.init_llm). Architecturally Llama == Qwen2 minus the
q/k/v biases and with plain 1D RoPE, so this module reuses Qwen2Decoder
via config (equal mrope sections + equal position ids == standard RoPE).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from thinkdiff_tpu.models.qwen2_vl import Qwen2VLConfig, Qwen2VLModel


def llama_config(vocab_size=32000, hidden_size=4096, intermediate_size=11008,
                 num_layers=32, num_heads=32, num_kv_heads=32,
                 rope_theta=10000.0, dtype=jnp.float32, **kw) -> Qwen2VLConfig:
    head_dim = hidden_size // num_heads
    third = head_dim // 6
    # equal-ish sections summing to head_dim//2; with equal t/h/w position
    # ids this is numerically identical to standard RoPE.
    sections = (head_dim // 2 - 2 * third, third, third)
    return Qwen2VLConfig(
        vocab_size=vocab_size, hidden_size=hidden_size,
        intermediate_size=intermediate_size, num_layers=num_layers,
        num_heads=num_heads, num_kv_heads=num_kv_heads,
        rope_theta=rope_theta, mrope_section=sections,
        tie_word_embeddings=False, dtype=dtype, **kw,
    )


class LlamaForCausalLM:
    """Functional wrapper with the reference's ``reduction`` semantics.

    ``lora_r > 0`` reproduces BaseModel.init_llm's peft path (reference
    base_model.py:190-201): rank-r adapters on ``lora_target_modules``
    become the ONLY trainable subtree (``trainable_params``); the base tree
    stays frozen and the merge happens functionally inside the forward
    (models/lora.py)."""

    def __init__(self, cfg: Qwen2VLConfig, params, *, lora_r: int = 0,
                 lora_target_modules=("q_proj", "v_proj"),
                 lora_alpha: Optional[float] = None, lora_rng=None):
        self.cfg = cfg
        self.params = params
        self.model = Qwen2VLModel(cfg)
        self.adapters = None
        self.lora_scale = 1.0
        if lora_r > 0:
            from thinkdiff_tpu.models.lora import init_lora, lora_scale

            self.adapters = init_lora(
                lora_rng if lora_rng is not None else jax.random.PRNGKey(0),
                params, lora_r, targets=tuple(lora_target_modules),
                alpha=lora_alpha)
            self.lora_scale = lora_scale(lora_r, lora_alpha)

    def trainable_params(self):
        """peft ``print_trainable_parameters`` analog: adapters or nothing
        (reference freezes ALL llama params when lora_r == 0)."""
        return self.adapters if self.adapters is not None else {}

    def __call__(self, input_ids, labels=None, reduction: str = "mean",
                 adapters=None):
        adapters = adapters if adapters is not None else self.adapters
        params = self.params
        if adapters:
            from thinkdiff_tpu.models.lora import merge_lora

            params = merge_lora(params, adapters, scale=self.lora_scale)
        t = input_ids.shape[1]
        pos = jnp.broadcast_to(
            jnp.arange(t)[None, None], (3, input_ids.shape[0], t)
        )
        logits, hidden, _ = self.model.apply(
            {"params": params}, input_ids=input_ids, position_ids=pos
        )
        if labels is None:
            return {"logits": logits}
        shift_logits = logits[:, :-1].astype(jnp.float32)
        shift_labels = labels[:, 1:]
        valid = shift_labels != -100
        safe = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        tok_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        tok_loss = -tok_ll * valid
        if reduction == "none":
            # per-sample mean loss (reference modeling_llama.py:78-81)
            loss = tok_loss.sum(-1) / jnp.maximum(valid.sum(-1), 1)
        else:
            loss = tok_loss.sum() / jnp.maximum(valid.sum(), 1)
        return {"loss": loss, "logits": logits}
