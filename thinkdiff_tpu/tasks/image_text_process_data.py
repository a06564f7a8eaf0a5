"""Embedding-precompute task: inference + WebDataset export loop
(reference: thinkdiff/tasks/image_text_process_data.py:35-156).

The model (a VLM generation engine wrapper) maps a host batch of
images+prompts to generated text, token ids and hidden-state embeddings; this
task streams them back out as WebDataset shards whose field layout matches
the reference exactly (``{layer}.input_embed.pth`` / ``{layer}.output_embed.pth``
torch-loadable buffers, enriched ``json`` — reference :94-118), so shards are
interchangeable between frameworks.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import numpy as np

from thinkdiff_tpu.core.logging import MetricLogger, SmoothedValue
from thinkdiff_tpu.core.registry import registry
from thinkdiff_tpu.data.tario import ShardWriter
from thinkdiff_tpu.tasks.base_task import BaseTask

logger = logging.getLogger(__name__)


@registry.register_task("image_text_process_data")
class ImageTextProcessDataTask(BaseTask):
    def process_epoch(self, model, data_loader, output_shard_path,
                      log_freq: int = 1, max_batches=None):
        """output_shard_path: [dir, pattern, start_shard] (reference config
        key ``run.output_shard_path``)."""
        shard_dir, pattern, start_shard = output_shard_path
        os.makedirs(shard_dir, exist_ok=True)
        writer = ShardWriter(
            os.path.join(shard_dir, pattern), maxsize=5e8,
            start_shard=int(start_shard),
        )
        metric_logger = MetricLogger(delimiter="  ")
        metric_logger.add_meter("samples", SmoothedValue(fmt="{value:.0f}"))

        n_total = 0
        with writer:
            for bi, batch in enumerate(
                metric_logger.log_every(data_loader, log_freq, "Process:")
            ):
                if max_batches is not None and bi >= max_batches:
                    break
                result = model.forward(batch)
                layer = result.get("embedding_layer_name", "model.norm")
                n = len(result["generated_texts"])
                for i in range(n):
                    json_payload = dict(batch["jsons"][i]) if batch.get("jsons") else {}
                    # Field names match the reference shard contract exactly
                    # (reference image_text_process_data.py:96-101:
                    # generated_text / input_prompt / input_prompt_token_ids /
                    # output_text / output_token_ids).
                    json_payload.update({
                        "generated_text": result["generated_texts"][i],
                        "input_prompt": result["input_prompts"][i],
                        "input_prompt_token_ids": [
                            int(t) for t in result["prompt_token_ids"][i]
                        ],
                        "output_text": result["generated_texts"][i],
                        "output_token_ids": [int(t) for t in result["output_token_ids"][i]],
                    })
                    sample = {
                        "__key__": batch["filenames"][i] or f"{n_total:09d}",
                        "json": json_payload,
                        # dtype preserved (engine emits bf16 — the same
                        # torch-bf16 the reference's vLLM-written shards
                        # carry; tario's .pth encoder bit-casts exactly)
                        f"{layer}.input_embed.pth": np.asarray(
                            result["prompt_hidden_states"][i]),
                        f"{layer}.output_embed.pth": np.asarray(
                            result["hidden_states"][i]),
                    }
                    if batch.get("images") is not None:
                        sample["jpg"] = batch["images"][i]
                    writer.write(sample)
                    n_total += 1
                metric_logger.update(samples=n_total)
        logger.info("Wrote %d samples into shards at %s", n_total, shard_dir)
        return {"num_samples": n_total, "num_shards": writer.shard - int(start_shard)}
