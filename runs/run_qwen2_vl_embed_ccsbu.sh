#!/usr/bin/env bash
CFG=${1:-configs/qwen2_vl_embed_ccsbu.yaml}
python -m scripts.generate_embedding_webdataset --cfg-path "$CFG" "${@:2}"
