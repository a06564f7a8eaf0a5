#!/usr/bin/env bash
# ThinkDiff-LVLM multi-image CoBSAT inference
# (reference runs/test_thinkdiff_lvlm.sh — its hardcoded
# qwen2_vl_vllm_mi_embed_decoder_ccsub_1_generate.yaml maps to the
# multi-image section of test_thinkdiff_lvlm_ccsbu_image_text.yaml here)
CFG=${1:-configs/test_thinkdiff_lvlm_ccsbu_image_text.yaml}
python -m scripts.test.test_mllama_t5_decoder_flux_multi_image --cfg-path "$CFG" "${@:2}"
