#!/usr/bin/env bash
CFG=${1:-configs/test_thinkdiff_lvlm_ccsbu_image_text.yaml}
python -m scripts.test.test_mllama_t5_decoder_flux --cfg-path "$CFG" "${@:2}"
