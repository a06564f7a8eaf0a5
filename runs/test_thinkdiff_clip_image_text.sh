#!/usr/bin/env bash
CFG=${1:-configs/test_thinkdiff_clip_image_text.yaml}
python -m scripts.test.test_blip_vision_t5_decoder_flux --cfg-path "$CFG" "${@:2}"
