#!/usr/bin/env bash
# Two-image ThinkDiff-CLIP composition -> FLUX
# (reference runs/test_thinkdiff_clip_two_images.sh — gpu pinning replaced
# by the JAX device env; pass extra --options after the config)
CFG=${1:-configs/test_thinkdiff_clip_two_images.yaml}
python -m scripts.test.test_blip_vision_t5_decoder_flux --cfg-path "$CFG" "${@:2}"
