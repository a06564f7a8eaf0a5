#!/usr/bin/env bash
# ThinkDiff-CLIP image+text -> CogVideoX video
# (reference runs/test_thinkdiff_clip_video_text.sh)
CFG=${1:-configs/test_thinkdiff_clip_video_text.yaml}
python -m scripts.test.test_blip_vision_t5_decoder_cogvideo --cfg-path "$CFG" "${@:2}"
