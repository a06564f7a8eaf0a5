#!/usr/bin/env bash
CFG=${1:-configs/train_thinkdiff_clip.yaml}
python -m train --cfg-path "$CFG" "${@:2}"
