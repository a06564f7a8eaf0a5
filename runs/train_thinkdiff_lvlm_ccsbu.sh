#!/usr/bin/env bash
# Usage: bash runs/train_thinkdiff_lvlm_ccsbu.sh [cfg]
# (reference runs/train_thinkdiff_lvlm_ccsbu.sh used torchrun; on TPU one
#  process per host is enough — JAX addresses all local chips.)
CFG=${1:-configs/train_thinkdiff_lvlm_ccsbu.yaml}
python -m train --cfg-path "$CFG" "${@:2}"
