#!/bin/bash
# Round-4 authoritative embed-engine sweep (VERDICT items 1+3):
# slots 64/128/256 with sub-batched refill admission, plus the C=128
# chunked-prefill leg round 3 lost to a tunnel outage. One leg at a time
# (one chip); every leg appends one JSON line with the phase breakdown.
set -u
OUT=${1:-/tmp/sweep_r4_engine.jsonl}
COMMON="--mode paged --n 256 --iters 3 --json $OUT"
for leg in \
    "--slots 64" \
    "--slots 128" \
    "--slots 256" \
    "--slots 64 --prefill-chunk 128" \
    "--slots 128 --prefill-chunk 128" \
    ; do
  echo "=== leg: $leg ==="
  timeout 3000 python -m scripts.bench_embed_engine $COMMON $leg 2>&1 | tail -12
done
echo "=== sweep done ==="

# prefill-ahead legs (round-4 cont.): refills become page-table updates
for leg in \
    "--slots 64 --prefill-chunk 128 --preadmit 64" \
    "--slots 128 --prefill-chunk 128 --preadmit 64" \
    ; do
  echo "=== leg: $leg ==="
  timeout 3000 python -m scripts.bench_embed_engine $COMMON $leg 2>&1 | tail -12
done
