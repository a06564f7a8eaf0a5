"""Build a wids-shard-index-v1 JSON for a set of tar shards (reference:
scripts/get_wids_input_json_para.py:10-49 — parallel member counting).

Usage:
  python -m scripts.get_wids_input_json --shards '/data/cc_sbu/{00000..01254}.tar' \\
      --output configs/datasets/cc_sbu_wids_shards.json --name cc_sbu
"""

import argparse
import json
import os
import sys
from multiprocessing import Pool
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from thinkdiff_tpu.data.tario import brace_expand, build_tar_index  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--shards", required=True,
                        help="brace pattern or comma-separated tar paths")
    parser.add_argument("--output", required=True)
    parser.add_argument("--name", default="dataset")
    parser.add_argument("--items-per-sample", type=int, default=None)
    parser.add_argument("--workers", type=int, default=16)
    args = parser.parse_args()

    shards = []
    for part in args.shards.split(","):
        shards.extend(brace_expand(part.strip()))
    shards = [s for s in shards if os.path.exists(s)]
    with Pool(args.workers) as pool:
        entries = pool.starmap(
            build_tar_index, [(s, args.items_per_sample) for s in shards]
        )
    index = {
        "__kind__": "wids-shard-index-v1",
        "wids_version": 1,
        "name": args.name,
        "shardlist": entries,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(index, f, indent=4)
    total = sum(e["nsamples"] for e in entries)
    print(f"indexed {len(entries)} shards, {total} samples -> {args.output}")


if __name__ == "__main__":
    main()
