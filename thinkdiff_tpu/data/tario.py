"""WebDataset-format tar shard IO, dependency-free.

The reference streams/writes WebDataset tars through the ``webdataset`` and
``wids`` packages (reference: thinkdiff/datasets/datasets/cc_sbu_dataset.py,
thinkdiff/tasks/image_text_process_data.py:75). Format compatibility is the
contract: shards written here are byte-compatible WebDataset tars (samples =
tar members grouped by basename, extensions as field names), so artifacts
interchange with the reference pipeline in both directions.
"""

from __future__ import annotations

import io
import json
import os
import re
import tarfile
import time
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple


def brace_expand(pattern: str) -> List[str]:
    """Expand ``{000000..000048}``-style numeric braces (webdataset URL style)."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if not m:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(brace_expand(pattern[: m.start()] + str(i).zfill(width)
                                + pattern[m.end():]))
    return out


def split_key_ext(name: str) -> Tuple[str, str]:
    """webdataset convention: key = up to FIRST dot of the basename; the rest
    is the (possibly dotted) extension, e.g. ``abc.norm.output_embed.pth``."""
    base = name.split("/")[-1]
    if "." not in base:
        return base, ""
    key, ext = base.split(".", 1)
    return key, ext


def tar_sample_iterator(path: str, decode: bool = False) -> Iterator[Dict[str, Any]]:
    """Iterate samples from one tar shard: consecutive members sharing a key
    become one dict {"__key__": key, ext: bytes}."""
    with tarfile.open(path, "r|*") as tf:  # streaming mode
        current_key: Optional[str] = None
        sample: Dict[str, Any] = {}
        for member in tf:
            if not member.isfile():
                continue
            key, ext = split_key_ext(member.name)
            if current_key is not None and key != current_key:
                yield sample
                sample = {}
            current_key = key
            sample["__key__"] = key
            data = tf.extractfile(member).read()
            sample[ext] = decode_field(ext, data) if decode else data
        if sample:
            yield sample


def decode_field(ext: str, data: bytes) -> Any:
    """webdataset-style auto decode by extension."""
    last = ext.split(".")[-1]
    if last in ("jpg", "jpeg", "png", "webp"):
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        return img.convert("RGB")
    if last == "json":
        return json.loads(data)
    if last in ("txt", "text"):
        return data.decode("utf-8")
    if last == "npy":
        import numpy as np

        return np.load(io.BytesIO(data), allow_pickle=False)
    if last in ("pth", "pt"):
        import torch

        obj = torch.load(io.BytesIO(data), map_location="cpu", weights_only=True)
        if not isinstance(obj, torch.Tensor):
            return obj
        if obj.dtype == torch.bfloat16:
            # numpy has no native bfloat16: bit-cast through uint16 into
            # ml_dtypes.bfloat16 (exact, and what reference/vLLM-written
            # embed shards actually contain).
            import ml_dtypes
            import numpy as np

            return (
                obj.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            )
        try:
            return obj.numpy()
        except TypeError:
            return obj.float().numpy()
    return data


def encode_field(ext: str, value: Any) -> bytes:
    if isinstance(value, bytes):
        return value
    last = ext.split(".")[-1]
    if last == "json":
        return json.dumps(value).encode("utf-8")
    if last in ("txt", "text"):
        return str(value).encode("utf-8")
    if last == "npy":
        import numpy as np

        buf = io.BytesIO()
        np.save(buf, np.asarray(value), allow_pickle=False)
        return buf.getvalue()
    if last in ("pth", "pt"):
        # Keep .pth fields torch-loadable for reference interchange
        # (reference image_text_process_data.py:111-116 uses torch.save).
        import numpy as np
        import torch

        arr = np.asarray(value)
        if arr.dtype.name == "bfloat16":
            # torch doesn't know ml_dtypes: bit-cast uint16 -> torch bf16
            # (exact; the reference's shards store torch bf16 tensors)
            tensor = torch.from_numpy(
                np.ascontiguousarray(arr).view(np.uint16)
            ).view(torch.bfloat16)
        else:
            tensor = torch.as_tensor(arr)
        buf = io.BytesIO()
        torch.save(tensor, buf)
        return buf.getvalue()
    if last in ("jpg", "jpeg", "png", "webp"):
        from PIL import Image

        if isinstance(value, Image.Image):
            buf = io.BytesIO()
            value.save(buf, format="JPEG" if last in ("jpg", "jpeg") else last.upper())
            return buf.getvalue()
    raise TypeError(f"Cannot encode field .{ext} from {type(value)}")


class ShardWriter:
    """Rolling tar shard writer, same surface as wds.ShardWriter
    (reference image_text_process_data.py:75:
    ``wds.ShardWriter(pattern, maxsize=5e8, start_shard=...)``)."""

    def __init__(self, pattern: str, maxsize: float = 5e8, maxcount: int = 100000,
                 start_shard: int = 0):
        self.pattern = pattern
        self.maxsize = maxsize
        self.maxcount = maxcount
        self.shard = start_shard
        self.tar: Optional[tarfile.TarFile] = None
        self.count = 0
        self.size = 0
        self.total = 0
        self.fname: Optional[str] = None

    def _next_stream(self):
        self.close_current()
        self.fname = self.pattern % self.shard
        os.makedirs(os.path.dirname(os.path.abspath(self.fname)), exist_ok=True)
        self.tar = tarfile.open(self.fname, "w")
        self.shard += 1
        self.count = 0
        self.size = 0

    def write(self, sample: Dict[str, Any]):
        if (self.tar is None or self.size >= self.maxsize
                or self.count >= self.maxcount):
            self._next_stream()
        key = sample["__key__"]
        now = time.time()
        for ext, value in sample.items():
            if ext == "__key__":
                continue
            data = encode_field(ext, value)
            info = tarfile.TarInfo(name=f"{key}.{ext}")
            info.size = len(data)
            info.mtime = now
            self.tar.addfile(info, io.BytesIO(data))
            self.size += len(data)
        self.count += 1
        self.total += 1

    def close_current(self):
        if self.tar is not None:
            self.tar.close()
            self.tar = None

    def close(self):
        self.close_current()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def build_tar_index(path: str, items_per_sample: Optional[int] = None) -> Dict[str, Any]:
    """Count samples in a tar (for wids-style index JSON; reference
    scripts/get_wids_input_json_para.py:10-49 divides member count by
    items-per-sample — here we count distinct keys exactly)."""
    keys = set()
    nfiles = 0
    with tarfile.open(path, "r|*") as tf:
        for member in tf:
            if member.isfile():
                nfiles += 1
                keys.add(split_key_ext(member.name)[0])
    n = nfiles // items_per_sample if items_per_sample else len(keys)
    return {"url": path, "nsamples": n}


def write_wids_index(shards: Iterable[str], out_path: str, name: str = "dataset",
                     items_per_sample: Optional[int] = None) -> Dict[str, Any]:
    index = {
        "__kind__": "wids-shard-index-v1",
        "wids_version": 1,
        "name": name,
        "shardlist": [build_tar_index(s, items_per_sample) for s in shards],
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(index, f, indent=4)
    return index
