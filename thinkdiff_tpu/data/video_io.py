"""Video IO without native media dependencies.

The reference writes MP4 via diffusers' export_to_video (imageio+ffmpeg) and
reads videos with decord (reference
scripts/test/test_blip_vision_t5_decoder_cogvideo.py:186-189,
thinkdiff/datasets/data_utils.py:18-29). Neither ships in this environment,
so the native format here is **MJPEG-in-AVI**, written and parsed in pure
Python (RIFF container, one JPEG per frame, playable everywhere), with:

  - ``save_video(frames, path)``: .avi (pure python) | .mp4 (ffmpeg when
    present) | directory of PNGs (fallback for any path without a video
    extension)
  - ``VideoReader``: decord-compatible surface (len, __getitem__,
    get_batch) for .avi written here; other containers go through ffmpeg
    when available.
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import subprocess
from typing import List, Sequence

import numpy as np


# ------------------------------- writing ------------------------------------


def _jpeg_bytes(frame: np.ndarray, quality: int = 92) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def write_mjpeg_avi(frames: Sequence[np.ndarray], path: str, fps: int = 8,
                    quality: int = 92) -> str:
    """frames: list of (H, W, 3) uint8 -> MJPEG AVI file."""
    assert len(frames) > 0, "no frames"
    h, w = frames[0].shape[:2]
    jpegs = [_jpeg_bytes(np.asarray(f, np.uint8), quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 // fps), max_size * fps, 0, 0x10,  # usec/frame, rate, pad, HASINDEX
        len(jpegs), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs),
        max_size, 0xFFFFFFFF, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))
    ) + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body

    movi_chunks, idx, offset = [], [], 4
    for j in jpegs:
        c = chunk(b"00dc", j)
        movi_chunks.append(c)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        offset += len(c)
    movi_body = b"movi" + b"".join(movi_chunks)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = chunk(b"idx1", b"".join(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)
    return path


def save_video(frames, path: str, fps: int = 8) -> str:
    """frames: (T, H, W, 3) uint8 array or list of frames/PIL images."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    ext = os.path.splitext(path)[1].lower()
    if path.endswith(os.sep) or ext == "":
        os.makedirs(path, exist_ok=True)
        from PIL import Image

        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(path, f"frame_{i:05d}.png"))
        return path
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if ext == ".avi":
        return write_mjpeg_avi(frames, path, fps=fps)
    if ext in (".mp4", ".mkv", ".webm"):
        if shutil.which("ffmpeg"):
            tmp = path + ".tmp.avi"
            write_mjpeg_avi(frames, tmp, fps=fps)
            subprocess.run(["ffmpeg", "-y", "-i", tmp, "-pix_fmt", "yuv420p",
                            path], check=True, capture_output=True)
            os.remove(tmp)
            return path
        # no ffmpeg: fall back to AVI next to the requested name
        alt = os.path.splitext(path)[0] + ".avi"
        write_mjpeg_avi(frames, alt, fps=fps)
        return alt
    raise ValueError(f"unsupported video extension '{ext}'")


# ------------------------------- reading ------------------------------------


def _parse_riff_frames(data: bytes) -> List[bytes]:
    """Every '00dc'/'00db' chunk payload in an AVI byte string."""
    frames = []
    pos = 12  # RIFF....AVI_
    end = len(data)
    stack = [end]
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if fourcc in (b"LIST", b"RIFF"):
            pos += 12  # descend into the list
            continue
        if fourcc in (b"00dc", b"00db") and size:
            frames.append(data[pos + 8:pos + 8 + size])
        pos += 8 + size + (size % 2)
    return frames


class VideoReader:
    """decord.VideoReader-compatible frame access (reference
    data_utils.py:18-29 bridges decord to torch; here frames are numpy).

    Pure-python for MJPEG AVI; other containers use ffmpeg when present.
    """

    def __init__(self, path: str):
        self.path = path
        if path.lower().endswith(".avi"):
            with open(path, "rb") as f:
                self._jpegs = _parse_riff_frames(f.read())
            if not self._jpegs:
                raise ValueError(f"no frames found in {path}")
        elif os.path.isdir(path):
            from PIL import Image  # PNG-sequence directory

            self._files = sorted(
                os.path.join(path, n) for n in os.listdir(path)
                if n.endswith(".png"))
            self._jpegs = None
            if not self._files:
                raise ValueError(f"no frames found in {path}")
        else:
            if not shutil.which("ffmpeg"):
                raise RuntimeError(
                    f"reading '{path}' needs ffmpeg (only MJPEG .avi and "
                    "PNG directories are supported natively)")
            tmp = path + ".frames"
            os.makedirs(tmp, exist_ok=True)
            subprocess.run(
                ["ffmpeg", "-y", "-i", path,
                 os.path.join(tmp, "frame_%05d.png")],
                check=True, capture_output=True)
            self._files = sorted(
                os.path.join(tmp, n) for n in os.listdir(tmp))
            self._jpegs = None

    def __len__(self):
        return len(self._jpegs if self._jpegs is not None else self._files)

    def _decode(self, i: int) -> np.ndarray:
        from PIL import Image

        if self._jpegs is not None:
            img = Image.open(io.BytesIO(self._jpegs[i]))
        else:
            img = Image.open(self._files[i])
        return np.asarray(img.convert("RGB"), np.uint8)

    def __getitem__(self, i: int) -> np.ndarray:
        if i < 0:
            i += len(self)
        return self._decode(i)

    def get_batch(self, indices) -> np.ndarray:
        return np.stack([self[int(i)] for i in indices])

    def get_avg_fps(self) -> float:
        return 8.0
