"""Native IO library: tar indexing parity with Python tarfile, pread sample
reads, JPEG decode correctness vs PIL, fused batch decode+resize+normalize vs
the Python processor."""

import io

import numpy as np
import pytest

from thinkdiff_tpu.data import native
from thinkdiff_tpu.data.processors import CLIP_MEAN, CLIP_STD, BlipImageEvalProcessor
from thinkdiff_tpu.data.tario import ShardWriter

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


def _jpeg_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("native")
    rs = np.random.RandomState(0)
    with ShardWriter(str(tmp / "%06d.tar"), maxcount=100) as w:
        for i in range(5):
            img = Image.fromarray((rs.rand(40, 32, 3) * 255).astype("uint8"))
            w.write({"__key__": f"{i:04d}", "jpg": img,
                     "json": {"caption": f"c{i}"}})
    return str(tmp / "000000.tar")


def test_tar_index_matches_tarfile(shard):
    import tarfile

    idx = native.NativeTarIndex(shard)
    with tarfile.open(shard) as tf:
        ref = [(m.name, m.offset_data, m.size) for m in tf.getmembers()
               if m.isfile()]
    assert idx.members == ref


def test_pread_roundtrip(shard):
    import tarfile

    idx = native.NativeTarIndex(shard)
    name, off, size = idx.members[2]
    data = idx.read(off, size)
    with tarfile.open(shard) as tf:
        ref = tf.extractfile(name).read()
    assert data == ref


def test_jpeg_decode_matches_pil():
    from PIL import Image

    rs = np.random.RandomState(1)
    arr = (rs.rand(33, 47, 3) * 255).astype("uint8")
    data = _jpeg_bytes(arr)
    ours = native.decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == ref.shape
    # identical libjpeg under the hood -> near-exact
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_batch_decode_resize_normalize_close_to_python():
    rs = np.random.RandomState(2)
    jpegs = [
        _jpeg_bytes((rs.rand(50 + 7 * i, 40, 3) * 255).astype("uint8"))
        for i in range(6)
    ]
    out = native.decode_resize_normalize_batch(jpegs, 32, CLIP_MEAN, CLIP_STD)
    assert out.shape == (6, 32, 32, 3)
    proc = BlipImageEvalProcessor(image_size=32)
    from PIL import Image

    for i in range(6):
        ref = proc(Image.open(io.BytesIO(jpegs[i])))
        # PIL's bicubic uses a slightly different kernel support; allow
        # modest per-pixel deviation but require strong global agreement.
        diff = np.abs(out[i] - ref)
        assert np.median(diff) < 0.05
        corr = np.corrcoef(out[i].ravel(), np.asarray(ref).ravel())[0, 1]
        assert corr > 0.99
