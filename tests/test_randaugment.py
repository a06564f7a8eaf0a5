"""RandAugment numpy-parity: photometric LUT ops vs PIL's own
ImageOps/ImageEnhance (the semantics the reference's cv2 versions document
as 'same output as PIL.X' — randaugment.py:19-157), geometric ops vs
explicit pixel-shift expectations."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from thinkdiff_tpu.data import randaugment as ra


@pytest.fixture
def img():
    rs = np.random.RandomState(0)
    # structured image (gradient + noise) so histograms are non-trivial
    base = np.linspace(0, 200, 32 * 32).reshape(32, 32, 1)
    noise = rs.randint(0, 55, (32, 32, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def test_autocontrast_matches_pil(img):
    exp = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    np.testing.assert_array_equal(ra.autocontrast(img), exp)


def test_equalize_matches_pil(img):
    exp = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    np.testing.assert_array_equal(ra.equalize(img), exp)


def test_solarize_matches_pil(img):
    for thresh in (0, 64, 128, 256):
        exp = np.asarray(ImageOps.solarize(Image.fromarray(img), thresh))
        np.testing.assert_array_equal(ra.solarize(img, thresh), exp)


def test_posterize_matches_pil(img):
    for bits in (1, 2, 3, 4):
        exp = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
        np.testing.assert_array_equal(ra.posterize(img, bits), exp)
    assert (ra.posterize(img, 0) == 0).all()


@pytest.mark.parametrize("name,enhancer", [
    ("color", ImageEnhance.Color),
    ("contrast", ImageEnhance.Contrast),
    ("brightness", ImageEnhance.Brightness),
    ("sharpness", ImageEnhance.Sharpness),
])
def test_enhance_ops_match_pil(img, name, enhancer):
    fn = getattr(ra, name)
    for factor in (0.1, 0.55, 1.0, 1.9):
        exp = np.asarray(enhancer(Image.fromarray(img)).enhance(factor))
        # bit-exact: luma uses PIL's fixed-point weights, blend truncates,
        # SMOOTH filter rounds half-up — matching PIL's C conventions
        np.testing.assert_array_equal(fn(img, factor), exp, err_msg=f"{name}@{factor}")


def test_identity_factor_one_is_noop(img):
    for fn in (ra.color, ra.contrast, ra.brightness, ra.sharpness):
        np.testing.assert_array_equal(fn(img, 1.0), img)


def test_translate_shifts_pixels_exactly(img):
    out = ra.translate_x(img, 5, fill=(7, 7, 7))
    np.testing.assert_array_equal(out[:, :-5], img[:, 5:])
    assert (out[:, -5:] == 7).all()
    out = ra.translate_y(img, -3, fill=(9, 9, 9))
    np.testing.assert_array_equal(out[3:], img[:-3])
    assert (out[:3] == 9).all()


def test_rotate_90_is_exact(img):
    out = ra.rotate(img, 90.0)
    np.testing.assert_array_equal(out, np.rot90(img))


def test_shear_zero_is_noop(img):
    np.testing.assert_array_equal(ra.shear_x(img, 0.0), img)
    np.testing.assert_array_equal(ra.shear_y(img, 0.0), img)


def test_cutout_fills_patch(img):
    rs = np.random.RandomState(3)
    out = ra.cutout(img, 4, replace=(1, 2, 3), rng=rs)
    changed = (out != img).any(axis=2)
    assert changed.any()
    ys, xs = np.where(changed)
    assert (out[ys, xs] == np.array([1, 2, 3], np.uint8)).all()
    assert ys.max() - ys.min() < 8 and xs.max() - xs.min() < 8


def test_random_augment_surface(img):
    rs = np.random.RandomState(0)
    aug = ra.RandomAugment(N=2, M=9, isPIL=False, rng=rs)
    out = aug(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    ops = aug.get_random_ops()
    assert len(ops) == 2 and all(p == 0.5 and m == 9 for _, p, m in ops)
    # PIL input path
    out2 = ra.RandomAugment(N=2, M=5, isPIL=True,
                            rng=np.random.RandomState(1))(
        Image.fromarray(img))
    assert out2.shape == img.shape

    with pytest.raises(KeyError):
        ra.RandomAugment(augs=["NotAnOp"])

    # reference subset (LAVIS blip transforms use these 7 names)
    subset = ["Identity", "AutoContrast", "Brightness", "Sharpness",
              "Equalize", "ShearX", "ShearY"]
    out3 = ra.RandomAugment(N=2, M=5, augs=subset,
                            rng=np.random.RandomState(2))(img)
    assert out3.shape == img.shape
