"""Pallas int8 gemv kernel correctness (interpret mode on CPU)."""

import importlib
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

m = importlib.import_module("thinkdiff_tpu.ops.int8_matmul")


@pytest.mark.parametrize("r,k,n", [(1, 256, 384), (8, 512, 1152), (3, 130, 70)])
def test_int8_matmul_matches_reference(r, k, n):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(r, k), jnp.float32)
    wq = jnp.asarray(rs.randint(-127, 127, (k, n)), jnp.int8)
    sc = jnp.asarray(rs.rand(n).astype(np.float32) * 0.1)

    real_call = m.pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        kw.pop("cost_estimate", None)
        return real_call(*a, **kw)

    with mock.patch.object(m.pl, "pallas_call", interp):
        out = m.int8_matmul(x, wq, sc, block_n=128, block_k=128)
    ref = m.int8_matmul_reference(x, wq, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_matmul_leading_dims():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 3, 128), jnp.float32)
    wq = jnp.asarray(rs.randint(-127, 127, (128, 256)), jnp.int8)
    sc = jnp.ones((256,), jnp.float32)

    real_call = m.pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        kw.pop("cost_estimate", None)
        return real_call(*a, **kw)

    with mock.patch.object(m.pl, "pallas_call", interp):
        out = m.int8_matmul(x, wq, sc, block_n=128, block_k=128)
    assert out.shape == (2, 3, 256)
    ref = m.int8_matmul_reference(x.reshape(-1, 128), wq, sc).reshape(2, 3, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4)


class TestWideInt8Matmul:
    """Tiled training-path kernels (fwd + input-grad) in interpret mode."""

    def _interp(self):
        import importlib
        from unittest import mock

        im = importlib.import_module("thinkdiff_tpu.ops.int8_matmul")
        real = im.pl.pallas_call

        def call(*args, **kwargs):
            kwargs["interpret"] = True
            kwargs.pop("compiler_params", None)
            return real(*args, **kwargs)

        return im, mock.patch.object(im.pl, "pallas_call", call)

    def test_wide_fwd_bwd_match_reference(self):
        im, ctx = self._interp()
        from unittest import mock

        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(3, 96, 256), jnp.float32)  # rows pad to 288
        q = jnp.asarray(rs.randint(-127, 128, (256, 384)), jnp.int8)
        s = jnp.asarray(rs.rand(384) * 0.01 + 1e-3, jnp.float32)

        with ctx, mock.patch.object(im.jax, "default_backend",
                                    lambda: "tpu"):
            y = im.int8_matmul_wide(x, q, s)
            g = jax.grad(
                lambda x: jnp.sum(im.int8_matmul_wide(x, q, s) ** 2))(x)
        yr = im.int8_matmul_reference(x, q, s)
        gr = jax.grad(
            lambda x: jnp.sum(im.int8_matmul_reference(x, q, s) ** 2))(x)
        # kernel dots run in bf16 (matching XLA's int8->bf16 behavior);
        # compare at bf16 tolerance scaled by output magnitude
        tol = 2e-2 * float(jnp.max(jnp.abs(yr)))
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=tol)
        gtol = 2e-2 * float(jnp.max(jnp.abs(gr)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=gtol)

    def test_wide_unsupported_dims_fall_back(self):
        im, _ = self._interp()
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(4, 100), jnp.float32)   # K=100 not 128-mult
        q = jnp.asarray(rs.randint(-127, 128, (100, 96)), jnp.int8)
        s = jnp.ones((96,), jnp.float32)
        y = im.int8_matmul_wide(x, q, s)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(im.int8_matmul_reference(x, q, s)),
            rtol=1e-5)
