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
