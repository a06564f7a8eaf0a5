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

    def test_s8_fused_fwd_matches_xla_epilogue(self):
        """Fused s8xs8 kernel == XLA's quant->s8 dot->dequant chain. int32
        accumulation is exact, so only the f32 epilogue rounds — tolerances
        are tight."""
        im, ctx = self._interp()
        rs = np.random.RandomState(1)
        m, k, n = 96, 256, 384
        x = jnp.asarray(rs.randn(m, k), jnp.float32)
        q = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rs.rand(n) * 0.01 + 1e-3, jnp.float32)
        from thinkdiff_tpu.ops.quant import _absmax_quant_rows

        xq, sx = _absmax_quant_rows(x)
        acc = np.asarray(xq, np.int64) @ np.asarray(q, np.int64)
        ref = acc.astype(np.float32) * np.asarray(sx)[:, None] * np.asarray(s)[None]
        with ctx:
            y = im._s8_matmul_fused(xq, sx, q, s, jnp.float32)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    def test_s8_fused_bwd_matches_xla_epilogue(self):
        im, ctx = self._interp()
        rs = np.random.RandomState(2)
        m, k, n = 64, 384, 256
        q = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)
        g = jnp.asarray(rs.randn(m, n), jnp.float32)
        from thinkdiff_tpu.ops.quant import _absmax_quant_rows

        gq, sg = _absmax_quant_rows(g)
        acc = np.asarray(gq, np.int64) @ np.asarray(q, np.int64).T
        ref = acc.astype(np.float32) * np.asarray(sg)[:, None]
        with ctx:
            dx = im._s8_matmul_fused_bwd(gq, sg, q, jnp.float32)
        np.testing.assert_allclose(np.asarray(dx), ref, rtol=1e-5, atol=1e-5)

    def test_s8_fused_row_padding(self):
        """Non-multiple-of-block row counts pad internally and slice back."""
        im, ctx = self._interp()
        rs = np.random.RandomState(3)
        m, k, n = 33, 128, 128
        x = jnp.asarray(rs.randn(m, k), jnp.float32)
        q = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)
        s = jnp.ones((n,), jnp.float32)
        from thinkdiff_tpu.ops.quant import _absmax_quant_rows

        xq, sx = _absmax_quant_rows(x)
        acc = np.asarray(xq, np.int64) @ np.asarray(q, np.int64)
        ref = acc.astype(np.float32) * np.asarray(sx)[:, None]
        with ctx:
            y = im._s8_matmul_fused(xq, sx, q, s, jnp.float32)
        assert y.shape == (m, n)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

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


class TestS8FusedQx:
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

    def test_qx_matches_prepass_chain(self):
        """Quantize-in-kernel fwd == the XLA absmax pre-pass + s8 dot +
        epilogue, bit-for-bit (same quant formula, int32-exact dot)."""
        import numpy as np
        import jax.numpy as jnp

        im, ctx = self._interp()
        from thinkdiff_tpu.ops.quant import _absmax_quant_rows

        rs = np.random.RandomState(11)
        m, k, n = 96, 256, 384
        x = jnp.asarray(rs.randn(m, k), jnp.float32)
        q = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rs.rand(n) * 0.01 + 1e-3, jnp.float32)
        assert im.s8_qx_supported(m, k, n)
        xq, sx = _absmax_quant_rows(x)
        acc = np.asarray(xq, np.int64) @ np.asarray(q, np.int64)
        ref = (acc.astype(np.float32) * np.asarray(sx)[:, None]
               * np.asarray(s)[None])
        with ctx:
            y = im._s8_matmul_fused_qx(x, q, s, jnp.float32)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    def test_qx_row_padding_and_gate(self):
        import numpy as np
        import jax.numpy as jnp

        im, ctx = self._interp()
        rs = np.random.RandomState(12)
        m, k, n = 33, 128, 128
        x = jnp.asarray(rs.randn(m, k), jnp.float32)
        q = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)
        s = jnp.ones((n,), jnp.float32)
        with ctx:
            y = im._s8_matmul_fused_qx(x, q, s, jnp.float32)
        assert y.shape == (m, n)
        # gate: K beyond one VMEM block is rejected
        assert not im.s8_qx_supported(1024, 8192, 4096)
        assert im.s8_qx_supported(1024, 4096, 12288)
