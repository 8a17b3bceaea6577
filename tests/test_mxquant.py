"""MX block quant (MXFP8/MXFP4) + grouped soft-FP8 Pallas GEMM.

Reference: quant modes in csrc/deepep/deep_ep.cpp:13-19, block routines
quantize_functions.h:62-380; grouped FP8 GEMM catlass_gmm_fp8.cpp:26-51."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import matmul, mxquant

from .utils import assert_close


def test_mxfp8_roundtrip(rng):
    x = rng.standard_normal((16, 128)).astype(np.float32) * 10.0
    q, s = mxquant.quantize_mxfp8(jnp.asarray(x))
    assert q.dtype == jnp.float8_e4m3fn and s.dtype == jnp.uint8
    assert s.shape == (16, 4)
    out = np.asarray(mxquant.dequantize_mxfp8(q, s, out_dtype=jnp.float32))
    # e4m3 has ~2 decimal digits; block scale is a power of two
    np.testing.assert_allclose(out, x, rtol=0.08, atol=0.08)


def test_mxfp8_scale_is_power_of_two(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32) * 1000
    _, s = mxquant.quantize_mxfp8(jnp.asarray(x))
    dec = np.exp2(np.asarray(s, np.float32) - 127.0)
    np.testing.assert_array_equal(dec, np.exp2(np.round(np.log2(dec))))


def test_mxfp4_roundtrip(rng):
    x = rng.standard_normal((8, 64)).astype(np.float32)
    q, s = mxquant.quantize_mxfp4(jnp.asarray(x))
    assert q.dtype == jnp.uint8 and q.shape == (8, 32)   # packed
    out = np.asarray(mxquant.dequantize_mxfp4(q, s, out_dtype=jnp.float32))
    # e2m1: 1 mantissa bit -> coarse; check correlation + bounded error
    np.testing.assert_allclose(out, x, rtol=0.5, atol=0.5)
    cos = (out * x).sum() / (np.linalg.norm(out) * np.linalg.norm(x))
    assert cos > 0.95, cos


def test_mxfp4_exact_grid_values():
    vals = np.array([[0.5, -3.0, 6.0, 1.5, -0.5, 2.0, 4.0, -6.0] * 4])
    q, s = mxquant.quantize_mxfp4(jnp.asarray(vals, jnp.float32))
    out = np.asarray(mxquant.dequantize_mxfp4(q, s, out_dtype=jnp.float32))
    np.testing.assert_allclose(out, vals)   # grid points survive exactly


@pytest.mark.parametrize("sizes", [[128, 128, 128], [100, 0, 284],
                                   [0, 0, 5]])
def test_gmm_wfp8a16_pallas_matches_ref(rng, sizes, monkeypatch):
    """Aligned-compaction Pallas grouped FP8 GEMM == ragged_dot reference,
    including empty groups and non-aligned group sizes."""
    g, k, n = 3, 256, 256
    s = sum(sizes)
    if s == 0:
        return
    x = jnp.asarray(rng.standard_normal((s, k)), jnp.bfloat16)
    w_fp8 = jnp.asarray(rng.standard_normal((g, k, n)), jnp.float8_e4m3fn)
    scale = jnp.asarray(rng.random((g, k // 128, n // 128)) + 0.5, jnp.float32)
    gl = jnp.asarray(sizes, jnp.int32)

    ref = matmul.gmm_wfp8a16_ref(x, w_fp8, scale, gl)
    monkeypatch.setenv("SKT_IMPL", "pallas")
    pal = matmul.gmm_wfp8a16(x, w_fp8, scale, gl)
    assert_close(pal, ref, rtol=2e-2, atol=0.25)
