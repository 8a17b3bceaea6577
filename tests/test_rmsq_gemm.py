"""Fused RMSNormQuant->GEMM kernel (ops/rmsq_gemm.py) vs its unfused twin and
vs the mla_preprocess composition (the fp16-clamp reference semantics).

Comparison policy (see ops/rmsq_gemm.py module doc): fused-vs-unfused runs
are separately compiled float pipelines, so a value within a ulp of a quant
rounding boundary can flip by +/-1 LSB in one path and not the other (FMA
contraction differs; measured ~1 flip per 4e5 elements under the 8-device
test env). A flipped quant value perturbs its whole output ROW by at most
max|w| * descale * outsc per flip. Tests therefore bound the error by a few
flip-effects AND require most rows to be bit-exact — which still catches any
real numerics bug (a wrong quant path corrupts every row by large margins).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import rmsq_gemm as rq
from sgl_kernel_npu_tpu.ops.matmul import pretile_weight_bank


def _mk(rng, m, k, n, x_dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, x_dtype)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(k), jnp.float32)
    beta = jnp.asarray(0.05 * rng.standard_normal(k), jnp.float32)
    w = jnp.asarray(rng.integers(-100, 101, (k, n)), jnp.int8)
    descale = jnp.asarray(rng.random(n) / 100 + 1e-4, jnp.float32)
    bias = jnp.asarray(rng.integers(-50, 50, n), jnp.int32)
    return x, gamma, beta, w, descale, bias


def assert_quant_close(got, want, w, descale, outsc_max=1.0, flips=4,
                       min_exact_rows=0.9, name=""):
    """Allow up to `flips` +/-1-LSB quant flips per row; require most rows
    bit-exact. outsc_max: per_token epilogue row-scale bound (1.0 for
    per_tensor)."""
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    flip_atol = flips * float(np.abs(np.asarray(w)).max()) \
        * float(np.asarray(descale).max()) * outsc_max
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=flip_atol,
                               err_msg=name)
    row_exact = np.all(np.isclose(got, want, rtol=1e-6, atol=1e-6), axis=-1)
    frac = float(np.mean(row_exact))
    assert frac >= min_exact_rows, \
        f"{name}: only {frac:.4f} of rows bit-exact (>= {min_exact_rows})"


@pytest.mark.parametrize("m,k,n", [(64, 1024, 512), (48, 768, 640),
                                   (256, 1536, 2112)])
@pytest.mark.parametrize("mode", ["per_tensor", "per_token"])
def test_fused_matches_ref(rng, m, k, n, mode):
    x, gamma, beta, w, descale, bias = _mk(rng, m, k, n)
    qs, qo = jnp.float32(0.07), jnp.float32(3.0)
    kw = dict(quant_scale=qs, quant_offset=qo, quant_mode=mode)
    if mode == "per_token":
        bias = None
    got = rq.rmsnorm_quant_gemm(x, gamma, beta, w, descale, bias, **kw)
    want = rq.rmsnorm_quant_gemm_ref(x, gamma, beta, w, descale, bias, **kw)
    outsc_max = 1.0
    if mode == "per_token":
        outsc_max = float(rq._row_stats(x, gamma, beta, qs, qo, mode, True,
                                        1e-6)[3].max())
    assert_quant_close(got, want, w, descale, outsc_max, name=f"{mode}")


def test_apply_norm_false(rng):
    x, gamma, beta, w, descale, bias = _mk(rng, 32, 512, 256)
    kw = dict(quant_scale=jnp.float32(0.1), quant_offset=jnp.float32(0.0),
              apply_norm=False)
    got = rq.rmsnorm_quant_gemm(x, gamma, beta, w, descale, bias, **kw)
    want = rq.rmsnorm_quant_gemm_ref(x, gamma, beta, w, descale, bias, **kw)
    assert_quant_close(got, want, w, descale)


def test_tiled_stacked_bank_matches_plain(rng):
    """[L, NB, K, bn] pretiled bank + traced layer index == per-layer [K, N].

    Same-kernel different-layout comparison: the quant prologue is identical
    math in both, but compiled twice — same flip policy applies."""
    l, m, k, n, bn = 3, 64, 768, 1024, 512
    x, gamma, beta, _, _, _ = _mk(rng, m, k, n)
    wl = jnp.asarray(rng.integers(-100, 101, (l, k, n)), jnp.int8)
    ds = jnp.asarray(rng.random((l, n)) / 100 + 1e-4, jnp.float32)
    bias = jnp.asarray(rng.integers(-50, 50, (l, n)), jnp.int32)
    bank = pretile_weight_bank(wl, bn)
    qs, qo = jnp.float32(0.07), jnp.float32(-2.0)

    @jax.jit
    def fused(li):
        return rq.rmsnorm_quant_gemm(x, gamma, beta, bank, ds, bias, qs, qo,
                                     li=li)

    for li in range(l):
        want = rq.rmsnorm_quant_gemm(x, gamma, beta, wl[li], ds[li], bias[li],
                                     qs, qo)
        assert_quant_close(fused(jnp.int32(li)), want, wl[li], ds[li],
                           name=f"layer {li}")


def test_fp16_quant_cast_matches_quantizer(rng):
    """quant_cast="fp16" must reproduce ops/quant.py::per_tensor_quant_int8's
    fp16-clamp rounding (mla_preprocess._quant_per_tensor) on the quantized
    values themselves — checked via a zero-noise GEMM (w = identity-ish)."""
    from sgl_kernel_npu_tpu.ops import mla_preprocess as mp

    m, k = 64, 512
    x, gamma, beta, _, _, _ = _mk(rng, m, k, k, x_dtype=jnp.float32)
    qs, qo = jnp.float32(0.05), jnp.float32(1.0)
    # identity weight + unit descale exposes q directly in the output
    w_eye = jnp.eye(k, dtype=jnp.int8)
    ds = jnp.ones((k,), jnp.float32)

    got = rq.rmsnorm_quant_gemm(x, gamma, beta, w_eye, ds, None, qs, qo,
                                quant_cast="fp16")
    h32 = mp._rms(x.astype(jnp.float32), gamma) + beta
    want_q = mp._quant_per_tensor(h32, qs, qo).astype(np.float32)
    diff = np.abs(np.asarray(got) - np.asarray(want_q))
    # rare ulp-boundary flips allowed; values must be the fp16-clamped ones
    assert float(np.mean(diff == 0)) > 0.999, float(np.mean(diff == 0))
    assert diff.max() <= 1.0, diff.max()


def test_vs_mla_composition_fp16_clamp(rng):
    """The fused tier in quant_cast="fp16" mode vs the mla_preprocess unfused
    composition: same fp16-clamp quantizer, so rows agree bit-exactly except
    for rare ulp-boundary flips (fp16 boundary window ~2^-13 per element)."""
    from sgl_kernel_npu_tpu.ops import mla_preprocess as mp

    m, k, n = 96, 1536, 1024
    x, gamma, beta, w, descale, bias = _mk(rng, m, k, n, x_dtype=jnp.float32)
    qs, qo = jnp.float32(0.05), jnp.float32(1.0)

    h32 = mp._rms(x.astype(jnp.float32), gamma) + beta
    hq = mp._quant_per_tensor(h32, qs, qo)
    want = mp._gemm_dequant(hq, w.T, descale, bias)

    got = rq.rmsnorm_quant_gemm(x, gamma, beta, w, descale, bias, qs, qo,
                                quant_cast="fp16")
    # fp16 flip window is wider than f32's: allow more affected rows
    assert_quant_close(got, want, w, descale, flips=6, min_exact_rows=0.6,
                       name="fp16 composition")
