"""Fused RMSNormQuant->GEMM kernel (ops/rmsq_gemm.py) vs its unfused twin and
vs the mla_preprocess composition (the fp16-clamp reference semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import rmsq_gemm as rq
from sgl_kernel_npu_tpu.ops.matmul import pretile_weight_bank

from .utils import assert_close


def _mk(rng, m, k, n, x_dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, x_dtype)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(k), jnp.float32)
    beta = jnp.asarray(0.05 * rng.standard_normal(k), jnp.float32)
    w = jnp.asarray(rng.integers(-100, 101, (k, n)), jnp.int8)
    descale = jnp.asarray(rng.random(n) / 100 + 1e-4, jnp.float32)
    bias = jnp.asarray(rng.integers(-50, 50, n), jnp.int32)
    return x, gamma, beta, w, descale, bias


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
    assert_close(got, want, rtol=1e-5, atol=1e-5)


def test_apply_norm_false(rng):
    x, gamma, beta, w, descale, bias = _mk(rng, 32, 512, 256)
    kw = dict(quant_scale=jnp.float32(0.1), quant_offset=jnp.float32(0.0),
              apply_norm=False)
    got = rq.rmsnorm_quant_gemm(x, gamma, beta, w, descale, bias, **kw)
    want = rq.rmsnorm_quant_gemm_ref(x, gamma, beta, w, descale, bias, **kw)
    assert_close(got, want, rtol=1e-5, atol=1e-5)


def test_tiled_stacked_bank_matches_plain(rng):
    """[L, NB, K, bn] pretiled bank + traced layer index == per-layer [K, N]."""
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
        assert_close(fused(jnp.int32(li)), want, rtol=1e-5, atol=1e-5,
                     name=f"layer {li}")


def test_vs_mla_composition_fp16_clamp(rng):
    """The fused tier rounds in f32 where the mla golden path clamps in fp16
    first; outputs must agree to within one quant LSB worth of descale."""
    from sgl_kernel_npu_tpu.ops import mla_preprocess as mp

    m, k, n = 96, 1536, 1024
    x, gamma, beta, w, descale, bias = _mk(rng, m, k, n, x_dtype=jnp.float32)
    qs, qo = jnp.float32(0.05), jnp.float32(1.0)

    h32 = mp._rms(x.astype(jnp.float32), gamma) + beta
    hq = mp._quant_per_tensor(h32, qs, qo)
    want = mp._gemm_dequant(hq, w.T, descale, bias)

    got = rq.rmsnorm_quant_gemm(x, gamma, beta, w, descale, bias, qs, qo)
    # identical up to +/-1 LSB on a tiny fraction of quantized values
    lsb = float(jnp.max(jnp.abs(descale))) * k
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2 * lsb, rtol=1e-3)
    exact = np.mean(np.isclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6))
    assert exact > 0.99, f"only {exact:.4f} exact-match fraction"
