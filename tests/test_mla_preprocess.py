"""mla_preprocess vs a numpy port of the reference golden
(tests/python/sgl_kernel_npu/test_mla_preprocess.py golden2_pytorch:404-503)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import mla_preprocess as mp

from .utils import calc_diff

HID, MM1_OUT, QRMS, KN, KP, H, QN, QP, QNOPE = 512, 2112 // 2, 1536 // 4, 512 // 4, 64, 4, 128, 64, 512 // 4
# scaled-down dims: hidden 512, latent 128+64, q_rms 384, per-head 128+64 -> qnope_out 128


def _np_rms(x, g, eps=1e-6):
    v = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    return x / np.sqrt(v + eps) * g


def _np_quant(x, scale, offset):
    q = x / scale + offset
    return np.round(np.clip(q.astype(np.float16), -128, 127)).astype(np.int8)


def _np_gemm_deq(a, w, descale, bias):
    acc = a.astype(np.int32) @ w.astype(np.int32).T
    if bias is not None:
        acc = acc + bias
    return acc.astype(np.float32) * descale


def _np_rope(x, cos, sin):
    half = x.shape[-1] // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos + rot * sin


def test_mla_preprocess_krope_ctkv(rng):
    n = 6
    qdim = QN + QP  # 192
    hidden = rng.uniform(-2, 2, (n, HID)).astype(np.float32)
    gamma0 = np.ones(HID, np.float32); beta0 = np.zeros(HID, np.float32)
    qs0 = np.array([0.7], np.float32); qo0 = np.array([3.0], np.float32)
    mm1_out = KN + KP + QRMS
    wdqkv = rng.integers(-10, 10, (mm1_out, HID)).astype(np.int8)
    bias0 = rng.integers(-10, 10, mm1_out).astype(np.int32)
    descale0 = (rng.random(mm1_out) / 100).astype(np.float32)
    gamma1 = rng.uniform(-1, 1, QRMS).astype(np.float32)
    beta1 = rng.integers(-2, 2, QRMS).astype(np.float32)
    qs1 = np.array([0.5], np.float32); qo1 = np.array([-2.0], np.float32)
    wuq = rng.integers(-10, 10, (H * qdim, QRMS)).astype(np.int8)
    bias1 = rng.integers(-10, 10, H * qdim).astype(np.int32)
    descale1 = (rng.random(H * qdim) / 100).astype(np.float32)
    gamma2 = rng.uniform(-1, 1, KN).astype(np.float32)
    cos = rng.uniform(-1, 1, (n, KP)).astype(np.float32)
    sin = rng.uniform(-1, 1, (n, KP)).astype(np.float32)
    wuk = rng.uniform(-1, 1, (H, QN, QNOPE)).astype(np.float32)

    pages, ps = 4, 8
    kv_cache = np.zeros((pages, ps, KN), np.float32)
    krope_cache = np.zeros((pages, ps, KP), np.float32)
    slots = np.array([0, 3, 9, 17, 25, 31], np.int32)

    out = mp.mla_preprocess(
        jnp.array(hidden), jnp.array(gamma0), jnp.array(beta0),
        jnp.array(wdqkv), jnp.array(descale0),
        jnp.array(gamma1), jnp.array(beta1), jnp.array(wuq), jnp.array(descale1),
        jnp.array(gamma2), jnp.array(cos), jnp.array(sin), jnp.array(wuk),
        jnp.array(kv_cache), jnp.array(krope_cache), jnp.array(slots),
        jnp.array(qs0), jnp.array(qo0), jnp.array(bias0),
        jnp.array(qs1), jnp.array(qo1), jnp.array(bias1),
        cache_mode="krope_ctkv", apply_norm0=False,
    )

    # golden (reference golden2_pytorch flow, norm0 skipped)
    hq = _np_quant(hidden, qs0, qo0)
    fused = _np_gemm_deq(hq, wdqkv, descale0, bias0)
    latent, cq = fused[:, : KN + KP], fused[:, KN + KP:]
    ctkv = _np_rms(latent[:, :KN], gamma2)
    k_pe = _np_rope(latent[:, KN:], cos, sin)
    cqn = _np_rms(cq, gamma1) + beta1
    cqq = _np_quant(cqn, qs1, qo1)
    q_out = _np_gemm_deq(cqq, wuq, descale1, bias1).reshape(n, H, qdim)
    q_nope = np.einsum("nhd,hdk->nhk", q_out[..., :QN], wuk)
    q_pe = _np_rope(q_out[..., QN:], cos[:, None], sin[:, None])

    assert calc_diff(np.asarray(out.q_nope), q_nope) < 1e-4
    assert calc_diff(np.asarray(out.q_pe), q_pe) < 1e-4
    kvc = np.asarray(out.kv_cache)
    krc = np.asarray(out.krope_cache)
    for i, s in enumerate(slots):
        assert calc_diff(kvc[s // ps, s % ps], ctkv[i]) < 1e-4
        assert calc_diff(krc[s // ps, s % ps], k_pe[i]) < 1e-4


def test_mla_preprocess_int8_mode(rng):
    n = 2
    qdim = QN + QP
    hidden = rng.uniform(-1, 1, (n, HID)).astype(np.float32)
    mm1_out = KN + KP + QRMS
    args = dict(
        gamma0=np.ones(HID, np.float32), beta0=np.zeros(HID, np.float32),
        wdqkv=rng.integers(-5, 5, (mm1_out, HID)).astype(np.int8),
        descale0=(rng.random(mm1_out) / 100).astype(np.float32),
        gamma1=np.ones(QRMS, np.float32), beta1=np.zeros(QRMS, np.float32),
        wuq=rng.integers(-5, 5, (H * qdim, QRMS)).astype(np.int8),
        descale1=(rng.random(H * qdim) / 100).astype(np.float32),
        gamma2=np.ones(KN, np.float32),
        cos=rng.uniform(-1, 1, (n, KP)).astype(np.float32),
        sin=rng.uniform(-1, 1, (n, KP)).astype(np.float32),
        wuk=rng.uniform(-1, 1, (H, QN, QNOPE)).astype(np.float32),
    )
    kv_cache = np.zeros((2, 8, KN), np.int8)
    krope_cache = np.zeros((2, 8, KP), np.float32)
    out = mp.mla_preprocess(
        jnp.array(hidden), *[jnp.array(args[k]) for k in (
            "gamma0", "beta0", "wdqkv", "descale0", "gamma1", "beta1",
            "wuq", "descale1", "gamma2", "cos", "sin", "wuk")],
        jnp.array(kv_cache), jnp.array(krope_cache),
        jnp.array([1, 5], np.int32),
        jnp.array([0.5], np.float32), jnp.array([0.0], np.float32),
        np.zeros(mm1_out, np.int32),
        jnp.array([0.5], np.float32), jnp.array([0.0], np.float32),
        np.zeros(H * qdim, np.int32),
        ctkv_scale=jnp.array([0.3], np.float32),
        q_nope_scale=jnp.array(np.full(H, 2.0, np.float32)),
        cache_mode="int8_nzcache", apply_norm0=False,
    )
    assert out.q_nope.dtype == jnp.int8
    assert out.kv_cache.dtype == jnp.int8
    assert np.asarray(out.kv_cache[0, 1]).any()  # slot written


def _mk_mla_args(rng, n=6):
    """Positional args for mla_preprocess at the scaled-down dims (same
    construction as test_mla_preprocess_krope_ctkv)."""
    qdim = QN + QP
    mm1_out = KN + KP + QRMS
    hidden = rng.uniform(-2, 2, (n, HID)).astype(np.float32)
    gamma0 = rng.uniform(0.5, 1.5, HID).astype(np.float32)
    beta0 = rng.uniform(-.1, .1, HID).astype(np.float32)
    wdqkv = rng.integers(-10, 10, (mm1_out, HID)).astype(np.int8)
    bias0 = rng.integers(-10, 10, mm1_out).astype(np.int32)
    descale0 = (rng.random(mm1_out) / 100).astype(np.float32)
    gamma1 = rng.uniform(-1, 1, QRMS).astype(np.float32)
    beta1 = rng.integers(-2, 2, QRMS).astype(np.float32)
    wuq = rng.integers(-10, 10, (H * qdim, QRMS)).astype(np.int8)
    bias1 = rng.integers(-10, 10, H * qdim).astype(np.int32)
    descale1 = (rng.random(H * qdim) / 100).astype(np.float32)
    gamma2 = rng.uniform(-1, 1, KN).astype(np.float32)
    cos = rng.uniform(-1, 1, (n, KP)).astype(np.float32)
    sin = rng.uniform(-1, 1, (n, KP)).astype(np.float32)
    wuk = rng.uniform(-1, 1, (H, QN, QNOPE)).astype(np.float32)
    pages, ps = (n // 4) + 2, 8
    kv_cache = np.zeros((pages, ps, KN), np.float32)
    krope_cache = np.zeros((pages, ps, KP), np.float32)
    slots = np.arange(n, dtype=np.int32)
    args = tuple(jnp.array(a) for a in (
        hidden, gamma0, beta0, wdqkv, descale0, gamma1, beta1, wuq, descale1,
        gamma2, cos, sin, wuk, kv_cache, krope_cache, slots,
        np.array([0.7], np.float32), np.array([3.0], np.float32), bias0,
        np.array([0.5], np.float32), np.array([-2.0], np.float32), bias1))
    return args, dict(cache_mode="krope_ctkv")


def test_fused_tier_matches_unfused(rng):
    """mla_preprocess with pre-transposed weights (the rmsq_gemm fused tier)
    vs the unfused composition: same fp16-clamp quantizer in per_tensor mode,
    so outputs agree up to rare ulp-boundary LSB flips (see
    ops/rmsq_gemm.py module doc) — bound by a few flip-effects."""
    import numpy as np

    from sgl_kernel_npu_tpu.ops import mla_preprocess as mp

    for quant_mode in ("per_tensor", "per_token"):
        args, kw = _mk_mla_args(rng, n=32)
        kw = dict(kw, quant_mode=quant_mode)
        base = mp.mla_preprocess(*args, **kw)
        wdqkv, wuq = args[3], args[7]
        fused = mp.mla_preprocess(
            *args, **kw, wdqkv_kn=jnp.transpose(wdqkv, (1, 0)),
            wuq_kn=jnp.transpose(wuq, (1, 0)))
        for name in ("q_nope", "q_pe", "kv_cache", "krope_cache"):
            a = np.asarray(getattr(base, name), np.float32)
            b = np.asarray(getattr(fused, name), np.float32)
            scale = max(1.0, float(np.abs(a).max()))
            err = np.abs(a - b).max() / scale
            assert err < 0.05, (quant_mode, name, err)
            exact = np.mean(np.isclose(a, b, rtol=1e-4, atol=1e-4))
            assert exact > 0.9, (quant_mode, name, exact)
