"""GDN gating/layernorm_gated/qkvzba-split/fused-sigmoid-recurrent tests
(reference: test_fused_gdn_gating_without_sigmoid.py, test_qkvzba_split_reshape_cat.py)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import gdn

from .utils import assert_close, calc_diff


def _softplus(x, beta=1.0, th=20.0):
    return np.where(beta * x <= th, np.log1p(np.exp(beta * x)) / beta, x)


def test_fused_gdn_gating(rng):
    b, h = 6, 8
    A_log = rng.standard_normal(h).astype(np.float32)
    a = rng.standard_normal((b, h)).astype(np.float32)
    bb = rng.standard_normal((b, h)).astype(np.float32)
    bias = rng.standard_normal(h).astype(np.float32)
    g, beta = gdn.fused_gdn_gating(jnp.array(A_log), jnp.array(a), jnp.array(bb),
                                   jnp.array(bias))
    assert_close(g, -np.exp(A_log) * _softplus(a + bias), rtol=1e-4, atol=1e-5)
    assert_close(beta, 1 / (1 + np.exp(-bb)), rtol=1e-4, atol=1e-5)
    g2, b2 = gdn.fused_gdn_gating_without_sigmoid(
        jnp.array(A_log), jnp.array(a), jnp.array(bb), jnp.array(bias))
    np.testing.assert_array_equal(np.asarray(b2), bb)


def test_layernorm_gated(rng):
    m, n, gs = 4, 32, 16
    x = rng.standard_normal((m, n)).astype(np.float32)
    z = rng.standard_normal((m, n)).astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    out = gdn.layernorm_gated(jnp.array(x), jnp.array(w), jnp.array(b),
                              jnp.array(z), 1e-5, group_size=gs)
    xg = x.reshape(m, n // gs, gs)
    mu = xg.mean(-1, keepdims=True)
    xn = (xg - mu) / np.sqrt(((xg - mu) ** 2).mean(-1, keepdims=True) + 1e-5)
    golden = (xn.reshape(m, n) * w + b) * (z / (1 + np.exp(-z)))
    assert_close(out, golden, rtol=1e-3, atol=1e-3)
    # rms variant
    out2 = gdn.layernorm_gated(jnp.array(x), jnp.array(w), None, None, 1e-5,
                               is_rms_norm=True)
    xn2 = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-5)
    assert_close(out2, xn2 * w, rtol=1e-3, atol=1e-3)


def test_qkvzba_split(rng):
    b, hqk, hv, dqk, dv = 3, 2, 4, 8, 4
    r = hv // hqk
    per = 2 * dqk + 2 * r * dv
    mixed = rng.standard_normal((b, hqk * per)).astype(np.float32)
    ba = rng.standard_normal((b, hqk * 2 * r)).astype(np.float32)
    qkv, z, bb, aa = gdn.fused_qkvzba_split_reshape_cat(
        jnp.array(mixed), jnp.array(ba), hqk, hv, dqk, dv)
    mm = mixed.reshape(b, hqk, per)
    np.testing.assert_array_equal(np.asarray(qkv)[:, :hqk * dqk],
                                  mm[..., :dqk].reshape(b, -1))
    np.testing.assert_array_equal(np.asarray(qkv)[:, hqk * dqk:2 * hqk * dqk],
                                  mm[..., dqk:2 * dqk].reshape(b, -1))
    np.testing.assert_array_equal(np.asarray(qkv)[:, 2 * hqk * dqk:],
                                  mm[..., 2 * dqk:2 * dqk + r * dv].reshape(b, -1))
    np.testing.assert_array_equal(np.asarray(z),
                                  mm[..., 2 * dqk + r * dv:].reshape(b, hv, dv))
    bam = ba.reshape(b, hqk, 2 * r)
    np.testing.assert_array_equal(np.asarray(bb), bam[..., :r].reshape(b, hv))
    np.testing.assert_array_equal(np.asarray(aa), bam[..., r:].reshape(b, hv))


def test_fused_sigmoid_gating_recurrent_matches_composed(rng):
    b, h, hv, kd, vd, pool = 3, 2, 4, 8, 8, 6
    A_log = rng.standard_normal(hv).astype(np.float32) * 0.1
    a = rng.standard_normal((b, 1, hv)).astype(np.float32)
    bb = rng.standard_normal((b, 1, hv)).astype(np.float32)
    bias = rng.standard_normal(hv).astype(np.float32)
    q = rng.standard_normal((b, 1, h, kd)).astype(np.float32)
    k = rng.standard_normal((b, 1, h, kd)).astype(np.float32)
    v = rng.standard_normal((b, 1, hv, vd)).astype(np.float32)
    state = (rng.standard_normal((pool, hv, kd, vd)) * 0.2).astype(np.float32)
    idx = np.array([4, 0, 2], np.int32)

    o, new_pool = gdn.fused_sigmoid_gating_delta_rule_update(
        jnp.array(A_log), jnp.array(a), jnp.array(bias), 1.0, 20.0,
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(bb),
        jnp.array(state), jnp.array(idx), use_qk_l2norm_in_kernel=True,
    )
    # composed golden
    g = -np.exp(A_log) * _softplus(a.reshape(b, hv) + bias)
    beta = 1 / (1 + np.exp(-bb.reshape(b, hv)))
    qn = q.reshape(b, h, kd); kn = k.reshape(b, h, kd)
    qn = qn / np.sqrt((qn * qn).sum(-1, keepdims=True) + 1e-6)
    kn = kn / np.sqrt((kn * kn).sum(-1, keepdims=True) + 1e-6)
    qn = qn * kd ** -0.5
    rep = hv // h
    for i in range(b):
        s = state[idx[i]].astype(np.float64).copy()
        for hh in range(hv):
            sh = s[hh] * np.exp(g[i, hh])
            kv = sh.T @ kn[i, hh // rep]
            delta = (v[i, 0, hh] - kv) * beta[i, hh]
            sh = sh + np.outer(kn[i, hh // rep], delta)
            oo = sh.T @ qn[i, hh // rep]
            assert calc_diff(np.asarray(o)[i, 0, hh], oo) < 1e-4
            assert calc_diff(np.asarray(new_pool)[idx[i], hh], sh) < 1e-4
