"""GDN chunk + recurrent vs numpy ports of the reference goldens
(fla/chunk.py:53-204 native; test_recurrent_gated_delta_rule.py run_golden)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import gdn

from .utils import assert_close, calc_diff


def _np_gdn_native(q, k, v, g, beta, chunk_size, init, l2):
    """numpy port of chunk_gated_delta_rule_native ([B, H, T, D] layout)."""

    def l2n(x):
        return x / np.sqrt((x * x).sum(-1, keepdims=True) + 1e-6)

    if l2:
        q, k = l2n(q), l2n(k)
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    pad = (-t) % c
    q = np.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))) * dk ** -0.5
    k = np.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    v = np.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    g = np.pad(g, ((0, 0), (0, 0), (0, pad)))
    beta = np.pad(beta, ((0, 0), (0, 0), (0, pad)))
    n = (t + pad) // c

    vb = v * beta[..., None]
    kb = k * beta[..., None]
    q = q.reshape(b, h, n, c, dk)
    k = k.reshape(b, h, n, c, dk)
    vb = vb.reshape(b, h, n, c, dv)
    kb = kb.reshape(b, h, n, c, dk)
    g = np.cumsum(g.reshape(b, h, n, c), -1)

    tri0 = np.triu(np.ones((c, c), bool), 0)
    tri1 = np.triu(np.ones((c, c), bool), 1)
    decay = np.exp(np.where(np.tril(np.ones((c, c), bool)),
                            g[..., :, None] - g[..., None, :], 0)) * np.tril(np.ones((c, c)))
    attn = -(kb @ k.transpose(0, 1, 2, 4, 3)) * decay
    attn[..., tri0] = 0
    # (I - attn)^{-1}
    eye = np.eye(c)
    tinv = np.linalg.inv(np.broadcast_to(eye, attn.shape) - attn)
    u = tinv @ vb
    kcum = tinv @ (kb * np.exp(g)[..., None])

    state = init.astype(np.float64).copy()
    out = np.zeros((b, h, n, c, dv))
    for i in range(n):
        qi, ki = q[:, :, i], k[:, :, i]
        a = (qi @ ki.transpose(0, 1, 3, 2)) * decay[:, :, i]
        a[..., tri1] = 0
        vpr = kcum[:, :, i] @ state
        vnew = u[:, :, i] - vpr
        inter = (qi * np.exp(g[:, :, i])[..., None]) @ state
        out[:, :, i] = inter + a @ vnew
        state = state * np.exp(g[:, :, i, -1])[..., None, None] + \
            (ki * np.exp(g[:, :, i, -1, None] - g[:, :, i])[..., None]).transpose(0, 1, 3, 2) @ vnew
    return out.reshape(b, h, -1, dv)[:, :, :t], state


@pytest.mark.parametrize("t", [16, 37])
def test_chunk_gdn_vs_native(rng, t):
    b, h, dk, dv, c = 2, 3, 16, 16, 16
    q = rng.standard_normal((b, h, t, dk)).astype(np.float32)
    k = rng.standard_normal((b, h, t, dk)).astype(np.float32)
    v = rng.standard_normal((b, h, t, dv)).astype(np.float32)
    g = (-rng.random((b, h, t)) * 0.5).astype(np.float32)
    beta = rng.random((b, h, t)).astype(np.float32)
    init = rng.standard_normal((b, h, dk, dv)).astype(np.float32) * 0.1

    out, final = gdn.chunk_gated_delta_rule(
        jnp.array(q.transpose(0, 2, 1, 3)), jnp.array(k.transpose(0, 2, 1, 3)),
        jnp.array(v.transpose(0, 2, 1, 3)), jnp.array(g.transpose(0, 2, 1)),
        jnp.array(beta.transpose(0, 2, 1)), chunk_size=c,
        initial_state=jnp.array(init), output_final_state=True,
        use_qk_l2norm_in_kernel=True,
    )
    g_out, g_state = _np_gdn_native(q, k, v, g, beta, c, init, l2=True)
    assert calc_diff(np.asarray(out).transpose(0, 2, 1, 3), g_out) < 1e-5
    assert calc_diff(np.asarray(final), g_state) < 1e-5


def test_tri_inv(rng):
    for n in (16, 32, 64):
        # magnitudes like the GDN attn matrices (beta/decay-scaled); raw N(0,1)
        # strict-lower matrices are exponentially ill-conditioned at n=64
        a = np.tril(rng.standard_normal((3, n, n)).astype(np.float32), -1) * 0.2
        m = np.broadcast_to(np.eye(n, dtype=np.float32), a.shape) - a
        inv = gdn.tri_inv_col_sweep(jnp.array(m))
        assert_close(np.asarray(inv) @ m, np.broadcast_to(np.eye(n), a.shape),
                     rtol=1e-3, atol=1e-3)


def _np_recurrent_golden(mix, state, beta, scale, seq_lens, slot_idx, nk, nv, g,
                         num_accepted=None):
    t = mix.shape[0]
    dv, dk = state.shape[2], state.shape[3]
    x = mix.astype(np.float64)
    q, k, v = np.split(x, [nk * dk, 2 * nk * dk], axis=-1)
    q = q.reshape(t, nk, dk)
    k = k.reshape(t, nk, dk)
    v = v.reshape(t, nv, dv)
    q = q / np.sqrt((q * q).sum(-1, keepdims=True) + 1e-6)
    k = k / np.sqrt((k * k).sum(-1, keepdims=True) + 1e-6)
    if scale is None:
        scale = dk ** -0.5
    q = q * scale
    alpha = np.exp(g) if g is not None else np.ones((t, nv))
    b = 1 / (1 + np.exp(-beta)) if beta is not None else np.ones((t, nv))

    st = state.astype(np.float64).copy()
    out = np.zeros((t, nv, dv))
    seq_start = 0
    for i, sl in enumerate(seq_lens):
        if num_accepted is None:
            init = st[slot_idx[seq_start]].copy()
        else:
            init = st[slot_idx[seq_start + num_accepted[i] - 1]].copy()
        for hid in range(nv):
            s = init[hid].copy()
            for tok in range(seq_start, seq_start + sl):
                qi = q[tok][hid // (nv // nk)]
                ki = k[tok][hid // (nv // nk)]
                vi = v[tok][hid]
                s = s * alpha[tok][hid]
                xx = (s * ki[None, :]).sum(-1)
                y = (vi - xx) * b[tok][hid]
                s = s + y[:, None] * ki[None, :]
                st[slot_idx[tok]][hid] = s
                out[tok][hid] = (s * qi[None, :]).sum(-1)
        seq_start += sl
    return out, st


def test_recurrent_gdn(rng):
    nk, dk, nv, dv = 2, 8, 4, 8
    seq_lens = np.array([2, 3, 1], np.int32)
    t = int(seq_lens.sum())
    slots = 8
    mix = rng.standard_normal((t, 2 * nk * dk + nv * dv)).astype(np.float32)
    state = (rng.standard_normal((slots, nv, dv, dk)) * 0.2).astype(np.float32)
    beta = rng.standard_normal((t, nv)).astype(np.float32)
    g = (-rng.random((t, nv)) * 0.3).astype(np.float32)
    slot_idx = np.array([5, 5, 2, 2, 2, 7], np.int32)

    out, new_state = gdn.recurrent_gated_delta_rule(
        jnp.array(mix), jnp.array(state), jnp.array(beta), None,
        jnp.array(seq_lens), jnp.array(slot_idx), nk, nv, g=jnp.array(g),
        max_steps=4,
    )
    g_out, g_state = _np_recurrent_golden(mix, state, beta, None, seq_lens,
                                          slot_idx, nk, nv, g)
    assert calc_diff(np.asarray(out), g_out) < 1e-4
    assert calc_diff(np.asarray(new_state), g_state) < 1e-4


def test_varlen_chunk_gdn(rng):
    h, dk, dv, c = 2, 8, 8, 8
    seqs = [10, 5]
    total = sum(seqs)
    q = rng.standard_normal((1, total, h, dk)).astype(np.float32)
    k = rng.standard_normal((1, total, h, dk)).astype(np.float32)
    v = rng.standard_normal((1, total, h, dv)).astype(np.float32)
    g = (-rng.random((1, total, h)) * 0.3).astype(np.float32)
    beta = rng.random((1, total, h)).astype(np.float32)
    init = (rng.standard_normal((2, h, dk, dv)) * 0.1).astype(np.float32)
    cu = np.array([0, 10, 15], np.int32)

    out, final = gdn.chunk_gated_delta_rule_varlen(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(g), jnp.array(beta),
        jnp.array(cu), jnp.array(init), max_seq_len=16, chunk_size=c,
    )
    # golden: per-seq native
    off = 0
    for i, sl in enumerate(seqs):
        go, gs = _np_gdn_native(
            q[:, off:off + sl].transpose(0, 2, 1, 3),
            k[:, off:off + sl].transpose(0, 2, 1, 3),
            v[:, off:off + sl].transpose(0, 2, 1, 3),
            g[:, off:off + sl].transpose(0, 2, 1),
            beta[:, off:off + sl].transpose(0, 2, 1),
            c, init[i][None], l2=True)
        assert calc_diff(np.asarray(out)[0, off:off + sl].transpose(1, 0, 2), go[0]) < 1e-4
        assert calc_diff(np.asarray(final)[i], gs[0]) < 1e-4
        off += sl


def test_chunk_local_cumsum(rng):
    g = rng.standard_normal((2, 10, 3)).astype(np.float32)
    out = gdn.chunk_local_cumsum(jnp.array(g), 4)
    golden = g.copy()
    for lo in range(0, 10, 4):
        golden[:, lo:lo + 4] = np.cumsum(g[:, lo:lo + 4], axis=1)
    assert_close(out, golden, rtol=1e-5, atol=1e-6)
    out_r = gdn.chunk_local_cumsum(jnp.array(g), 4, reverse=True)
    golden_r = g.copy()
    for lo in range(0, 10, 4):
        seg = g[:, lo:lo + 4]
        golden_r[:, lo:lo + 4] = np.flip(np.cumsum(np.flip(seg, 1), 1), 1)
    assert_close(out_r, golden_r, rtol=1e-5, atol=1e-6)


def test_fused_gdn_update_pallas_vs_xla(rng, monkeypatch):
    """Pallas fused recurrent step vs the XLA composition (same contract),
    incl. GQA replication, bf16 state pool and an invalid (-1) slot."""
    monkeypatch.setenv("SKT_IMPL", "pallas")
    import jax
    from sgl_kernel_npu_tpu.ops import gdn as g

    b, h, hv, kd, vd, pool = 8, 4, 8, 32, 32, 10
    A_log = jnp.asarray(rng.standard_normal(hv) * 0.2, jnp.float32)
    dt_bias = jnp.asarray(rng.standard_normal(hv) * 0.2, jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, 1, h, kd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, 1, h, kd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, 1, hv, vd)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((b, 1, hv)), jnp.float32)
    bb = jnp.asarray(rng.standard_normal((b, 1, hv)), jnp.float32)
    st = jnp.asarray(rng.standard_normal((pool, hv, kd, vd)) * 0.3,
                     jnp.bfloat16)
    idx = jnp.asarray([0, 1, 2, 3, 4, 5, -1, 7], jnp.int32)

    o_ref, st_ref = g.fused_sigmoid_gating_delta_rule_update(
        A_log, a, dt_bias, 1.0, 20.0, q, k, v, bb, st, idx,
        use_qk_l2norm_in_kernel=True)
    o_p, st_p = g.fused_sigmoid_gating_delta_rule_update_pallas(
        A_log, a, dt_bias, 1.0, 20.0, q, k, v, bb, st, idx,
        use_qk_l2norm_in_kernel=True)
    from .utils import calc_diff
    assert calc_diff(np.asarray(o_p, np.float32),
                     np.asarray(o_ref, np.float32)) < 1e-3
    assert calc_diff(np.asarray(st_p, np.float32),
                     np.asarray(st_ref, np.float32)) < 1e-3
