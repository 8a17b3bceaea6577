"""Mamba conv ops vs numpy goldens (reference tests: test_conv1d_prefill.py,
test_conv1d_update.py, test_mamba_conv.py, test_mamba_state_update.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import mamba, grammar

from .utils import assert_close


def _np_causal_conv(x, w, bias, init, act):
    b, dim, t = x.shape
    _, width = w.shape
    xp = np.concatenate([init, x], axis=-1)
    out = np.zeros((b, dim, t), np.float32)
    for i in range(width):
        out += w[None, :, i:i + 1] * xp[..., i:i + t]
    if bias is not None:
        out += bias[None, :, None]
    if act == "silu":
        out = out / (1 + np.exp(-out))
    return out, xp


def test_causal_conv1d_fn(rng):
    b, dim, t, w = 3, 8, 12, 4
    x = rng.standard_normal((b, dim, t), dtype=np.float32)
    weight = rng.standard_normal((dim, w), dtype=np.float32)
    bias = rng.standard_normal(dim, dtype=np.float32)
    init = rng.standard_normal((b, dim, w - 1), dtype=np.float32)
    seqlens = np.array([12, 7, 2], np.int32)

    out, final = mamba.causal_conv1d_fn(
        jnp.array(x), jnp.array(weight), jnp.array(bias),
        initial_states=jnp.array(init), activation="silu",
        return_final_states=True, seqlens=jnp.array(seqlens),
    )
    golden, xp = _np_causal_conv(x, weight, bias, init, "silu")
    assert_close(out, golden, rtol=1e-3, atol=1e-3)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(final)[i], xp[i][:, seqlens[i]:seqlens[i] + w - 1], rtol=1e-5)


def test_causal_conv1d_varlen(rng):
    dim, w = 4, 3
    seqs = [5, 3, 6]
    total = sum(seqs)
    x = rng.standard_normal((dim, total), dtype=np.float32)
    weight = rng.standard_normal((dim, w), dtype=np.float32)
    qsl = np.concatenate([[0], np.cumsum(seqs)]).astype(np.int32)
    conv_states = rng.standard_normal((4, dim, w - 1), dtype=np.float32)
    cache_idx = np.array([2, 0, 3], np.int32)
    has_init = np.array([True, False, True])

    out, final = mamba.causal_conv1d_varlen(
        jnp.array(x), jnp.array(qsl), jnp.array(weight), None,
        conv_states=jnp.array(conv_states), cache_indices=jnp.array(cache_idx),
        has_initial_state=jnp.array(has_init), activation="silu",
        max_seq_len=8,
    )
    # per-seq golden
    off = 0
    for i, sl in enumerate(seqs):
        xs = x[:, off:off + sl][None]
        init = (conv_states[cache_idx[i]] * has_init[i])[None]
        g, _ = _np_causal_conv(xs, weight, None, init, "silu")
        assert_close(np.asarray(out)[:, off:off + sl], g[0], rtol=1e-3, atol=1e-3)
        off += sl


def test_causal_conv1d_update_and_rollback(rng):
    b, dim, s, w, lines, state_len = 2, 4, 3, 4, 5, 3
    x = rng.standard_normal((b, dim, s), dtype=np.float32)
    weight = rng.standard_normal((dim, w), dtype=np.float32)
    conv_state = rng.standard_normal((lines, dim, state_len), dtype=np.float32)
    idx = np.array([3, 1], np.int32)

    inter_buf = jnp.zeros((b, s, dim, state_len), jnp.float32)
    out, new_state, inter = mamba.causal_conv1d_update(
        jnp.array(x), jnp.array(conv_state), jnp.array(weight),
        activation="silu", conv_state_indices=jnp.array(idx),
        intermediate_conv_window=inter_buf,
    )
    # golden: sequential roll
    for i in range(b):
        st = conv_state[idx[i]].copy()
        for step in range(s):
            window = np.concatenate([st[:, -(w - 1):], x[i, :, step:step + 1]], -1)
            y = (window * weight).sum(-1)
            y = y / (1 + np.exp(-y))
            assert_close(np.asarray(out)[i, :, step], y, rtol=1e-3, atol=1e-3)
            st = np.concatenate([st[:, 1:], x[i, :, step:step + 1]], -1)
            np.testing.assert_allclose(np.asarray(inter)[i, step], st, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state)[idx[i]], st, rtol=1e-5)

    # rollback: [L, pool, win, dims]
    cs = rng.standard_normal((2, 4, 5, 3), dtype=np.float32)
    st_idx = np.array([1, 3], np.int32)
    steps = np.array([0, 2], np.int32)  # shifts 2 and 0
    rolled = mamba.conv_state_rollback(jnp.array(cs), jnp.array(st_idx),
                                       jnp.array(steps), draft_token_num=3)
    g = cs.copy()
    g[:, 1, 2:, :] = cs[:, 1, :-2, :]  # shift 2
    np.testing.assert_allclose(np.asarray(rolled), g, rtol=1e-6)


def test_move_intermediate_cache(rng):
    l, s, d, h, v, k = 2, 3, 4, 2, 3, 2
    ssm = np.zeros((l, 6, h, v, k), np.float32)
    inter = rng.standard_normal((l, s, d, h, v, k), dtype=np.float32)
    dst = np.array([4, 0], np.int32)
    src = np.array([1, 2], np.int32)
    steps = np.array([3, 0], np.int32)
    out = mamba.move_intermediate_cache(
        jnp.array(ssm), jnp.array(inter), jnp.array(dst), jnp.array(src),
        jnp.array(steps))
    np.testing.assert_allclose(np.asarray(out)[:, 4], inter[:, 1, 3], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[:, 0], inter[:, 2, 0], rtol=1e-6)


def test_apply_token_bitmask(rng):
    b, v = 4, 70
    logits = rng.standard_normal((b, v), dtype=np.float32)
    words = -(-v // 32)
    bm = rng.integers(0, 2**31, (2, words), dtype=np.int64).astype(np.int32)
    indices = np.array([2, 0], np.int32)
    out = grammar.apply_token_bitmask(jnp.array(logits), jnp.array(bm), jnp.array(indices))
    golden = logits.copy()
    for r, row in enumerate(indices):
        for c in range(v):
            if not ((int(bm[r, c // 32]) >> (c % 32)) & 1):
                golden[row, c] = -np.inf
    np.testing.assert_array_equal(np.asarray(out), golden)
    # no-indices variant
    bm_full = rng.integers(0, 2**31, (b, words), dtype=np.int64).astype(np.int32)
    out2 = grammar.apply_token_bitmask(jnp.array(logits), jnp.array(bm_full))
    for r in range(b):
        for c in range(v):
            want = logits[r, c] if ((int(bm_full[r, c // 32]) >> (c % 32)) & 1) else -np.inf
            assert np.asarray(out2)[r, c] == want


def test_causal_conv1d_update_cache_seqlens_parity(rng):
    """cache_seqlens API parity: the reference DOCUMENTS a circular-buffer
    mode (causal_conv1d.py:1287-1291) but its Triton kernel never reads the
    pointer (`cache_seqlens_ptr` appears only in the kernel signature, :981)
    and validate_data asserts it None (:1305,:1336) — the executed semantics
    with cache_seqlens set are the ordinary sliding-window update. This test
    pins our op to that actual reference behavior: passing cache_seqlens must
    be accepted and must not change the result."""
    b, dim, w, state_len = 3, 16, 4, 6
    x = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32)
    state = jnp.asarray(rng.standard_normal((b, dim, state_len)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((dim, w)), jnp.float32)
    cache_seqlens = jnp.asarray(rng.integers(0, 100, b), jnp.int32)

    out_plain, st_plain = mamba.causal_conv1d_update(
        x, state, weight, activation="silu")
    out_cs, st_cs = mamba.causal_conv1d_update(
        x, state, weight, activation="silu", cache_seqlens=cache_seqlens)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_cs))
    np.testing.assert_array_equal(np.asarray(st_plain), np.asarray(st_cs))
