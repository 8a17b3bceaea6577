"""Sinks/prefill/sparse/lightning-indexer attention + qkv fusion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import qkv_fusion
from sgl_kernel_npu_tpu.ops.attention import (
    lightning_indexer as li,
    prefill,
    sinks,
    sparse,
)

from .utils import assert_close, calc_diff


def test_laser_attention_ref_vs_pallas_interpret(rng):
    b, h, t, d = 2, 4, 64, 32
    q = rng.standard_normal((b, h, t, d), dtype=np.float32)
    k = rng.standard_normal((b, h, t, d), dtype=np.float32)
    v = rng.standard_normal((b, h, t, d), dtype=np.float32)
    ref = prefill.laser_attention_ref(jnp.array(q), jnp.array(k), jnp.array(v), 0.17)
    pal = prefill.laser_attention_pallas(
        jnp.array(q.reshape(b * h, t, d)), jnp.array(k.reshape(b * h, t, d)),
        jnp.array(v.reshape(b * h, t, d)), 0.17, block_q=32, block_k=32,
    ).reshape(b, h, t, d)
    assert_close(pal, np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_prefill_varlen_blocks(rng):
    t, hq, hkv, d = 24, 4, 2, 16
    cu = np.array([0, 10, 24], np.int32)
    q = rng.standard_normal((t, hq, d), dtype=np.float32)
    k = rng.standard_normal((t, hkv, d), dtype=np.float32)
    v = rng.standard_normal((t, hkv, d), dtype=np.float32)
    out = prefill.prefill_attention_varlen(jnp.array(q), jnp.array(k), jnp.array(v),
                                           jnp.array(cu), 0.25)
    # golden per sequence
    for s in range(2):
        lo, hi = cu[s], cu[s + 1]
        ref = prefill.laser_attention_ref(
            jnp.array(q[lo:hi].transpose(1, 0, 2)[None]),
            jnp.array(k[lo:hi].transpose(1, 0, 2)[None]),
            jnp.array(v[lo:hi].transpose(1, 0, 2)[None]), 0.25)
        assert_close(np.asarray(out)[lo:hi], np.asarray(ref)[0].transpose(1, 0, 2),
                     rtol=1e-3, atol=1e-3)


def test_sinks_decode_matches_plain_when_sink_tiny(rng):
    from sgl_kernel_npu_tpu.ops.attention import decode
    b, hq, hkv, d, ps, mp = 2, 4, 2, 16, 8, 3
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    kc = rng.standard_normal((hkv, 8, ps, d), dtype=np.float32)
    vc = rng.standard_normal((hkv, 8, ps, d), dtype=np.float32)
    bt = np.arange(1, 1 + b * mp).reshape(b, mp).astype(np.int32)
    sl = np.array([20, 11], np.int32)
    sink = np.full(hq, -1e30, np.float32)  # effectively no sink
    out = sinks.decode_attention_with_sinks(
        jnp.array(q), jnp.array(kc), jnp.array(vc), jnp.array(sink),
        jnp.array(sl), jnp.array(bt), 0.25, ps)
    ref = decode.decode_gqa_ref(jnp.array(q), jnp.array(kc), jnp.array(vc),
                                jnp.array(sl), jnp.array(bt), 0.25, ps)
    assert_close(out, np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_sinks_decode_golden(rng):
    b, hq, hkv, d, ps, mp = 1, 2, 1, 8, 4, 2
    q = rng.standard_normal((b, hq, d), dtype=np.float32)
    kc = rng.standard_normal((hkv, 4, ps, d), dtype=np.float32)
    vc = rng.standard_normal((hkv, 4, ps, d), dtype=np.float32)
    bt = np.array([[1, 2]], np.int32)
    sl = np.array([6], np.int32)
    sk = np.array([0.5, -0.3], np.float32)
    window = 4
    out = sinks.decode_attention_with_sinks(
        jnp.array(q), jnp.array(kc), jnp.array(vc), jnp.array(sk),
        jnp.array(sl), jnp.array(bt), 0.3, ps, sliding_window_size=window)
    # golden
    keys = kc[0, bt[0]].reshape(-1, d)[:6]
    vals = vc[0, bt[0]].reshape(-1, d)[:6]
    for h in range(hq):
        s = keys @ q[0, h] * 0.3
        s[: 6 - window] = -np.inf
        mx = max(s.max(), sk[h])
        p = np.exp(s - mx)
        denom = p.sum() + np.exp(sk[h] - mx)
        golden = (p / denom) @ vals
        assert_close(np.asarray(out)[0, h], golden, rtol=1e-3, atol=1e-3)


def test_sinks_prefill(rng):
    t, hq, hkv, d = 12, 2, 2, 8
    cu = np.array([0, 5, 12], np.int32)
    q = rng.standard_normal((t, hq, d), dtype=np.float32)
    k = rng.standard_normal((t, hkv, d), dtype=np.float32)
    v = rng.standard_normal((t, hkv, d), dtype=np.float32)
    sk = rng.standard_normal(hq).astype(np.float32)
    out = sinks.prefill_attention_with_sinks(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(sk), jnp.array(cu), 0.3)
    # golden: per-token loop
    for ti in range(t):
        s_idx = 0 if ti < 5 else 1
        lo = cu[s_idx]
        ctx = np.arange(lo, ti + 1)
        for h in range(hq):
            s = (k[ctx, h] @ q[ti, h]) * 0.3
            mx = max(s.max(), sk[h])
            p = np.exp(s - mx)
            denom = p.sum() + np.exp(sk[h] - mx)
            golden = (p / denom) @ v[ctx, h]
            assert_close(np.asarray(out)[ti, h], golden, rtol=1e-3, atol=1e-3)


def test_block_sparse_with_estimator(rng):
    b, h, t, d, bs = 1, 2, 32, 16, 8
    q = rng.standard_normal((b, h, t, d), dtype=np.float32)
    k = rng.standard_normal((b, h, t, d), dtype=np.float32)
    v = rng.standard_normal((b, h, t, d), dtype=np.float32)
    mask, count = sparse.sparse_block_estimate(jnp.array(q), jnp.array(k), bs,
                                               keep_ratio=1.0)
    # keep_ratio 1 + causal -> full causal mask -> equals dense causal attention
    out = sparse.block_sparse_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                                        mask, 0.25, bs)
    ref = prefill.laser_attention_ref(jnp.array(q), jnp.array(k), jnp.array(v), 0.25)
    assert_close(out, np.asarray(ref), rtol=1e-3, atol=1e-3)
    assert np.all(np.asarray(count) >= 1)

    # partial keep: each query block keeps the causal-diagonal block
    mask2, _ = sparse.sparse_block_estimate(jnp.array(q), jnp.array(k), bs, 0.25)
    m2 = np.asarray(mask2)
    for i in range(t // bs):
        assert m2[0, :, i, min(i, t // bs - 1)].all()


def test_lightning_indexer(rng):
    b, sq, g, d, sk_len = 2, 4, 2, 16, 32
    q = rng.standard_normal((b, sq, g, d), dtype=np.float32)
    k = rng.standard_normal((b, sk_len, d), dtype=np.float32)
    w = rng.random((b, sq, g)).astype(np.float32)
    qpos = np.tile(np.arange(sq) + 20, (b, 1)).astype(np.int32)
    idx, scores = li.lightning_indexer(
        jnp.array(q), jnp.array(k), jnp.array(w), sparse_count=8,
        actual_seq_lengths_key=jnp.array([30, 25], np.int32),
        query_positions=jnp.array(qpos))
    g_scores = np.einsum("bqgk,bqg->bqk",
                         np.maximum(np.einsum("bqgd,bkd->bqgk", q, k), 0), w)
    for bi in range(b):
        limit = [30, 25][bi]
        for qi in range(sq):
            valid = min(limit, qpos[bi, qi] + 1)
            order = np.argsort(-g_scores[bi, qi, :valid], kind="stable")[:8]
            got = set(np.asarray(idx)[bi, qi][np.asarray(idx)[bi, qi] >= 0].tolist())
            assert got == set(order.tolist())


def test_lightning_indexer_paged_roundtrip(rng):
    b, g, d, ps, mp = 2, 2, 16, 8, 3
    q = rng.standard_normal((b, g, d), dtype=np.float32)
    kc = rng.standard_normal((8, ps, d), dtype=np.float32)
    bt = np.array([[1, 3, 5], [2, 4, 6]], np.int32)
    sl = np.array([20, 9], np.int32)
    w = rng.random((b, g)).astype(np.float32)
    slots = li.lightning_indexer_paged(jnp.array(q), jnp.array(kc), jnp.array(w),
                                       jnp.array(bt), jnp.array(sl), sparse_count=6)
    slots = np.asarray(slots)
    # every returned slot decodes to a valid in-sequence position
    for bi in range(b):
        for s in slots[bi]:
            if s < 0:
                continue
            page, off = s // ps, s % ps
            logical = list(bt[bi]).index(page) * ps + off
            assert logical < sl[bi]
    # top-1 matches brute force
    k_full = kc[bt].reshape(b, mp * ps, d)
    sc = np.einsum("bgk,bg->bk", np.maximum(np.einsum("bgd,bkd->bgk", q, k_full), 0), w)
    for bi in range(b):
        sc[bi, sl[bi]:] = -np.inf
        best_logical = np.argmax(sc[bi])
        best_slot = bt[bi][best_logical // ps] * ps + best_logical % ps
        assert slots[bi, 0] == best_slot


def test_split_qkv_rmsnorm_rope(rng):
    b, hq, hkv, hd, rope = 4, 4, 2, 16, 16
    qh, kvh = hq * hd, hkv * hd
    x = rng.standard_normal((b, qh + 2 * kvh), dtype=np.float32)
    sin = rng.standard_normal((b, rope), dtype=np.float32)
    cos = rng.standard_normal((b, rope), dtype=np.float32)
    qw = rng.standard_normal(hd, dtype=np.float32)
    kw = rng.standard_normal(hd, dtype=np.float32)
    q, k, v = qkv_fusion.split_qkv_rmsnorm_rope(
        jnp.array(x), jnp.array(sin), jnp.array(cos), qh, kvh, hd,
        eps=1e-6, q_weight=jnp.array(qw), k_weight=jnp.array(kw))
    # golden
    def rms(h, w):
        h = h.reshape(-1, hd)
        return h / np.sqrt((h * h).mean(-1, keepdims=True) + 1e-6) * w

    def rope_rot(h, s, c):
        half = rope // 2
        rot = np.concatenate([-h[..., half:], h[..., :half]], -1)
        return h * c + rot * s

    for i in range(b):
        gq = rms(x[i, :qh], qw)
        gq = rope_rot(gq, sin[i], cos[i])
        assert_close(np.asarray(q)[i].reshape(-1, hd), gq, rtol=1e-3, atol=1e-3)
        gk = rms(x[i, qh:qh + kvh], kw)
        gk = rope_rot(gk, sin[i], cos[i])
        assert_close(np.asarray(k)[i].reshape(-1, hd), gk, rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(v)[i], x[i, qh + kvh:])


def test_fused_split_qk_norm(rng):
    b, qlr, kvlr, rope = 3, 32, 16, 8
    x = rng.standard_normal((b, qlr + kvlr + rope), dtype=np.float32)
    qw = rng.standard_normal(qlr, dtype=np.float32)
    kw = rng.standard_normal(kvlr, dtype=np.float32)
    q, kn, kp = qkv_fusion.fused_split_qk_norm(
        jnp.array(x), jnp.array(qw), jnp.array(kw), qlr, kvlr, rope)
    def rms(h, w):
        return h / np.sqrt((h * h).mean(-1, keepdims=True) + 1e-6) * w
    assert_close(q, rms(x[:, :qlr], qw), rtol=1e-3, atol=1e-3)
    assert_close(np.asarray(kn)[:, 0], rms(x[:, qlr:qlr + kvlr], kw), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(kp)[:, 0], x[:, qlr + kvlr:])


def test_split_qkvgate_gemma(rng):
    b, nqh, nkvh, hd, rope = 3, 2, 1, 8, 8
    qh, kvh = nqh * hd, nkvh * hd
    x = rng.standard_normal((b, 2 * qh + 2 * kvh)).astype(np.float32)
    sin = rng.standard_normal((b, rope)).astype(np.float32)
    cos = rng.standard_normal((b, rope)).astype(np.float32)
    qw = rng.standard_normal(hd).astype(np.float32) * 0.1
    kw = rng.standard_normal(hd).astype(np.float32) * 0.1
    q, k, v, gate = qkv_fusion.split_qkvgate_gemma_rmsnorm_rope(
        jnp.array(x), jnp.array(sin), jnp.array(cos), qh, kvh, hd, rope, 1e-6,
        jnp.array(qw), jnp.array(kw))

    def rms(h, w):
        h = h.reshape(-1, hd)
        return h / np.sqrt((h * h).mean(-1, keepdims=True) + 1e-6) * (1 + w)

    def rope_rot(h, s, c):
        half = rope // 2
        rot = np.concatenate([-h[..., half:], h[..., :half]], -1)
        return h * c + rot * s

    xq = x[:, :2 * qh].reshape(b, nqh, 2 * hd)
    for i in range(b):
        gq = rms(xq[i, :, :hd].reshape(-1), qw).reshape(nqh, hd)
        gq = np.stack([rope_rot(gq[j], sin[i], cos[i]) for j in range(nqh)])
        assert_close(np.asarray(q)[i].reshape(nqh, hd), gq, rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(gate)[i].reshape(nqh, hd),
                                      xq[i, :, hd:])
        gk = rms(x[i, 2 * qh:2 * qh + kvh], kw).reshape(nkvh, hd)
        gk = np.stack([rope_rot(gk[j], sin[i], cos[i]) for j in range(nkvh)])
        assert_close(np.asarray(k)[i].reshape(nkvh, hd), gk, rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(v)[i], x[i, 2 * qh + kvh:])


def test_lightning_indexer_varlen_tnd(rng):
    """TND varlen layout (ref README layout 'TND'): two ragged batches packed
    flat; every token's top-k must match a per-batch numpy oracle with
    end-aligned causality."""
    g, d = 2, 16
    len_q = [3, 5]
    len_k = [10, 7]
    cu_q = np.cumsum(len_q).astype(np.int32)
    cu_k = np.cumsum(len_k).astype(np.int32)
    t, tk = int(cu_q[-1]), int(cu_k[-1])
    q = rng.standard_normal((t, g, d), dtype=np.float32)
    k = rng.standard_normal((tk, d), dtype=np.float32)
    w = rng.random((t, g)).astype(np.float32)

    idx, _ = li.lightning_indexer_varlen(
        jnp.array(q), jnp.array(k), jnp.array(w),
        jnp.array(cu_q), jnp.array(cu_k), sparse_count=4)

    qs, ks = 0, 0
    for bi in range(2):
        lq, lk = len_q[bi], len_k[bi]
        for j in range(lq):
            scores = np.einsum("gk,g->k",
                               np.maximum(np.einsum(
                                   "gd,kd->gk", q[qs + j], k[ks:ks + lk]), 0),
                               w[qs + j])
            frontier = j + lk - lq          # end-aligned causal
            valid = frontier + 1
            order = np.argsort(-scores[:valid], kind="stable")[:4]
            row = np.asarray(idx)[qs + j]
            got = set(row[row >= 0].tolist())
            assert got == set(order.tolist()), (bi, j)
        qs += lq
        ks += lk


def test_topk_block_sparse_pallas_vs_ref(rng):
    """Block-granular Pallas top-k decode kernel (rainfusion analogue,
    VERDICT r3 item 9) vs the XLA token-gather reference over the same
    token set (each selected 8-token micro-block expanded to token ids)."""
    b, h, d, dv, ps, num_pages, kb = 4, 8, 128, 128, 128, 16, 24
    q = rng.standard_normal((b, h, d), dtype=np.float32)
    kc = rng.standard_normal((num_pages, ps, d), dtype=np.float32)
    vc = rng.standard_normal((num_pages, ps, dv), dtype=np.float32)
    nblocks = num_pages * ps // 8
    bids = np.stack([rng.choice(nblocks, kb, replace=False)
                     for _ in range(b)]).astype(np.int32)
    bids[1, 10:] = -1
    bids[3, 1:] = -1
    # expand to token ids for the XLA reference
    tok = np.where(bids[..., None] >= 0,
                   bids[..., None] * 8 + np.arange(8), -1).reshape(b, kb * 8)
    seq = jnp.full((b,), num_pages * ps, jnp.int32)

    ref = sparse.topk_sparse_attention(
        jnp.array(q), jnp.array(kc), jnp.array(vc), jnp.array(tok), seq,
        0.11, ps)
    got = sparse.topk_block_sparse_attention_pallas(
        jnp.array(q), jnp.array(kc), jnp.array(vc), jnp.array(bids),
        0.11, ps, chunk=8, nbuf=2)
    assert_close(got, np.asarray(ref), rtol=2e-3, atol=2e-3)

    # the token-granular dispatcher stays on the XLA gather path
    got2 = sparse.topk_sparse_attention_dispatch(
        jnp.array(q), jnp.array(kc), jnp.array(vc), jnp.array(tok), seq,
        0.11, ps)
    assert_close(got2, np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_sparse_block_estimate_pallas_vs_ref(rng):
    b, h, t, d, bs = 2, 2, 256, 128, 64
    q = rng.standard_normal((b, h, t, d), dtype=np.float32)
    k = rng.standard_normal((b, h, t, d), dtype=np.float32)
    for kr in (0.25, 1.0):
        m_ref, c_ref = sparse.sparse_block_estimate(
            jnp.array(q), jnp.array(k), bs, keep_ratio=kr)
        m_pl, c_pl = sparse.sparse_block_estimate_pallas(
            jnp.array(q), jnp.array(k), bs, keep_ratio=kr)
        np.testing.assert_array_equal(np.asarray(m_pl), np.asarray(m_ref))
        np.testing.assert_array_equal(np.asarray(c_pl), np.asarray(c_ref))
    m_q, _ = sparse.sparse_block_estimate(jnp.array(q), jnp.array(k), bs,
                                          keep_ratio=0.25)
    m_d, _ = sparse.sparse_block_estimate_dispatch(
        jnp.array(q), jnp.array(k), bs, keep_ratio=0.25)
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_q))
