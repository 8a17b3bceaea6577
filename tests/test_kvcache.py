"""KV-cache op tests vs numpy goldens (reference tests:
test_alloc_extend_slot.py, test_cache_assign.py, test_inplace_assign_cache.py)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import kvcache


def _alloc_extend_golden(pre_lens, seq_lens, last_loc, free_pages, page_size):
    """Direct port of the test's alloc_extend_pytorch golden (numpy)."""
    out = []
    gp = 0
    for i in range(len(pre_lens)):
        pre, seq = int(pre_lens[i]), int(seq_lens[i])
        part1_end = min(seq, -(-pre // page_size) * page_size)
        for p in range(pre, part1_end):
            out.append(int(last_loc[i]) + 1 + (p - pre))
        pos = part1_end
        while pos < seq:
            page = int(free_pages[gp])
            fill = min(page_size, seq - pos)
            for q in range(fill):
                out.append(page * page_size + q)
            pos += fill
            gp += 1
    return np.array(out, np.int32), gp


def test_alloc_extend(rng):
    page_size = 8
    pre = np.array([3, 8, 0, 13], np.int32)
    seq = np.array([10, 8, 20, 30], np.int32)
    last_loc = np.array([18, 55, -1, 108], np.int32)  # slot of last token
    free_pages = np.arange(100, 140, dtype=np.int32)
    out_size = 64
    out, used = kvcache.alloc_extend(
        jnp.array(pre), jnp.array(seq), jnp.array(last_loc),
        jnp.array(free_pages), page_size, out_size,
    )
    golden, g_used = _alloc_extend_golden(pre, seq, last_loc, free_pages, page_size)
    np.testing.assert_array_equal(np.asarray(out)[: len(golden)], golden)
    assert np.all(np.asarray(out)[len(golden):] == -1)
    assert int(used) == g_used


def test_cache_loc_assign(rng):
    bs, rows, cols = 3, 6, 16
    pool = rng.integers(0, 100, (rows, cols)).astype(np.int32)
    req_idx = np.array([4, 0, 2], np.int32)
    start = np.array([2, 0, 5], np.int32)
    end = np.array([5, 4, 9], np.int32)
    ocl = np.arange(100, 100 + 11, dtype=np.int32)  # 3+4+4 = 11
    out = kvcache.cache_loc_assign(
        jnp.array(req_idx), jnp.array(pool), jnp.array(start), jnp.array(end),
        jnp.array(ocl),
    )
    golden = pool.copy()
    c = 0
    for i in range(bs):
        ln = end[i] - start[i]
        golden[req_idx[i], start[i]:end[i]] = ocl[c:c + ln]
        c += ln
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_assign_cache_op(rng):
    dst = rng.standard_normal((20, 4), dtype=np.float32)
    src = rng.standard_normal((20, 4), dtype=np.float32)
    out = kvcache.assign_cache_op(
        jnp.array(dst), jnp.array(src),
        jnp.array(3), jnp.array(9), jnp.array(11), jnp.array(17),
    )
    golden = dst.copy()
    golden[3:9] = src[11:17]
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_reshape_and_cache_gqa(rng):
    hkv, pages, ps, d, t = 2, 6, 4, 8, 5
    kc = np.zeros((hkv, pages, ps, d), np.float32)
    vc = np.zeros_like(kc)
    k = rng.standard_normal((t, hkv, d), dtype=np.float32)
    v = rng.standard_normal((t, hkv, d), dtype=np.float32)
    slots = np.array([0, 5, 13, 22, -1], np.int32)
    kc2, vc2 = kvcache.reshape_and_cache_gqa(
        jnp.array(k), jnp.array(v), jnp.array(kc), jnp.array(vc), jnp.array(slots)
    )
    kc2, vc2 = np.asarray(kc2), np.asarray(vc2)
    for i, s in enumerate(slots):
        if s < 0:
            continue
        np.testing.assert_array_equal(kc2[:, s // ps, s % ps], k[i])
        np.testing.assert_array_equal(vc2[:, s // ps, s % ps], v[i])
    # untouched slots remain zero
    assert np.count_nonzero(kc2) == 4 * hkv * d


def test_transfer_kv_roundtrip(rng):
    x = rng.standard_normal((3, 5, 4, 2, 8), dtype=np.float32)  # [L,P,page,H,D]
    host = kvcache.transfer_kv_to_host(jnp.array(x))
    assert np.asarray(host).shape == (5, 3, 4, 2, 8)
    back = kvcache.transfer_kv_to_device(host)
    np.testing.assert_array_equal(np.asarray(back), x)
