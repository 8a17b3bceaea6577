"""Quantization + quantized matmul tests (reference: test_mm_wfp8a16.py,
test_gmm_wfp8a16.py:8-88 golden, test_batch_matmul_transpose.py)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import matmul, quant

from .utils import assert_close


def test_per_token_quant_int8_roundtrip(rng):
    x = rng.standard_normal((16, 64), dtype=np.float32) * 5
    q, s = quant.per_token_quant_int8(jnp.array(x))
    deq = np.asarray(q, np.float32) * np.asarray(s)
    assert_close(deq, x, rtol=2e-2, atol=0.1)


def test_fp8_block_quant_roundtrip(rng):
    x = rng.standard_normal((4, 256), dtype=np.float32)
    q, s = quant.per_block_quant_fp8(jnp.array(x), block=128)
    deq = quant.dequant_fp8_block(q, s, block=128, dtype=jnp.float32)
    assert_close(deq, x, rtol=0.1, atol=0.1)


def test_quant_matmul_int8_ref(rng):
    m, k, n = 16, 64, 32
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    xq, xs = quant.per_token_quant_int8(jnp.array(x))
    wq, ws_col = quant.per_token_quant_int8(jnp.array(w.T))  # per-output-channel
    out = matmul.quant_matmul_int8_ref(xq, wq.T, xs, ws_col[:, 0])
    assert_close(out, x @ w, rtol=5e-2, atol=0.2)


def test_quant_matmul_int8_pallas_matches_ref(rng):
    m, k, n = 128, 256, 128
    xq = rng.integers(-127, 127, (m, k)).astype(np.int8)
    wq = rng.integers(-127, 127, (k, n)).astype(np.int8)
    xs = (rng.random((m, 1)) * 0.1 + 0.01).astype(np.float32)
    ws = (rng.random(n) * 0.1 + 0.01).astype(np.float32)
    ref = matmul.quant_matmul_int8_ref(jnp.array(xq), jnp.array(wq), jnp.array(xs), jnp.array(ws))
    pal = matmul.quant_matmul_int8_pallas(
        jnp.array(xq), jnp.array(wq), jnp.array(xs), jnp.array(ws),
        block_m=64, block_n=64, block_k=128,
    )
    assert_close(pal, ref, rtol=1e-2, atol=1e-2)


def _np_block_dequant(w_fp8, scale, block=128):
    k, n = w_fp8.shape
    sk, sn = scale.shape
    out = np.zeros((sk * block, sn * block), np.float32)
    out[:k, :n] = w_fp8.astype(np.float32)
    out = out.reshape(sk, block, sn, block) * scale[:, None, :, None]
    return out.reshape(sk * block, sn * block)[:k, :n]


def test_mm_wfp8a16(rng):
    m, k, n = 8, 256, 128
    x = rng.standard_normal((m, k), dtype=np.float32).astype(np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    wq, ws = quant.per_block_quant_fp8(jnp.array(w.T), block=128)
    # layout conversion: our per_block_quant is over last dim; build [K,N] fp8
    w_fp8 = jnp.array(w).astype(jnp.float8_e4m3fn)
    scale = jnp.ones((k // 128, n // 128), jnp.float32) * 1.5
    out = matmul.mm_wfp8a16_ref(jnp.array(x, dtype=jnp.bfloat16), w_fp8, scale)
    golden = x @ _np_block_dequant(np.asarray(w_fp8, np.float32), np.asarray(scale))
    assert_close(out, golden, rtol=5e-2, atol=0.5)


def test_mm_wfp8a16_pallas_matches_ref(rng):
    m, k, n = 64, 256, 256
    x = jnp.array(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    w_fp8 = jnp.array(rng.standard_normal((k, n)), dtype=jnp.float8_e4m3fn)
    scale = jnp.array(rng.random((k // 128, n // 128)) + 0.5, dtype=jnp.float32)
    ref = matmul.mm_wfp8a16_ref(x, w_fp8, scale)
    pal = matmul.mm_wfp8a16_pallas(x, w_fp8, scale, block_m=64)
    assert_close(pal, ref, rtol=2e-2, atol=0.2)


def test_gmm_wfp8a16(rng):
    g, k, n = 3, 128, 128
    s = 20
    x = jnp.array(rng.standard_normal((s, k)), dtype=jnp.bfloat16)
    w_fp8 = jnp.array(rng.standard_normal((g, k, n)), dtype=jnp.float8_e4m3fn)
    scale = jnp.array(rng.random((g, 1, 1)) + 0.5, dtype=jnp.float32)
    group_list = jnp.array([8, 5, 7], jnp.int32)
    out = matmul.gmm_wfp8a16(x, w_fp8, scale, group_list)
    xs = np.asarray(x, np.float32)
    golden = np.zeros((s, n), np.float32)
    start = 0
    for gi, cnt in enumerate([8, 5, 7]):
        wg = _np_block_dequant(np.asarray(w_fp8[gi], np.float32), np.asarray(scale[gi]))
        golden[start : start + cnt] = xs[start : start + cnt] @ wg
        start += cnt
    assert_close(out, golden, rtol=5e-2, atol=0.5)


def test_grouped_matmul_int8(rng):
    g, k, n, s = 2, 64, 32, 12
    xq = rng.integers(-100, 100, (s, k)).astype(np.int8)
    wq = rng.integers(-100, 100, (g, k, n)).astype(np.int8)
    xs = (rng.random((s, 1)) * 0.1).astype(np.float32)
    ws = (rng.random((g, n)) * 0.1).astype(np.float32)
    gl = np.array([7, 5], np.int32)
    out = matmul.grouped_matmul_int8(
        jnp.array(xq), jnp.array(wq), jnp.array(xs), jnp.array(ws), jnp.array(gl)
    )
    golden = np.zeros((s, n), np.float32)
    start = 0
    for gi, cnt in enumerate(gl):
        acc = xq[start : start + cnt].astype(np.int32) @ wq[gi].astype(np.int32)
        golden[start : start + cnt] = acc * xs[start : start + cnt] * ws[gi]
        start += cnt
    assert_close(out, golden, rtol=2e-2, atol=0.1)


def test_batch_matmul_transpose(rng):
    m, b, k, n = 6, 4, 32, 16
    x = rng.standard_normal((m, b, k), dtype=np.float32)
    w = rng.standard_normal((b, k, n), dtype=np.float32)
    out = matmul.batch_matmul_transpose(jnp.array(x), jnp.array(w))
    assert_close(out, np.einsum("mbk,bkn->mbn", x, w), rtol=2e-2, atol=1e-2)


def test_grouped_matmul_int8_pallas_matches_ref(rng):
    """Megablox-style grouped GEMM (aligned m-tiles, scalar-prefetched expert
    ids) vs the ragged_dot reference, with empty + ragged groups."""
    import jax.numpy as jnp

    g, k, n, tile = 4, 96, 64, 8
    counts = np.array([5, 0, 11, 3], np.int32)
    x = rng.standard_normal((int(counts.sum()), k), dtype=np.float32)
    w = rng.standard_normal((g, k, n), dtype=np.float32)
    xq, xs = quant.per_token_quant_int8(jnp.array(x))
    wq = jnp.array(np.clip(np.round(w * 20), -127, 127), jnp.int8)
    wsc = jnp.full((g, n), 1 / 20.0, jnp.float32)

    ref = matmul.grouped_matmul_int8_ref(xq, wq, xs, wsc, jnp.array(counts))

    # build the aligned (padded) layout by hand
    al_sizes = (counts + tile - 1) // tile * tile
    al_off = np.cumsum(al_sizes) - al_sizes
    tight_off = np.cumsum(counts) - counts
    m_pad = int(al_sizes.sum())
    xq_p = np.zeros((m_pad, k), np.int8)
    xs_p = np.zeros((m_pad, 1), np.float32)
    for e in range(g):
        sl = slice(al_off[e], al_off[e] + counts[e])
        xq_p[sl] = np.asarray(xq)[tight_off[e]:tight_off[e] + counts[e]]
        xs_p[sl] = np.asarray(xs)[tight_off[e]:tight_off[e] + counts[e]]
    eid = np.searchsorted(np.cumsum(al_sizes), np.arange(m_pad // tile) * tile,
                          side="right").astype(np.int32)

    pal = matmul.grouped_matmul_int8_pallas(
        jnp.array(xq_p), wq, jnp.array(xs_p), wsc, jnp.array(eid),
        block_m=tile, block_n=32, block_k=32)
    for e in range(g):
        got = np.asarray(pal)[al_off[e]:al_off[e] + counts[e]]
        want = np.asarray(ref)[tight_off[e]:tight_off[e] + counts[e]]
        assert_close(got.astype(np.float32), want.astype(np.float32),
                     rtol=2e-2, atol=2e-2)
    # padding rows are exactly zero
    for e in range(g):
        pad = np.asarray(pal)[al_off[e] + counts[e]: al_off[e] + al_sizes[e]]
        assert np.all(pad == 0)


def test_stacked_tiled_matches_stacked(rng):
    """Pre-tiled [L, NB, K, bn] bank path == plain stacked [L, K, N] path
    (and both == the per-layer ref)."""
    import jax

    l, m, k, n, bn = 3, 16, 64, 128, 32
    xq = jnp.array(rng.integers(-127, 127, (m, k)).astype(np.int8))
    wq = jnp.array(rng.integers(-127, 127, (l, k, n)).astype(np.int8))
    xs = jnp.array((rng.random((m, 1)) * 0.1 + 0.01).astype(np.float32))
    ws = jnp.array((rng.random((l, n)) * 0.05 + 0.01).astype(np.float32))

    wt = matmul.pretile_weight_bank(wq, bn)
    assert wt.shape == (l, n // bn, k, bn)
    np.testing.assert_array_equal(np.asarray(matmul.untile_weight_bank(wt)),
                                  np.asarray(wq))
    for li in range(l):
        ref = matmul.quant_matmul_int8_ref(xq, wq[li], xs, ws[li])
        plain = matmul.quant_matmul_int8_stacked(xq, wq, jnp.int32(li), xs, ws)
        tiled = matmul.quant_matmul_int8_stacked(xq, wt, jnp.int32(li), xs, ws)
        assert_close(np.asarray(plain, np.float32), np.asarray(ref, np.float32),
                     rtol=2e-2, atol=2e-2)
        assert_close(np.asarray(tiled, np.float32), np.asarray(ref, np.float32),
                     rtol=2e-2, atol=2e-2)

    # traced layer index under jit (the scan contract)
    f = jax.jit(lambda li: matmul.quant_matmul_int8_stacked(xq, wt, li, xs, ws))
    got = f(jnp.int32(1))
    want = matmul.quant_matmul_int8_ref(xq, wq[1], xs, ws[1])
    assert_close(np.asarray(got, np.float32), np.asarray(want, np.float32),
                 rtol=2e-2, atol=2e-2)


def test_stacked_tiled_small_m_fallback_slices_one_layer(rng):
    """m<8 falls off the Pallas tier; the 4-D-bank fallback must slice layer
    li BEFORE untiling (ADVICE r2: untiling the whole bank inside jit
    materializes a full [L, K, N] copy of every bank per step)."""
    import jax

    l, m, k, n, bn = 3, 4, 64, 128, 32  # m=4 < 8 -> ref fallback
    xq = jnp.array(rng.integers(-127, 127, (m, k)).astype(np.int8))
    wq = jnp.array(rng.integers(-127, 127, (l, k, n)).astype(np.int8))
    xs = jnp.array((rng.random((m, 1)) * 0.1 + 0.01).astype(np.float32))
    ws = jnp.array((rng.random((l, n)) * 0.05 + 0.01).astype(np.float32))
    wt = matmul.pretile_weight_bank(wq, bn)

    f = jax.jit(lambda li: matmul.quant_matmul_int8_stacked(xq, wt, li, xs, ws))
    for li in range(l):
        want = matmul.quant_matmul_int8_ref(xq, wq[li], xs, ws[li])
        assert_close(np.asarray(f(jnp.int32(li)), np.float32),
                     np.asarray(want, np.float32), rtol=2e-2, atol=2e-2)
    # the untile must not appear as a whole-bank [L, K, N] intermediate in
    # the jaxpr: only layer li's [K, N] panel may be materialized.
    txt = jax.jit(lambda li: matmul.quant_matmul_int8_stacked(
        xq, wt, li, xs, ws)).lower(jnp.int32(0)).as_text()
    assert f"tensor<{l}x{k}x{n}x" not in txt, \
        "whole-bank untile leaked into the jitted fallback"
