"""LoRA kernels vs numpy ports of the reference goldens
(tests/python/sgl_kernel_npu/utils.py:12-148, test_lora_kernels.py)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import lora

from .utils import assert_close


def _ref_sgmv_shrink(x, weights, idx, seq_len, ranks, scales, num_slices=1):
    s = x.shape[0]
    out_dim = weights.shape[1]
    max_rank = out_dim // num_slices
    out = np.zeros((s, out_dim), np.float32)
    off = 0
    for li, sl in zip(idx, seq_len):
        r = ranks[li]
        if sl and r > 0:
            w = weights[li, : num_slices * r, :]
            out[off:off + sl, : num_slices * r] = scales[li] * (x[off:off + sl] @ w.T)
        off += sl
    return out


def _ref_sgmv_expand(x, weights, idx, seq_len, ranks, slice_offsets, base=None):
    s = x.shape[0]
    num_slices = len(slice_offsets) - 1
    max_rank = weights.shape[2]
    out = base.copy() if base is not None else np.zeros((s, slice_offsets[-1]), np.float32)
    off = 0
    for li, sl in zip(idx, seq_len):
        r = ranks[li]
        if sl and r > 0:
            for si in range(num_slices):
                # input is rank-packed: slice si starts at column si*r
                xs = x[off:off + sl, si * r: (si + 1) * r]
                w = weights[li, slice_offsets[si]:slice_offsets[si + 1], :r]
                out[off:off + sl, slice_offsets[si]:slice_offsets[si + 1]] += xs @ w.T
        off += sl
    return out


def test_bgmv_shrink_expand(rng):
    b, h, r, l, o = 12, 64, 16, 3, 48
    x = rng.standard_normal((b, h), dtype=np.float32)
    wa = rng.standard_normal((l, r, h), dtype=np.float32)
    wb = rng.standard_normal((l, o, r), dtype=np.float32)
    idx = rng.integers(0, l, b).astype(np.int32)
    y0 = rng.standard_normal((b, o + 8), dtype=np.float32)

    shr = lora.bgmv_shrink(jnp.array(x), jnp.array(wa), jnp.array(idx), 0.5)
    golden = np.stack([0.5 * (x[i] @ wa[idx[i]].T) for i in range(b)])
    assert_close(shr, golden, rtol=1e-3, atol=1e-3)

    exp = lora.bgmv_expand(jnp.array(golden), jnp.array(wb), jnp.array(idx),
                           jnp.array(y0), 8, o)
    g2 = y0.copy()
    for i in range(b):
        g2[i, 8:8 + o] += golden[i] @ wb[idx[i]].T
    assert_close(exp, g2, rtol=1e-3, atol=1e-3)


def test_sgmv_shrink_variable_ranks(rng):
    l, h, max_rank, ns = 4, 32, 8, 2
    seqs = [3, 0, 5, 2]
    idx = np.array([2, 1, 0, 3], np.int32)
    s = sum(seqs)
    x = rng.standard_normal((s, h), dtype=np.float32)
    w = rng.standard_normal((l, ns * max_rank, h), dtype=np.float32)
    ranks = np.array([8, 4, 2, 0], np.int32)
    scales = np.array([1.0, 0.5, 2.0, 1.0], np.float32)

    out = lora.sgmv_shrink(jnp.array(x), jnp.array(w), jnp.array(idx),
                           jnp.array(seqs, dtype=np.int32), jnp.array(ranks),
                           jnp.array(scales), ns)
    golden = _ref_sgmv_shrink(x, w, idx, seqs, ranks, scales, ns)
    assert_close(out, golden, rtol=1e-3, atol=1e-3)


def test_sgmv_expand_slices(rng):
    l, max_rank = 3, 8
    slice_offsets = (0, 16, 40)
    seqs = [4, 2, 3]
    idx = np.array([0, 2, 1], np.int32)
    s = sum(seqs)
    ns = len(slice_offsets) - 1
    x = rng.standard_normal((s, ns * max_rank), dtype=np.float32)
    w = rng.standard_normal((l, slice_offsets[-1], max_rank), dtype=np.float32)
    ranks = np.array([8, 3, 5], np.int32)
    base = rng.standard_normal((s, slice_offsets[-1]), dtype=np.float32)

    out = lora.sgmv_expand(jnp.array(x), jnp.array(w), jnp.array(idx),
                           jnp.array(seqs, dtype=np.int32), jnp.array(ranks),
                           slice_offsets, jnp.array(base))
    golden = _ref_sgmv_expand(x, w, idx, seqs, ranks, slice_offsets, base)
    assert_close(out, golden, rtol=1e-3, atol=1e-3)


def test_sgemmc_alias(rng):
    """sgemmv/sgemmc share the grouped implementation — spot-check equality."""
    l, h, max_rank = 2, 16, 4
    seqs = [2, 3]
    idx = np.array([1, 0], np.int32)
    x = rng.standard_normal((5, h), dtype=np.float32)
    w = rng.standard_normal((l, max_rank, h), dtype=np.float32)
    ranks = np.array([4, 4], np.int32)
    scales = np.ones(2, np.float32)
    a = lora.sgmv_shrink(jnp.array(x), jnp.array(w), jnp.array(idx),
                         jnp.array(seqs, dtype=np.int32), jnp.array(ranks), jnp.array(scales))
    b = lora.sgemmc_shrink(jnp.array(x), jnp.array(w), jnp.array(idx),
                           jnp.array(seqs, dtype=np.int32), jnp.array(ranks), jnp.array(scales))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
