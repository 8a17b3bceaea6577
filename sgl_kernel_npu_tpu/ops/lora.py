"""Multi-LoRA serving matmuls: BGMV / SGMV / SGEMMV / SGEMMC families.

Reference parity: csrc/lora/ — 8 ops declared at include/sgl_kenel_npu_ops.h:79-117
  bgmv_{shrink,expand}    per-TOKEN adapter index (decode batches)
  sgmv_{shrink,expand}    per-SEQUENCE adapter index + seq_len (prefill)
  sgemmv_{shrink,expand}  variable rank per adapter + explicit slice offsets
  sgemmc_{shrink,expand}  multi-slice cube (MXU) variant with slice_count
Golden semantics from tests/python/sgl_kernel_npu/utils.py:12-148
(reference_sgmv_shrink / reference_sgmv_expand).

TPU design: every variant reduces to ONE pattern — tokens sorted by adapter id
feeding a grouped matmul (`jax.lax.ragged_dot` on the MXU), then unsorted.
Variable ranks are column masks on the padded max_rank; scales are per-group
row multipliers. This replaces the reference's 3.2k LoC of per-variant AscendC
tiling with a single routing helper, and the sort is exactly the
InitRouting-style compaction the MoE path already uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grouped_matmul_by_index(x, weights_t, token_ids, num_loras):
    """y[i] = x[i] @ weights_t[token_ids[i]] via sort + ragged_dot + unsort.

    x [S, K]; weights_t [L, K, N]; token_ids [S] in [0, L) or -1 (skip -> 0).
    """
    s = x.shape[0]
    valid = token_ids >= 0
    key = jnp.where(valid, token_ids, num_loras)
    order = jnp.argsort(key, stable=True)
    inv = jnp.argsort(order, stable=True)
    xs = x[order]
    sizes = jnp.sum(jax.nn.one_hot(key, num_loras + 1, dtype=jnp.int32), axis=0)[:num_loras]
    y = jax.lax.ragged_dot(
        xs.astype(jnp.float32), weights_t.astype(jnp.float32), sizes,
        preferred_element_type=jnp.float32,
    )
    y = jnp.where((key[order] < num_loras)[:, None], y, 0.0)
    return y[inv]


def _expand_seq_ids(lora_indices, seq_len, total_tokens):
    """Per-sequence adapter ids -> per-token ids ([total] static)."""
    cum = jnp.cumsum(seq_len.astype(jnp.int32))
    j = jnp.arange(total_tokens, dtype=jnp.int32)
    seq = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    seq_c = jnp.clip(seq, 0, seq_len.shape[0] - 1)
    ids = lora_indices[seq_c].astype(jnp.int32)
    return jnp.where(j < cum[-1], ids, -1)


# ------------------------------------------------------------------------ BGMV


def bgmv_shrink(x, weights, indices, scale: float = 1.0):
    """x [B, H] @ A^T per token: weights [L, R, H], indices [B] -> [B, R] * scale.
    Ref: include/sgl_kenel_npu_ops.h:82-83."""
    l = weights.shape[0]
    y = _grouped_matmul_by_index(x, jnp.swapaxes(weights, 1, 2), indices, l)
    return (y * scale).astype(x.dtype)


def bgmv_expand(x, weights, indices, y, slice_offset: int, slice_size: int):
    """y[:, off:off+size] += x @ B^T per token: weights [L, O, R], x [B, R].
    Ref: include/sgl_kenel_npu_ops.h:79-80. Returns updated y."""
    l, o, r = weights.shape
    assert o == slice_size, "weight output dim must equal the slice it fills"
    out = _grouped_matmul_by_index(
        x[:, :r], jnp.swapaxes(weights, 1, 2), indices, l,
    )
    return y.at[:, slice_offset:slice_offset + slice_size].add(out.astype(y.dtype))


# ------------------------------------------------------------------------ SGMV


def sgmv_shrink(x, weights, lora_indices, seq_len, lora_ranks, lora_scales,
                num_slices: int = 1):
    """Sequence-grouped shrink (golden: utils.py reference_sgmv_shrink).

    x [S, H]; weights [L, num_slices*maxR, H]; per-seq lora_indices + seq_len;
    lora_ranks/lora_scales [L]. Returns [S, num_slices*maxR]."""
    l, out_dim, h = weights.shape
    max_rank = out_dim // num_slices
    ids = _expand_seq_ids(lora_indices, seq_len, x.shape[0])
    y = _grouped_matmul_by_index(x, jnp.swapaxes(weights, 1, 2), ids, l)

    ranks = jnp.where(ids >= 0, lora_ranks[jnp.clip(ids, 0, l - 1)], 0)
    scales = jnp.where(ids >= 0, lora_scales[jnp.clip(ids, 0, l - 1)], 0.0)
    # Reference output layout packs the slices by ACTUAL rank: column c holds
    # x . weights[id, c] for c < num_slices*rank (utils.py:57-63).
    col = jnp.arange(out_dim)
    mask = col[None, :] < (num_slices * ranks)[:, None]
    return (y * scales[:, None] * mask).astype(x.dtype)


def sgmv_expand(x, weights, lora_indices, seq_len, lora_ranks, slice_offsets,
                base_output=None):
    """Sequence-grouped expand with multi-slice scatter
    (golden: utils.py reference_sgmv_expand).

    x [S, num_slices*maxR]; weights [L, O, maxR]; slice_offsets: python tuple
    of num_slices+1 static output boundaries. Returns [S, slice_offsets[-1]]."""
    l, o, max_rank = weights.shape
    slice_offsets = tuple(int(v) for v in slice_offsets)
    num_slices = len(slice_offsets) - 1
    s = x.shape[0]
    ids = _expand_seq_ids(lora_indices, seq_len, s)
    ranks = jnp.where(ids >= 0, lora_ranks[jnp.clip(ids, 0, l - 1)], 0)

    out = (base_output.astype(jnp.float32) if base_output is not None
           else jnp.zeros((s, slice_offsets[-1]), jnp.float32))
    wt = jnp.swapaxes(weights, 1, 2)  # [L, maxR, O]
    rank_mask = jnp.arange(max_rank)[None, :] < ranks[:, None]
    for si in range(num_slices):
        lo, hi = slice_offsets[si], slice_offsets[si + 1]
        # Input is rank-packed (slice si starts at column si*rank, see
        # utils.py:124-139): gather each token's slice into maxR-padded form.
        cols = si * ranks[:, None] + jnp.arange(max_rank)[None, :]
        x_slice = jnp.take_along_axis(x, jnp.clip(cols, 0, x.shape[1] - 1), axis=1)
        x_slice = jnp.where(rank_mask, x_slice, 0)
        y = _grouped_matmul_by_index(x_slice, wt[:, :, lo:hi], ids, l)
        out = out.at[:, lo:hi].add(y)
    dtype = base_output.dtype if base_output is not None else x.dtype
    return out.astype(dtype)


# -------------------------------------------------- SGEMMV / SGEMMC (aliases)
# The reference splits these by kernel engine (vector vs cube) and
# rank-variability; the grouped-MXU implementation above already covers
# variable ranks and multi-slice, so they share one implementation.


def sgemmv_shrink(x, weights, lora_indices, seq_len, lora_ranks, lora_scales,
                  num_slices: int = 1):
    """Variable-rank shrink (ref: include/sgl_kenel_npu_ops.h:98-100)."""
    return sgmv_shrink(x, weights, lora_indices, seq_len, lora_ranks,
                       lora_scales, num_slices)


def sgemmv_expand(x, weights, lora_indices, seq_len, lora_ranks, slice_offsets,
                  base_output=None):
    """Variable-rank expand with slice offsets (ref: ops.h:93-96)."""
    return sgmv_expand(x, weights, lora_indices, seq_len, lora_ranks,
                       slice_offsets, base_output)


def sgemmc_shrink(x, weights, lora_indices, seq_len, lora_ranks, lora_scales,
                  slice_count: int = 1):
    """Multi-slice cube shrink (ref: ops.h:112-115)."""
    return sgmv_shrink(x, weights, lora_indices, seq_len, lora_ranks,
                       lora_scales, slice_count)


def sgemmc_expand(x, weights, lora_indices, seq_len, lora_ranks, slice_offsets,
                  base_output=None):
    """Multi-slice cube expand (ref: ops.h:108-110)."""
    return sgmv_expand(x, weights, lora_indices, seq_len, lora_ranks,
                       slice_offsets, base_output)
