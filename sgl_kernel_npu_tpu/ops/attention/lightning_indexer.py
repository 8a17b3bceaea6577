"""Lightning indexer — DeepSeek-V3.2-style sparse top-k token selection.

Reference parity: csrc/lightning_indexer/ (README.md:10-38, kernel
op_kernel/lightning_indexer_kernel.cpp LIPreload :53-145, tiling
op_host/tiling/lightning_indexer_tiling.cpp). Score formula per query token:
  score_j = sum_g w_g * ReLU(q_g . k_j)       (g = GQA group heads)
returning the top-k context positions. Layouts: batched (BSND), varlen (TND)
and paged KV (PA_BSND with a block_table).

TPU design: one [G, D] x [D, S] matmul + ReLU + weighted head-sum per token —
MXU-friendly; top-k via jax.lax.top_k. The paged layout gathers KV pages with
the same head-major DMA pattern as decode attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def lightning_indexer_scores(q, k, weights):
    """q [B, Sq, G, D]; k [B, Sk, D] (single index head); weights [B, Sq, G].
    Returns scores [B, Sq, Sk]."""
    s = jnp.einsum("bqgd,bkd->bqgk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = jax.nn.relu(s)
    return jnp.einsum("bqgk,bqg->bqk", s, weights.astype(jnp.float32))


def lightning_indexer(q, k, weights, sparse_count: int = 2048,
                      actual_seq_lengths_key=None, causal: bool = True,
                      query_positions=None):
    """Batched (BSND) top-k index selection.

    q [B, Sq, G, D]; k [B, Sk, D]; weights [B, Sq, G].
    Returns (topk_idx [B, Sq, sparse_count] int32 (-1 padded), scores).
    """
    b, sq, g, d = q.shape
    sk = k.shape[1]
    scores = lightning_indexer_scores(q, k, weights)

    pos_k = jnp.arange(sk)[None, None, :]
    valid = jnp.ones((b, sq, sk), bool)
    if actual_seq_lengths_key is not None:
        valid &= pos_k < actual_seq_lengths_key[:, None, None]
    if causal:
        qpos = (query_positions if query_positions is not None
                else jnp.broadcast_to(jnp.arange(sq)[None], (b, sq)))
        valid &= pos_k <= qpos[:, :, None]
    scores = jnp.where(valid, scores, _NEG_INF)

    kk = min(sparse_count, sk)
    top_scores, top_idx = jax.lax.top_k(scores, kk)
    top_idx = jnp.where(top_scores > _NEG_INF / 2, top_idx, -1).astype(jnp.int32)
    return top_idx, scores


def lightning_indexer_paged(q, k_cache, weights, block_table, seq_lens,
                            sparse_count: int = 2048):
    """Paged decode-path variant (PA_BSND): q [B, G, D];
    k_cache [num_pages, page_size, D]; block_table [B, max_pages].
    Returns topk_idx [B, sparse_count] of token SLOT ids (page*ps+off, -1 pad)
    ready for topk_sparse_attention."""
    b, g, d = q.shape
    ps = k_cache.shape[1]
    max_pages = block_table.shape[1]
    k = k_cache[block_table].reshape(b, max_pages * ps, d)

    s = jnp.einsum("bgd,bkd->bgk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = jax.nn.relu(s)
    scores = jnp.einsum("bgk,bg->bk", s, weights.astype(jnp.float32))
    valid = jnp.arange(max_pages * ps)[None] < seq_lens[:, None]
    scores = jnp.where(valid, scores, _NEG_INF)

    kk = min(sparse_count, max_pages * ps)
    top_scores, top_pos = jax.lax.top_k(scores, kk)
    # map logical position -> physical slot id
    page_of = jnp.take_along_axis(
        block_table, jnp.clip(top_pos // ps, 0, max_pages - 1), axis=1)
    slot = page_of * ps + top_pos % ps
    return jnp.where(top_scores > _NEG_INF / 2, slot, -1).astype(jnp.int32)


def lightning_indexer_varlen(q, k, weights, actual_seq_lengths_query,
                             actual_seq_lengths_key, sparse_count: int = 2048,
                             causal: bool = True):
    """Varlen (TND) layout: flat packed sequences, prefix-sum boundaries.

    Ref contract (csrc/lightning_indexer/README.md:10-38, layout 'TND'):
    q [T, G, D] / weights [T, G] flat over all batches;
    k [Tk, D]; actual_seq_lengths_{query,key} are PREFIX SUMS per batch
    (element i = total tokens of batches 0..i), so batch i spans
    [cu[i-1], cu[i]).  Causal alignment is at the sequence END (query j of a
    batch with Sq queries / Sk keys sees keys with local pos <= j + Sk - Sq).

    Returns (topk_idx [T, sparse_count] int32 LOCAL key positions within the
    token's own batch, -1 padded; scores [T, Tk] flat masked scores).
    """
    t, g, d = q.shape
    tk = k.shape[0]
    cu_q = jnp.asarray(actual_seq_lengths_query, jnp.int32)
    cu_k = jnp.asarray(actual_seq_lengths_key, jnp.int32)

    seg_q = jnp.searchsorted(cu_q, jnp.arange(t), side="right")
    seg_k = jnp.searchsorted(cu_k, jnp.arange(tk), side="right")
    start_q = jnp.concatenate([jnp.zeros(1, jnp.int32), cu_q[:-1]])
    start_k = jnp.concatenate([jnp.zeros(1, jnp.int32), cu_k[:-1]])
    len_q = cu_q - start_q
    len_k = cu_k - start_k

    local_q = jnp.arange(t) - start_q[seg_q]
    local_k = jnp.arange(tk) - start_k[seg_k]

    s = jnp.einsum("tgd,kd->tgk", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    scores = jnp.einsum("tgk,tg->tk", jax.nn.relu(s),
                        weights.astype(jnp.float32))

    valid = seg_q[:, None] == seg_k[None, :]
    if causal:
        frontier = local_q + (len_k - len_q)[seg_q]   # end-aligned
        valid &= local_k[None, :] <= frontier[:, None]
    scores = jnp.where(valid, scores, _NEG_INF)

    kk = min(sparse_count, tk)
    top_scores, top_idx = jax.lax.top_k(scores, kk)
    top_local = jnp.take(local_k, top_idx)
    return (jnp.where(top_scores > _NEG_INF / 2, top_local, -1)
            .astype(jnp.int32), scores)
