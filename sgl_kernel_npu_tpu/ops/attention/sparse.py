"""Sparse attention family: block-sparse attention, sparse-block estimation,
top-k ("rainfusion"-style) sparse attention with paged KV.

Reference parity: csrc/attentions/
  block_sparse_attention/ (10.6k LoC)  -> block_sparse_attention
  sparse_block_estimate/ (plugin/sparse_block_estimate.cpp:72-83 allocates
    mask + count outputs)               -> sparse_block_estimate
  rainfusionattention (topk-select sparse attn with paged block_table,
    plugin/register_ops.cpp:29-34)      -> topk_sparse_attention

TPU design: block masks are [Tq_blocks, Tk_blocks] boolean tensors; the
estimator pools q/k into block means and scores them (one small matmul).
This module's `block_sparse_attention` is the dense-tensor REFERENCE tier
(mask multiplied into the logits — XLA skips nothing); the compute-skipping
production tier is `paged_prefill.block_sparse_paged_attention`, a Pallas
kernel whose DMA + FLOPs are proportional to the SELECTED blocks (feed it
this module's estimator mask via `block_mask_to_page_lists`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def sparse_block_estimate(q, k, block_size: int, keep_ratio: float = 0.25,
                          causal: bool = True, always_keep_first: bool = True,
                          always_keep_last: bool = True):
    """Estimate which KV blocks each query block attends to.

    q [B, H, Tq, D]; k [B, H, Tk, D]. Returns (mask [B, H, NQ, NK] bool,
    count [B, H, NQ] int32) — parity with the reference's mask+count outputs.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    nq, nk = -(-tq // block_size), -(-tk // block_size)

    def block_mean(x, n):
        pad = n * block_size - x.shape[2]
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, pad), (0, 0)))
        return xp.reshape(b, h, n, block_size, d).mean(axis=3)

    qb = block_mean(q, nq)
    kb = block_mean(k, nk)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qb, kb)

    if causal:
        cmask = (jnp.arange(nq)[:, None] >= jnp.arange(nk)[None, :])
        scores = jnp.where(cmask[None, None], scores, _NEG_INF)

    keep = max(1, int(nk * keep_ratio))
    thresh = jnp.sort(scores, axis=-1)[..., -keep][..., None]
    mask = scores >= thresh
    if causal:
        mask = mask & cmask[None, None]
    if always_keep_first:
        mask = mask.at[..., 0].set(True)
    if always_keep_last and causal:
        diag = jnp.minimum(jnp.arange(nq), nk - 1)
        mask = mask.at[..., jnp.arange(nq), diag].set(True)
    count = jnp.sum(mask.astype(jnp.int32), axis=-1)
    return mask, count


def block_sparse_attention(q, k, v, block_mask, sm_scale, block_size: int,
                           causal: bool = True):
    """Attention restricted to selected blocks.

    q [B, H, Tq, D]; k, v [B, H, Tk, D]; block_mask [B, H, NQ, NK] bool.
    Returns [B, H, Tq, Dv].
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    tok_mask = jnp.repeat(jnp.repeat(block_mask, block_size, axis=2),
                          block_size, axis=3)[:, :, :tq, :tk]
    if causal:
        tok_mask = tok_mask & jnp.tril(jnp.ones((tq, tk), bool))[None, None]
    s = jnp.where(tok_mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(tok_mask, -1, keepdims=True), p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def topk_sparse_attention(q, k_cache, v_cache, topk_indices, seq_lens,
                          sm_scale, page_size: int):
    """Decode attention over a top-k-selected set of KV tokens (rainfusion /
    DeepSeek-V3.2 sparse path): instead of a block_table walk over the whole
    sequence, `topk_indices` [B, K] holds the selected token SLOT ids
    (page*page_size + offset; -1 = unused).

    q [B, H, D]; caches [num_pages, page_size, D_kv] (MLA single-head layout)
    or head-major GQA caches via the wrapper below. Returns [B, H, Dv].
    """
    b, h, d = q.shape
    ps = page_size
    kk = topk_indices.shape[1]
    valid = topk_indices >= 0
    slots = jnp.where(valid, topk_indices, 0)
    page, off = slots // ps, slots % ps

    k = k_cache[page, off]                        # [B, K, Dk]
    v = v_cache[page, off]
    s = jnp.einsum("bhd,bkd->bhk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    s = jnp.where(valid[:, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhk,bkd->bhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)
