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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, interpret_mode, use_pallas

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


# ---------------------------------------------------------- Pallas kernels

BLK = 8   # micro-block tokens (the Mosaic DMA sublane-alignment quantum)


def _topk_blk_kernel(idx_ref, q_ref, k_hbm, v_hbm, mask_hbm, out_ref,
                     kbuf, vbuf, mbuf, acc_ref, m_ref, l_ref, sems, msem,
                     *, page_size, sm_scale, chunk, nc, nbuf, batch):
    """Chunked BLOCK-sparse gather attention mega-stream.

    The reference's rainfusion is block-table-based top-k sparse attention
    (plugin/register_ops.cpp:29-34) — selection at block granularity. That
    is also what the hardware wants: Mosaic rejects 1-row HBM slices at
    unprovable offsets (chip bisect 2026-08-20), while an 8-token
    micro-block is one aligned [8, D] DMA with zero over-fetch.

    v9-style mega-stream: grid (1,), internal fori over batch * nc bodies
    (every chip-proven manual-DMA kernel in this repo uses this shape);
    q/out ride full constant blocks, the per-chunk validity mask is staged
    from HBM alongside the KV blocks. Body (b, c): `chunk` selected
    micro-blocks (8 tokens each) land in VMEM slot s%nbuf, one
    [H, chunk*8] MXU dot, online softmax, emit at the last chunk."""
    ps = page_size
    total = batch * nc
    h = q_ref.shape[1]
    dv = v_hbm.shape[-1]

    def dma_chunk(slot2, s2, start):
        b2 = s2 // nc
        c2 = s2 - b2 * nc
        mcp = pltpu.make_async_copy(
            mask_hbm.at[b2, c2], mbuf.at[slot2], msem.at[slot2])
        if start:
            mcp.start()
        else:
            mcp.wait()

        def blk(j, _):
            bid = jnp.maximum(idx_ref[b2, c2 * chunk + j], 0)
            tok0 = bid * BLK
            page = tok0 // ps
            # (x // BLK) * BLK: provable alignment for Mosaic (no-op: block
            # starts are BLK-aligned by construction)
            roff = ((tok0 - page * ps) // BLK) * BLK
            kcp = pltpu.make_async_copy(
                k_hbm.at[page, pl.ds(roff, BLK), :],
                kbuf.at[slot2, pl.ds(j * BLK, BLK), :], sems.at[slot2, 0])
            vcp = pltpu.make_async_copy(
                v_hbm.at[page, pl.ds(roff, BLK), :],
                vbuf.at[slot2, pl.ds(j * BLK, BLK), :], sems.at[slot2, 1])
            if start:
                kcp.start()
                vcp.start()
            else:
                kcp.wait()
                vcp.wait()
            return _

        jax.lax.fori_loop(0, chunk, blk, 0)

    for s0 in range(min(nbuf, total)):
        dma_chunk(jnp.int32(s0 % nbuf), jnp.int32(s0), True)

    def body(s, _):
        bb = s // nc
        c = s - bb * nc
        slot = jax.lax.rem(s, nbuf)

        @pl.when(c == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        dma_chunk(slot, s, False)   # wait for my chunk

        q2 = q_ref[pl.ds(bb, 1)].reshape(h, q_ref.shape[2]).astype(
            jnp.float32)
        k2 = kbuf[slot].astype(jnp.float32)                # [rows, D]
        v2 = vbuf[slot].astype(jnp.float32)
        sc = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # int32 compare: the v5e VPU has no int8 vector cmpi ("Target does
        # not support this comparison", chip repro 2026-08-21) — widen first
        valid = mbuf[slot][0:1, :].astype(jnp.int32) > 0   # [1, rows]
        sc = jnp.where(valid, sc * sm_scale, _NEG_INF)

        m_new = jnp.maximum(m_ref[...], jnp.max(sc, -1, keepdims=True))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m_ref[...] - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, -1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

        @pl.when(c == nc - 1)
        def _emit():
            denom = jnp.maximum(l_ref[...], 1e-20)
            out_ref[pl.ds(bb, 1)] = (acc_ref[...] / denom).astype(
                out_ref.dtype)[None]

        # refill this slot only AFTER its rows were consumed above
        @pl.when(s + nbuf < total)
        def _prefetch():
            dma_chunk(slot, s + nbuf, True)
        return _

    jax.lax.fori_loop(0, total, body, 0)


def topk_block_sparse_attention_pallas(q, k_cache, v_cache, block_ids,
                                       sm_scale, page_size: int,
                                       chunk: int = 64, nbuf: int = 2):
    """Pallas block-granular top-k decode attention (rainfusion analogue).

    block_ids [B, KB] int32: selected BLK(=8)-token micro-block ids
    (token_slot // 8 in the paged cache; -1 = unused). Every token of each
    selected block is attended. Per-block DMAs are aligned [BLK, D] copies,
    pipelined whole chunks ahead; scoring is one MXU dot per chunk."""
    from functools import partial as _partial

    b, h, d = q.shape
    kb = block_ids.shape[1]
    dv = v_cache.shape[-1]
    ps = page_size
    assert ps % BLK == 0
    chunk = min(chunk, kb)
    nc = cdiv(kb, chunk)
    pad = nc * chunk - kb
    idx = jnp.pad(block_ids.astype(jnp.int32), ((0, 0), (0, pad)),
                  constant_values=-1)
    # per-token validity, expanded in XLA; staged per chunk from HBM as an
    # (8, rows)-tiled int8 block (no vectors from SMEM)
    maskexp = jnp.repeat((idx >= 0).astype(jnp.int8), BLK, axis=1)
    mask4 = jnp.broadcast_to(
        maskexp.reshape(b, nc, 1, chunk * BLK),
        (b, nc, 8, chunk * BLK))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, h, d), lambda i, idx: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((b, h, dv), lambda i, idx: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, chunk * BLK, d), k_cache.dtype),
            pltpu.VMEM((nbuf, chunk * BLK, dv), v_cache.dtype),
            pltpu.VMEM((nbuf, 8, chunk * BLK), jnp.int8),
            pltpu.VMEM((h, dv), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        _partial(_topk_blk_kernel, page_size=page_size, sm_scale=sm_scale,
                 chunk=chunk, nc=nc, nbuf=nbuf, batch=b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(idx, q, k_cache, v_cache, mask4)


def topk_sparse_attention_dispatch(q, k_cache, v_cache, topk_indices,
                                   seq_lens, sm_scale, page_size: int):
    """Token-granular API: the XLA gather reference serves arbitrary token
    ids (Mosaic cannot DMA 1-row slices at unprovable offsets — chip bisect
    2026-08-20); block-granular callers (the rainfusion pattern) use
    topk_block_sparse_attention_pallas for the kernel tier."""
    return topk_sparse_attention(q, k_cache, v_cache, topk_indices, seq_lens,
                                 sm_scale, page_size)


def _estimate_kernel(q_ref, k_ref, out_ref, *, block_size, nq, nk, causal):
    """Fused block-pool + score GEMM: scores[i, j] = mean(q block i) .
    mean(k block j) without materializing the pooled tensors in HBM."""
    tq = q_ref.shape[1]
    tk = k_ref.shape[1]
    d = q_ref.shape[2]
    inv = 1.0 / (block_size * block_size)

    q = q_ref[0].astype(jnp.float32)                       # [Tq, D]
    k = k_ref[0].astype(jnp.float32)
    qs = jnp.sum(q.reshape(nq, block_size, d), axis=1)     # [NQ, D]
    ks = jnp.sum(k.reshape(nk, block_size, d), axis=1)
    sc = jax.lax.dot_general(qs, ks, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * inv
    if causal:
        cm = (jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
              >= jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1))
        sc = jnp.where(cm, sc, _NEG_INF)
    out_ref[0] = sc


def sparse_block_estimate_pallas(q, k, block_size: int,
                                 keep_ratio: float = 0.25,
                                 causal: bool = True,
                                 always_keep_first: bool = True,
                                 always_keep_last: bool = True):
    """Pallas tier of sparse_block_estimate (ref: sparse_block_estimate
    plugin, csrc/attentions/csrc/plugin/sparse_block_estimate.cpp:72-83):
    one fused pool+GEMM launch per (batch, head) computes the block-score
    matrix; the top-k thresholding (a tiny [NQ, NK] sort) stays in XLA —
    Mosaic has no lane sort, and the matrix is KBs."""
    from functools import partial as _partial

    b, h, tq, d = q.shape
    tk = k.shape[2]
    nq, nk = -(-tq // block_size), -(-tk // block_size)
    padq, padk = nq * block_size - tq, nk * block_size - tk
    q4 = jnp.pad(q, ((0, 0), (0, 0), (0, padq), (0, 0))).reshape(
        b * h, nq * block_size, d)
    k4 = jnp.pad(k, ((0, 0), (0, 0), (0, padk), (0, 0))).reshape(
        b * h, nk * block_size, d)

    scores = pl.pallas_call(
        _partial(_estimate_kernel, block_size=block_size, nq=nq, nk=nk,
                 causal=causal),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, nq * block_size, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk * block_size, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nq, nk), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, nk), jnp.float32),
        interpret=interpret_mode(),
    )(q4, k4).reshape(b, h, nq, nk)

    keep = max(1, int(nk * keep_ratio))
    thresh = jnp.sort(scores, axis=-1)[..., -keep][..., None]
    mask = scores >= thresh
    if causal:
        cmask = (jnp.arange(nq)[:, None] >= jnp.arange(nk)[None, :])
        mask = mask & cmask[None, None]
    if always_keep_first:
        mask = mask.at[..., 0].set(True)
    if always_keep_last and causal:
        diag = jnp.minimum(jnp.arange(nq), nk - 1)
        mask = mask.at[..., jnp.arange(nq), diag].set(True)
    count = jnp.sum(mask.astype(jnp.int32), axis=-1)
    return mask, count


def sparse_block_estimate_dispatch(q, k, block_size: int, **kw):
    """use_pallas()-gated wrapper for sparse_block_estimate."""
    if use_pallas() and q.shape[-1] % 128 == 0 \
            and q.shape[2] % block_size == 0 and k.shape[2] % block_size == 0:
        return sparse_block_estimate_pallas(q, k, block_size, **kw)
    return sparse_block_estimate(q, k, block_size, **kw)
