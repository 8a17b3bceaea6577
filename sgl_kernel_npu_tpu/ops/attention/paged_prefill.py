"""Paged flash prefill: chunk attention straight off the page-major KV cache,
driven by per-query-tile page lists (compute-skipping block sparsity).

Reference parity:
  csrc/attentions/csrc/ops/block_sparse_attention/ (10.6k LoC) — attention
    restricted to estimator-selected KV blocks, skipping the rest.
  csrc/attentions/ `la` laser attention — flash prefill over the full prefix.
  The reference separates the two; on TPU ONE kernel covers both because the
  only difference is which pages each query tile walks:
    dense causal prefill : page_sel[qi, j] = j,  cnt = pages under the causal
                           frontier of tile qi (tail pages never touched)
    block-sparse         : page_sel = estimator-selected logical page ids
                           (ops.attention.sparse.sparse_block_estimate)

Design (same substrate as decode v3, decode_v3.py): the grid is
(Hkv, q_tiles); each program walks its page list with double-buffered manual
DMAs from the page-major cache `[P, Hkv, ps, D]`, so compute and HBM traffic
are proportional to the SELECTED pages — unlike the jnp reference
(sparse.block_sparse_attention) which materializes the full dense score
matrix. Online-softmax flash accumulation in fp32; causality enforced by
logical column position (page_sel entries are logical page numbers, so
col = page_sel*ps + lane), which also masks the overlap when the chunk itself
is already written to the cache (the model writes-then-attends, llama.py
prefill_chunk_step_kv).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, interpret_mode

_NEG_INF = -1e30
NBUF = 2


def _kernel(page_sel_ref, page_cnt_ref, block_table_ref, plen_ref,
            q_ref, k_hbm, v_hbm, out_ref,
            k_buf, v_buf, acc_ref, m_ref, l_ref,
            *, page_size, sm_scale, block_q, g, dk, dv, per_head_sel,
            int8=False, ks_hbm=None, vs_hbm=None, ks_buf=None, vs_buf=None):
    h = pl.program_id(0)
    qi = pl.program_id(1)
    if per_head_sel:
        cnt = page_cnt_ref[h, qi]
        sel = lambda j: page_sel_ref[h, qi, j]
    else:
        cnt = page_cnt_ref[qi]
        sel = lambda j: page_sel_ref[qi, j]
    prefix_len = plen_ref[0]
    ps = page_size

    def dma(buf, hbm, slot, j, sem):
        page = block_table_ref[sel(j)]
        return pltpu.make_async_copy(hbm.at[page, h], buf.at[slot], sem)

    def start(slot, j, sems):
        dma(k_buf, k_hbm, slot, j, sems.at[slot, 0]).start()
        dma(v_buf, v_hbm, slot, j, sems.at[slot, 1]).start()
        if int8:
            dma(ks_buf, ks_hbm, slot, j, sems.at[slot, 2]).start()
            dma(vs_buf, vs_hbm, slot, j, sems.at[slot, 3]).start()

    def wait(slot, j, sems):
        dma(k_buf, k_hbm, slot, j, sems.at[slot, 0]).wait()
        dma(v_buf, v_hbm, slot, j, sems.at[slot, 1]).wait()
        if int8:
            dma(ks_buf, ks_hbm, slot, j, sems.at[slot, 2]).wait()
            dma(vs_buf, vs_hbm, slot, j, sems.at[slot, 3]).wait()

    def body(j, _, sems):
        slot = jax.lax.rem(j, NBUF)
        nxt = jax.lax.rem(j + 1, NBUF)

        @pl.when(j + 1 < cnt)
        def _():
            start(nxt, j + 1, sems)

        wait(slot, j, sems)

        q = q_ref[0].astype(jnp.float32).reshape(block_q * g, dk)
        if int8:
            ks = ks_buf[slot].astype(jnp.float32)            # [1, ps]
            vs = vs_buf[slot].astype(jnp.float32)
            k = k_buf[slot].astype(jnp.float32) * ks.reshape(ps, 1)
            v = v_buf[slot].astype(jnp.float32) * vs.reshape(ps, 1)
        else:
            k = k_buf[slot].astype(jnp.float32)              # [ps, D]
            v = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale

        # causal by LOGICAL position: query token qi*bq + row//g sits at
        # absolute position prefix_len + that; column c of logical page lp is
        # absolute position lp*ps + c.
        lp = sel(j)
        tok = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q * g, ps), 0) // g
        col = lp * ps + jax.lax.broadcasted_iota(
            jnp.int32, (block_q * g, ps), 1)
        s = jnp.where(col <= prefix_len + tok, s, _NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, -1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[...] = m_cur
        return 0

    def run(sems):
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(cnt > 0)
        def _():
            start(0, 0, sems)

        jax.lax.fori_loop(0, cnt, lambda j, c: body(j, c, sems), 0)
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF, 4 if int8 else 2)))


def paged_prefill_attention(q, kv_cache, block_table, prefix_len, sm_scale,
                            page_size, page_sel=None, page_cnt=None,
                            block_q: int = 128):
    """Flash chunk-prefill over the page-major paged cache.

    q [T, Hq, D] — the current chunk's queries (chunk already written to the
    cache at positions prefix_len..prefix_len+T-1). kv_cache: (k, v) bf16
    tuple, caches [P, Hkv, ps, D]; or int8 dict {"k","v","ks","vs"} with
    scales [P, Hkv, 1, ps]. block_table [max_pages] int32 (logical->physical).
    prefix_len: scalar int32 — tokens already cached before this chunk.

    page_sel/page_cnt: optional block-sparse drive. page_sel [NQ, S] (or
    [Hkv, NQ, S] per-head) holds LOGICAL page numbers each q tile visits;
    page_cnt [NQ] (or [Hkv, NQ]) how many entries are live. When omitted, the
    dense causal schedule is used: tile qi visits pages
    0..ceil((prefix_len + (qi+1)*block_q)/ps)-1 — tail pages are never
    DMA'd or computed. NQ must equal ceil(T/block_q).

    Returns [T, Hq, Dv].
    """
    int8 = isinstance(kv_cache, dict)
    k_cache = kv_cache["k"] if int8 else kv_cache[0]
    v_cache = kv_cache["v"] if int8 else kv_cache[1]
    t, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[0]

    block_q = min(block_q, t)
    nq = cdiv(t, block_q)
    tpad = nq * block_q
    if tpad != t:
        q = jnp.pad(q, ((0, tpad - t), (0, 0), (0, 0)))
    # [T, Hkv, g, D] -> [Hkv, NQ*bq, g, D]
    q4 = q.reshape(tpad, hkv, g, dk).transpose(1, 0, 2, 3)

    prefix_len = jnp.asarray(prefix_len, jnp.int32).reshape(1)
    if page_sel is None:
        # dense causal: tile qi needs pages up to its causal frontier
        tiles = jnp.arange(nq, dtype=jnp.int32)
        need = prefix_len[0] + jnp.minimum((tiles + 1) * block_q, t)
        page_cnt = jnp.minimum(-(-need // ps), max_pages).astype(jnp.int32)
        page_sel = jnp.broadcast_to(
            jnp.arange(max_pages, dtype=jnp.int32)[None], (nq, max_pages))
    per_head_sel = page_sel.ndim == 3
    page_sel = jnp.asarray(page_sel, jnp.int32)
    page_cnt = jnp.asarray(page_cnt, jnp.int32)

    scratch = [
        pltpu.VMEM((NBUF, ps, dk), k_cache.dtype),
        pltpu.VMEM((NBUF, ps, dv), v_cache.dtype),
        pltpu.VMEM((block_q * g, dv), jnp.float32),
        pltpu.VMEM((block_q * g, 1), jnp.float32),
        pltpu.VMEM((block_q * g, 1), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec((1, block_q, g, dk),
                     lambda h, i, *_: (h, i, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [q4, k_cache, v_cache]
    if int8:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        operands += [kv_cache["ks"], kv_cache["vs"]]
        scratch[2:2] = [pltpu.VMEM((NBUF, 1, ps), kv_cache["ks"].dtype),
                        pltpu.VMEM((NBUF, 1, ps), kv_cache["vs"].dtype)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hkv, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q * g, dv),
                               lambda h, i, *_: (h * nq + i, 0, 0)),
        scratch_shapes=scratch,
    )

    def kern(page_sel_ref, page_cnt_ref, bt_ref, plen_ref, *args):
        if int8:
            (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
             k_buf, v_buf, ks_buf, vs_buf, acc, m, l) = args
            kwargs = dict(int8=True, ks_hbm=ks_hbm, vs_hbm=vs_hbm,
                          ks_buf=ks_buf, vs_buf=vs_buf)
        else:
            (q_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf, acc, m, l) = args
            kwargs = {}
        _kernel(page_sel_ref, page_cnt_ref, bt_ref, plen_ref,
                q_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf, acc, m, l,
                page_size=page_size, sm_scale=sm_scale, block_q=block_q,
                g=g, dk=dk, dv=dv, per_head_sel=per_head_sel, **kwargs)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hkv * nq, block_q * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(page_sel, page_cnt, block_table.astype(jnp.int32), prefix_len, *operands)

    # [Hkv*NQ, bq*g, Dv] -> [T, Hq, Dv]
    out = out.reshape(hkv, nq, block_q, g, dv).transpose(1, 2, 0, 3, 4)
    return out.reshape(tpad, hkv * g, dv)[:t]


def block_mask_to_page_lists(block_mask, max_sel: int):
    """Convert an estimator block mask into kernel page lists.

    block_mask [NQ, NK] (head-uniform) or [H, NQ, NK] bool — True = q tile
    attends kv block. Returns (page_sel [.., NQ, max_sel] int32 logical page
    ids, page_cnt [.., NQ] int32). Selected ids are packed to the front in
    ascending order; entries past page_cnt are clamped to a live id (their
    DMA collapses to a revisit, compute is predicated off).
    """
    nk = block_mask.shape[-1]
    ids = jnp.broadcast_to(jnp.arange(nk, dtype=jnp.int32), block_mask.shape)
    # sort: selected (key 0) first, order preserved by stable sort on id
    key = jnp.where(block_mask, ids, nk + ids)
    order = jnp.sort(key, axis=-1)[..., :max_sel]
    page_cnt = jnp.minimum(jnp.sum(block_mask, axis=-1), max_sel).astype(jnp.int32)
    page_sel = jnp.where(order < nk, order, 0).astype(jnp.int32)
    return page_sel, page_cnt


def block_sparse_paged_attention(q, kv_cache, block_table, block_mask,
                                 prefix_len, sm_scale, page_size,
                                 max_sel: int = 0):
    """Block-sparse attention that SKIPS non-selected pages (reference
    block_sparse_attention semantics, compute-proportional-to-mask).

    q [T, Hq, D]; block_mask [NQ, NK] or [Hkv, NQ, NK] bool with
    NQ = ceil(T/page_size) query tiles and NK = logical kv pages; kernel
    block_q is locked to page_size so mask granularity == page granularity.
    """
    nk = block_mask.shape[-1]
    max_sel = max_sel or nk
    page_sel, page_cnt = block_mask_to_page_lists(block_mask, max_sel)
    return paged_prefill_attention(
        q, kv_cache, block_table, prefix_len, sm_scale, page_size,
        page_sel=page_sel, page_cnt=page_cnt, block_q=page_size)
