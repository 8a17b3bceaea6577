"""Flash-decode v3: page-major KV layout, one DMA per page covering ALL KV
heads.

v2 moves one (head, page) tile (32 KB at ps=128, D=128) per DMA and measures
~140 GB/s — latency-bound. v3 stores the cache page-major,
    k_cache [num_pages, Hkv, page_size, D]
so a single contiguous DMA fetches a page for every head (Hkv x 32 KB = 256 KB
at Hkv=8), amortizing descriptor latency 8x; heads then compute back-to-back
from VMEM. Trailing dims stay (page_size, D) = clean (8k, 128) tiles.

Grid is (batch,): one program owns a sequence; the page loop double-buffers
page p+1's DMA against page p's Hkv head-computations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode

_NEG_INF = -1e30
NBUF = 2


def _kernel(seq_lens_ref, block_table_ref, q_ref, k_hbm, v_hbm, out_ref,
            k_buf, v_buf, acc_ref, m_ref, l_ref, *, page_size, sm_scale, hkv, g):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)

    def dma(buf, hbm, slot, page_idx, sem_slot):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[page], buf.at[slot], sem_slot)

    def body(p, _, k_sems, v_sems):
        slot = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            dma(k_buf, k_hbm, nxt, p + 1, k_sems.at[nxt]).start()
            dma(v_buf, v_hbm, nxt, p + 1, v_sems.at[nxt]).start()

        dma(k_buf, k_hbm, slot, p, k_sems.at[slot]).wait()
        dma(v_buf, v_hbm, slot, p, v_sems.at[slot]).wait()

        col = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        valid = col < seq_len

        for h in range(hkv):                     # static loop over KV heads
            q = q_ref[0, h].astype(jnp.float32)              # [G, D]
            k = k_buf[slot, h].astype(jnp.float32)           # [ps, D]
            v = v_buf[slot, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(valid, s, _NEG_INF)

            mh_prev = m_ref[h * g:(h + 1) * g, :]
            mh = jnp.maximum(mh_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(s - mh)
            l_ref[h * g:(h + 1) * g, :] = (
                l_ref[h * g:(h + 1) * g, :] * alpha
                + jnp.sum(pexp, -1, keepdims=True))
            acc_ref[h * g:(h + 1) * g, :] = (
                acc_ref[h * g:(h + 1) * g, :] * alpha
                + jax.lax.dot_general(pexp, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
            m_ref[h * g:(h + 1) * g, :] = mh
        return 0

    def run(k_sems, v_sems):
        dma(k_buf, k_hbm, 0, 0, k_sems.at[0]).start()
        dma(v_buf, v_hbm, 0, 0, v_sems.at[0]).start()
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages,
                          lambda p, c: body(p, c, k_sems, v_sems), 0)
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF,)),
                  pltpu.SemaphoreType.DMA((NBUF,)))


def decode_gqa_pallas_v3(q, k_cache, v_cache, seq_lens, block_table, sm_scale,
                         page_size):
    """q [B, Hq, D]; caches PAGE-MAJOR [num_pages, Hkv, page_size, D]."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, sl, bt: (bb, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, dv), lambda bb, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, page_size, dv), v_cache.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, page_size=page_size, sm_scale=sm_scale, hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      q4, k_cache, v_cache)
    return out.reshape(b, hq, dv)


def reshape_and_cache_gqa_page_major(k, v, k_cache, v_cache, slot_mapping):
    """Scatter for the page-major layout: k, v [T, Hkv, D];
    caches [num_pages, Hkv, page_size, D]."""
    num_pages, hkv, ps, d = k_cache.shape
    page = jnp.where(slot_mapping >= 0, slot_mapping // ps, num_pages)
    off = jnp.where(slot_mapping >= 0, slot_mapping % ps, 0)
    k_cache = k_cache.at[page, :, off].set(k.astype(k_cache.dtype), mode="drop")
    v_cache = v_cache.at[page, :, off].set(v.astype(v_cache.dtype), mode="drop")
    return k_cache, v_cache


def _kernel_int8(seq_lens_ref, block_table_ref, q_ref, k_hbm, v_hbm,
                 ks_hbm, vs_hbm, out_ref,
                 k_buf, v_buf, ks_buf, vs_buf, acc_ref, m_ref, l_ref,
                 *, page_size, sm_scale, hkv, g):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)

    def dma(buf, hbm, slot, page_idx, sem_slot):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[page], buf.at[slot], sem_slot)

    def start_all(slot, p, sems):
        dma(k_buf, k_hbm, slot, p, sems.at[slot, 0]).start()
        dma(v_buf, v_hbm, slot, p, sems.at[slot, 1]).start()
        dma(ks_buf, ks_hbm, slot, p, sems.at[slot, 2]).start()
        dma(vs_buf, vs_hbm, slot, p, sems.at[slot, 3]).start()

    def wait_all(slot, p, sems):
        dma(k_buf, k_hbm, slot, p, sems.at[slot, 0]).wait()
        dma(v_buf, v_hbm, slot, p, sems.at[slot, 1]).wait()
        dma(ks_buf, ks_hbm, slot, p, sems.at[slot, 2]).wait()
        dma(vs_buf, vs_hbm, slot, p, sems.at[slot, 3]).wait()

    def body(p, _, sems):
        slot = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            start_all(nxt, p + 1, sems)

        wait_all(slot, p, sems)
        col = p * page_size + jax.lax.broadcasted_iota(jnp.int32, (g, page_size), 1)
        valid = col < seq_len

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)
            ks = ks_buf[slot, h].astype(jnp.float32)          # [1, ps]
            vs = vs_buf[slot, h].astype(jnp.float32)
            k = k_buf[slot, h].astype(jnp.float32) * ks.reshape(page_size, 1)
            v = v_buf[slot, h].astype(jnp.float32) * vs.reshape(page_size, 1)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(valid, s, _NEG_INF)
            mh_prev = m_ref[h * g:(h + 1) * g, :]
            mh = jnp.maximum(mh_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(s - mh)
            l_ref[h * g:(h + 1) * g, :] = (
                l_ref[h * g:(h + 1) * g, :] * alpha
                + jnp.sum(pexp, -1, keepdims=True))
            acc_ref[h * g:(h + 1) * g, :] = (
                acc_ref[h * g:(h + 1) * g, :] * alpha
                + jax.lax.dot_general(pexp, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
            m_ref[h * g:(h + 1) * g, :] = mh
        return 0

    def run(sems):
        start_all(0, 0, sems)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages, lambda p, c: body(p, c, sems), 0)
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF, 4)))


def decode_gqa_pallas_v3_int8(q, k_cache, v_cache, k_scales, v_scales,
                              seq_lens, block_table, sm_scale, page_size):
    """INT8 page-major decode: caches int8 [P, Hkv, ps, D], scales f32
    [P, Hkv, 1, ps]."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, sl, bt: (bb, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, dv), lambda bb, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, page_size, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, hkv, 1, page_size), k_scales.dtype),
            pltpu.VMEM((NBUF, hkv, 1, page_size), v_scales.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      q4, k_cache, v_cache, k_scales, v_scales)
    return out.reshape(b, hq, dv)


def _new_token_update(q_ref, knew_ref, vnew_ref, acc_ref, m_ref, l_ref,
                      *, sm_scale, hkv, g, dk, dv):
    """Fold the CURRENT token's k/v (bf16 operands, not yet in the cache) into
    the online softmax — the deferred-write decode trick: the paged cache
    stays read-only inside the layer scan, so XLA never has to copy it
    (a scatter-updated pallas operand inside lax.scan measured a full cache
    copy per layer — flat-cache A/B 2026-08-17, 16.7 vs 9.9 ms/step at L=8)."""
    for h in range(hkv):
        q = q_ref[0, h].astype(jnp.float32)                    # [G, D]
        kn = knew_ref[0, h].astype(jnp.float32).reshape(1, dk)  # [1, D]
        vn = vnew_ref[0, h].astype(jnp.float32).reshape(1, dv)
        s = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale      # [G, 1]
        mh_prev = m_ref[h * g:(h + 1) * g, :]
        mh = jnp.maximum(mh_prev, s)
        alpha = jnp.exp(mh_prev - mh)
        pexp = jnp.exp(s - mh)
        l_ref[h * g:(h + 1) * g, :] = l_ref[h * g:(h + 1) * g, :] * alpha + pexp
        acc_ref[h * g:(h + 1) * g, :] = (
            acc_ref[h * g:(h + 1) * g, :] * alpha
            + jax.lax.dot_general(pexp, vn, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32))
        m_ref[h * g:(h + 1) * g, :] = mh


def _kernel_int8_defer(seq_lens_ref, block_table_ref, q_ref, knew_ref, vnew_ref,
                       k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
                       k_buf, v_buf, ks_buf, vs_buf, acc_ref, m_ref, l_ref,
                       *, page_size, sm_scale, hkv, g):
    """INT8 paged attend over CACHED tokens only (seq_lens_ref holds the cached
    length, excluding the current token) + register-resident current token."""
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]          # cached tokens (may be 0: first step)
    num_pages = pl.cdiv(seq_len, page_size)

    def dma(buf, hbm, slot, page_idx, sem_slot):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[page], buf.at[slot], sem_slot)

    def start_all(slot, p, sems):
        dma(k_buf, k_hbm, slot, p, sems.at[slot, 0]).start()
        dma(v_buf, v_hbm, slot, p, sems.at[slot, 1]).start()
        dma(ks_buf, ks_hbm, slot, p, sems.at[slot, 2]).start()
        dma(vs_buf, vs_hbm, slot, p, sems.at[slot, 3]).start()

    def wait_all(slot, p, sems):
        dma(k_buf, k_hbm, slot, p, sems.at[slot, 0]).wait()
        dma(v_buf, v_hbm, slot, p, sems.at[slot, 1]).wait()
        dma(ks_buf, ks_hbm, slot, p, sems.at[slot, 2]).wait()
        dma(vs_buf, vs_hbm, slot, p, sems.at[slot, 3]).wait()

    def body(p, _, sems):
        slot = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            start_all(nxt, p + 1, sems)

        wait_all(slot, p, sems)
        col = p * page_size + jax.lax.broadcasted_iota(jnp.int32, (g, page_size), 1)
        valid = col < seq_len

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)
            ks = ks_buf[slot, h].astype(jnp.float32)
            vs = vs_buf[slot, h].astype(jnp.float32)
            k = k_buf[slot, h].astype(jnp.float32) * ks.reshape(page_size, 1)
            v = v_buf[slot, h].astype(jnp.float32) * vs.reshape(page_size, 1)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(valid, s, _NEG_INF)
            mh_prev = m_ref[h * g:(h + 1) * g, :]
            mh = jnp.maximum(mh_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(s - mh)
            l_ref[h * g:(h + 1) * g, :] = (
                l_ref[h * g:(h + 1) * g, :] * alpha
                + jnp.sum(pexp, -1, keepdims=True))
            acc_ref[h * g:(h + 1) * g, :] = (
                acc_ref[h * g:(h + 1) * g, :] * alpha
                + jax.lax.dot_general(pexp, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
            m_ref[h * g:(h + 1) * g, :] = mh
        return 0

    def run(sems):
        @pl.when(num_pages > 0)
        def _first():
            start_all(0, 0, sems)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages, lambda p, c: body(p, c, sems), 0)
        _new_token_update(q_ref, knew_ref, vnew_ref, acc_ref, m_ref, l_ref,
                          sm_scale=sm_scale, hkv=hkv, g=g,
                          dk=q_ref.shape[-1], dv=vnew_ref.shape[-1])
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF, 4)))


def decode_gqa_pallas_v3_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                    k_scales, v_scales, cached_lens,
                                    block_table, sm_scale, page_size):
    """Deferred-write INT8 decode: attends cached tokens 0..cached_lens-1 from
    the paged int8 cache PLUS the current token's k_new/v_new [B, Hkv, D]
    (bf16, not yet written). The cache is a read-only operand, so the model's
    layer scan never scatter-updates a pallas input (no XLA defensive copies);
    the caller scatters all layers' new tokens once, after the scan."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, sl, bt: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, dk), lambda bb, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, dv), lambda bb, sl, bt: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, dv), lambda bb, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, page_size, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, hkv, 1, page_size), k_scales.dtype),
            pltpu.VMEM((NBUF, hkv, 1, page_size), v_scales.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_int8_defer, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      q4, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales)
    return out.reshape(b, hq, dv)


def _kernel_defer(seq_lens_ref, block_table_ref, q_ref, knew_ref, vnew_ref,
                  k_hbm, v_hbm, out_ref, k_buf, v_buf, acc_ref, m_ref, l_ref,
                  *, page_size, sm_scale, hkv, g):
    """bf16 twin of _kernel_int8_defer."""
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)

    def dma(buf, hbm, slot, page_idx, sem_slot):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[page], buf.at[slot], sem_slot)

    def body(p, _, k_sems, v_sems):
        slot = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            dma(k_buf, k_hbm, nxt, p + 1, k_sems.at[nxt]).start()
            dma(v_buf, v_hbm, nxt, p + 1, v_sems.at[nxt]).start()

        dma(k_buf, k_hbm, slot, p, k_sems.at[slot]).wait()
        dma(v_buf, v_hbm, slot, p, v_sems.at[slot]).wait()

        col = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        valid = col < seq_len

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)
            k = k_buf[slot, h].astype(jnp.float32)
            v = v_buf[slot, h].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(valid, s, _NEG_INF)
            mh_prev = m_ref[h * g:(h + 1) * g, :]
            mh = jnp.maximum(mh_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(s - mh)
            l_ref[h * g:(h + 1) * g, :] = (
                l_ref[h * g:(h + 1) * g, :] * alpha
                + jnp.sum(pexp, -1, keepdims=True))
            acc_ref[h * g:(h + 1) * g, :] = (
                acc_ref[h * g:(h + 1) * g, :] * alpha
                + jax.lax.dot_general(pexp, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
            m_ref[h * g:(h + 1) * g, :] = mh
        return 0

    def run(k_sems, v_sems):
        @pl.when(num_pages > 0)
        def _first():
            dma(k_buf, k_hbm, 0, 0, k_sems.at[0]).start()
            dma(v_buf, v_hbm, 0, 0, v_sems.at[0]).start()
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages,
                          lambda p, c: body(p, c, k_sems, v_sems), 0)
        _new_token_update(q_ref, knew_ref, vnew_ref, acc_ref, m_ref, l_ref,
                          sm_scale=sm_scale, hkv=hkv, g=g,
                          dk=q_ref.shape[-1], dv=vnew_ref.shape[-1])
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF,)),
                  pltpu.SemaphoreType.DMA((NBUF,)))


def decode_gqa_pallas_v3_defer(q, k_new, v_new, k_cache, v_cache, cached_lens,
                               block_table, sm_scale, page_size):
    """bf16 deferred-write decode (see the int8 twin's docstring)."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, sl, bt: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, dk), lambda bb, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, dv), lambda bb, sl, bt: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, dv), lambda bb, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, page_size, dv), v_cache.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_defer, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      q4, k_new.astype(q.dtype), v_new.astype(q.dtype), k_cache, v_cache)
    return out.reshape(b, hq, dv)


def reshape_and_cache_gqa_page_major_int8(k, v, k_cache, v_cache,
                                          k_scale_cache, v_scale_cache,
                                          slot_mapping):
    """INT8 page-major scatter: scale caches f32 [P, Hkv, 1, page_size]."""
    num_pages, hkv, ps, d = k_cache.shape
    page = jnp.where(slot_mapping >= 0, slot_mapping // ps, num_pages)
    off = jnp.where(slot_mapping >= 0, slot_mapping % ps, 0)

    def q8(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-7) / 127.0
        qv = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
        return qv.astype(jnp.int8), scale[..., 0]

    kq, ks = q8(k)
    vq, vs = q8(v)
    k_cache = k_cache.at[page, :, off].set(kq, mode="drop")
    v_cache = v_cache.at[page, :, off].set(vq, mode="drop")
    k_scale_cache = k_scale_cache.at[page, :, 0, off].set(
        ks.astype(k_scale_cache.dtype), mode="drop")
    v_scale_cache = v_scale_cache.at[page, :, 0, off].set(
        vs.astype(v_scale_cache.dtype), mode="drop")
    return k_cache, v_cache, k_scale_cache, v_scale_cache
