"""Flash-decode v6: single-program mega-stream paged attention.

The decode attention ladder, all measured on the v5e at bs=64/ctx=320:

  v3  one grid program per SEQUENCE, manual 2-deep DMA buffer
      -> ~530 us/layer in-model: the first DMA of sequence b+1 waits for
         sequence b's compute, so 2-3-page sequences never stream.
  v5  grid (batch, pages), page fetch via scalar-prefetched block table in
      the BlockSpec index_map -> 267 us/layer: Mosaic pipelines across
      sequences, but per-grid-step window bookkeeping floors at ~190 GB/s.
  v6  (this file) grid (1,): ALL (sequence, page) pairs form one flat
      stream; a depth-NBUF ring of VMEM page buffers keeps the DMA engine
      issuing 128 KB page copies back-to-back while compute consumes
      completed slots -> 118 us/layer (440 GB/s).

Compute per page is ONE full-matrix MXU dot for all KV heads:
  s[hq, hkv*ps] = q2 @ K2^T  with a STATIC block-diagonal mask killing
cross-head scores (head h's queries only see head h's keys; masked lanes
exp() to 0). The int8 cache never gets dequantized into a [hkv*ps, d] f32
temporary: K scales fold into a ROW vector multiplied onto the scores and V
scales onto the probabilities, which is exact:
  o[q,:] = sum_t pexp[q,t] * vs[t] * v_int8[t,:]
A per-head batched-dot variant measured 2x slower (small (G, ps) tiles leave
the MXU/VPU idle); int8->bf16 casts are exact (|int8| < 2^8 fits bf16's
mantissa) and dots accumulate in f32.

Deferred-write contract as decode_v5: the cache holds tokens
0..cached_lens-1 and stays READ-ONLY; the current token's k/v arrive as bf16
operands and are folded in at each sequence's finalization (so the model's
layer scan never scatter-updates a pallas operand — the copy pathology that
cost round 2 a 4x regression).

Rows needing fewer than max_pages pages skip both the DMA issue and the
wait for their tail pages (issue and wait compute the same predicate), so
ragged batches don't pay for the padding.

Reference parity: the decode attention package
(python/sgl_kernel_npu/attention/decode_attention.py) — redesigned as a
single streaming kernel for the TPU DMA/MXU model (SURVEY §3.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode

_NEG_INF = -1e30
NBUF = 8


def _finalize_rows(q2, kn2, vn2, out_ref, b, acc_ref, m_ref, l_ref,
                   *, sm_scale, hkv, g, dv):
    """Fold the current token in (one [hq, d] x [d, hkv] dot, block-diag
    mask over the hkv columns), normalize, write out row b."""
    hq = hkv * g
    s = jax.lax.dot_general(
        q2, kn2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale        # [hq, hkv]
    qh = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
    kh = jax.lax.broadcasted_iota(jnp.int32, (1, hkv), 1)
    s = jnp.where(qh == kh, s, _NEG_INF)
    mh_prev = m_ref[...]
    mh = jnp.maximum(mh_prev, jnp.max(s, -1, keepdims=True))
    alpha = jnp.exp(mh_prev - mh)
    pexp = jnp.exp(s - mh)
    l_new = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
    o = jax.lax.dot_general(
        pexp.astype(jnp.bfloat16), vn2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc_ref[...] * alpha + o
    out_ref[pl.ds(b, 1)] = (acc / jnp.maximum(l_new, 1e-37)
                            ).reshape(1, hq, dv).astype(out_ref.dtype)


def _kernel_v6_int8(seq_ref, bt_ref, q_ref, kn_ref, vn_ref,
                    k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
                    kbuf, vbuf, ksbuf, vsbuf, acc_ref, m_ref, l_ref, sems,
                    *, page_size, sm_scale, hkv, g, max_pages, batch):
    ps = page_size
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    total = batch * max_pages

    def valid_page(s):
        b = s // max_pages
        p = s - b * max_pages
        return p < pl.cdiv(seq_ref[b], ps)

    def dma4(slot, s, start):
        b = s // max_pages
        p = s - b * max_pages
        page = bt_ref[b, p]
        for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1),
                            (ks_hbm, ksbuf, 2), (vs_hbm, vsbuf, 3)):
            cp = pltpu.make_async_copy(hbm.at[page], buf.at[slot],
                                       sems.at[slot, i])
            cp.start() if start else cp.wait()

    # prologue: fill the ring (static unroll; predicate skips ragged tails)
    for s0 in range(min(NBUF, total)):
        @pl.when(valid_page(jnp.int32(s0)))
        def _pro(s0=s0):
            dma4(s0 % NBUF, jnp.int32(s0), True)

    def body(s, _):
        b = s // max_pages
        p = s - b * max_pages
        slot = jax.lax.rem(s, NBUF)
        clen = seq_ref[b]
        num_pages = pl.cdiv(clen, ps)

        @pl.when(p == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(p < num_pages)
        def _upd():
            dma4(slot, s, False)                       # wait
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            k2 = kbuf[slot].astype(jnp.bfloat16).reshape(hkv * ps, d)
            v2 = vbuf[slot].astype(jnp.bfloat16).reshape(hkv * ps, d)
            ksr = ksbuf[slot].astype(jnp.float32).reshape(1, hkv * ps)
            vsr = vsbuf[slot].astype(jnp.float32).reshape(1, hkv * ps)
            col = p * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, hkv * ps), 1) % ps
            qh = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
            kh = jax.lax.broadcasted_iota(jnp.int32, (1, hkv * ps), 1) // ps
            blockmask = (qh == kh) & (col < clen)
            sc = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(blockmask, sc * ksr * sm_scale, _NEG_INF)
            mh_prev = m_ref[...]
            mh = jnp.maximum(mh_prev, jnp.max(sc, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(sc - mh)
            l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
            o = jax.lax.dot_general((pexp * vsr).astype(jnp.bfloat16), v2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + o
            m_ref[...] = mh

        @pl.when((s + NBUF < total) & valid_page(s + NBUF))
        def _issue():
            dma4(slot, s + NBUF, True)

        @pl.when(p == max_pages - 1)
        def _fin():
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
            vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
            _finalize_rows(q2, kn2, vn2, out_ref, b, acc_ref, m_ref, l_ref,
                           sm_scale=sm_scale, hkv=hkv, g=g, dv=dv)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v6_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                    k_scales, v_scales, cached_lens,
                                    block_table, sm_scale, page_size):
    """Mega-stream INT8 deferred-write decode (module docstring).

    q [B, Hq, D]; k_new/v_new [B, Hkv, D]; caches int8 [P, Hkv, ps, D],
    scales f32 [P, Hkv, 1, ps]; cached_lens [B]; block_table [B, MP]."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, hkv * g, dk), lambda i, sl, bt: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dk), lambda i, sl, bt: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dv), lambda i, sl, bt: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, hkv * g, dv), lambda i, sl, bt: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, ps, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, ps, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, hkv, 1, ps), k_scales.dtype),
            pltpu.VMEM((NBUF, hkv, 1, ps), v_scales.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v6_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * max_pages * hkv * ps * dk,
            bytes_accessed=b * max_pages * hkv * ps * (dk + dv + 8),
            transcendentals=b * hq * max_pages * hkv * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      q, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales)
    return out


def _kernel_v6(seq_ref, bt_ref, q_ref, kn_ref, vn_ref, k_hbm, v_hbm, out_ref,
               kbuf, vbuf, acc_ref, m_ref, l_ref, sems,
               *, page_size, sm_scale, hkv, g, max_pages, batch):
    ps = page_size
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    total = batch * max_pages

    def valid_page(s):
        b = s // max_pages
        p = s - b * max_pages
        return p < pl.cdiv(seq_ref[b], ps)

    def dma2(slot, s, start):
        b = s // max_pages
        p = s - b * max_pages
        page = bt_ref[b, p]
        for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1)):
            cp = pltpu.make_async_copy(hbm.at[page], buf.at[slot],
                                       sems.at[slot, i])
            cp.start() if start else cp.wait()

    for s0 in range(min(NBUF, total)):
        @pl.when(valid_page(jnp.int32(s0)))
        def _pro(s0=s0):
            dma2(s0 % NBUF, jnp.int32(s0), True)

    def body(s, _):
        b = s // max_pages
        p = s - b * max_pages
        slot = jax.lax.rem(s, NBUF)
        clen = seq_ref[b]
        num_pages = pl.cdiv(clen, ps)

        @pl.when(p == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(p < num_pages)
        def _upd():
            dma2(slot, s, False)
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            k2 = kbuf[slot].astype(jnp.bfloat16).reshape(hkv * ps, d)
            v2 = vbuf[slot].astype(jnp.bfloat16).reshape(hkv * ps, d)
            col = p * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, hkv * ps), 1) % ps
            qh = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
            kh = jax.lax.broadcasted_iota(jnp.int32, (1, hkv * ps), 1) // ps
            blockmask = (qh == kh) & (col < clen)
            sc = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(blockmask, sc * sm_scale, _NEG_INF)
            mh_prev = m_ref[...]
            mh = jnp.maximum(mh_prev, jnp.max(sc, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(sc - mh)
            l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
            o = jax.lax.dot_general(pexp.astype(jnp.bfloat16), v2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + o
            m_ref[...] = mh

        @pl.when((s + NBUF < total) & valid_page(s + NBUF))
        def _issue():
            dma2(slot, s + NBUF, True)

        @pl.when(p == max_pages - 1)
        def _fin():
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
            vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
            _finalize_rows(q2, kn2, vn2, out_ref, b, acc_ref, m_ref, l_ref,
                           sm_scale=sm_scale, hkv=hkv, g=g, dv=dv)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v6_defer(q, k_new, v_new, k_cache, v_cache, cached_lens,
                               block_table, sm_scale, page_size):
    """bf16 twin of decode_gqa_pallas_v6_int8_defer."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, hkv * g, dk), lambda i, sl, bt: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dk), lambda i, sl, bt: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dv), lambda i, sl, bt: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, hkv * g, dv), lambda i, sl, bt: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, ps, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, ps, dv), v_cache.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v6, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * max_pages * hkv * ps * dk,
            bytes_accessed=b * max_pages * hkv * ps * (dk + dv) * 2,
            transcendentals=b * hq * max_pages * hkv * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      q, k_new.astype(q.dtype), v_new.astype(q.dtype), k_cache, v_cache)
    return out
