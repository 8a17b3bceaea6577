"""Flash-decode v9: per-sequence page-chunked mega-stream (token-major pages).

v8's mega-stream iterates per (sequence, page): at 8B/bs64/ctx320 that is 192
fori iterations, each paying scalar bookkeeping (index division, 4 DMA
waits/issues, predicate evaluation) around a tiny [hq, ps*hkv] MXU dot —
measured 150 us/layer in-model where the pure HBM cost is ~50 us.

v9 batches C pages per iteration: each body step fetches ONE sequence's next
C pages into a [C*ps*hkv, D] buffer (C page DMAs, one wait group) and issues
ONE [hq, C*ps*hkv] dot. Iterations drop to B * ceil(MP/C); the flash
(online-softmax) accumulator only has to merge across chunks, which at
short-to-medium contexts (MP <= C) degenerates to plain softmax. Invalid
pages inside a chunk are masked in the score matrix — the MXU lanes are
cheaper than the loop iterations they replace.

Cache layout is decode_v8's token-major [L, P, ps*hkv, D] int8 with
[L, P, 1, ps*hkv] f32 scales (row r = t*hkv + h); see decode_v8.py for why.

Reference parity: decode attention package
(python/sgl_kernel_npu/attention/decode_attention.py), SURVEY §3.5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode
from .decode_v6 import _finalize_rows

_NEG_INF = -1e30
NBUF = int(__import__("os").environ.get("SKT_V9_NBUF", "4"))
CHUNK_PAGES = int(__import__("os").environ.get("SKT_V9_CP", "4"))


def _kernel_v9_int8(seq_ref, bt_ref, li_ref, q_ref, kn_ref, vn_ref,
                    k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
                    kbuf, vbuf, ksbuf, vsbuf, acc_ref, m_ref, l_ref, sems,
                    *, page_size, sm_scale, hkv, g, max_pages, batch, cp,
                    qk8=False):
    ps = page_size
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    rows = ps * hkv
    nc = pl.cdiv(max_pages, cp)
    total = batch * nc
    li = li_ref[0]

    def npages(b):
        return pl.cdiv(seq_ref[b], ps)

    def dma_chunk(slot, s, start):
        b = s // nc
        c = s - b * nc
        np_b = npages(b)
        for j in range(cp):
            p = c * cp + j          # traced; np_b <= max_pages bounds it

            @pl.when(p < np_b)
            def _one(p=p, j=j):
                page = bt_ref[b, p]
                for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1)):
                    copy = pltpu.make_async_copy(
                        hbm.at[li, page],
                        buf.at[slot, pl.ds(j * rows, rows), :],
                        sems.at[slot, j, i])
                    copy.start() if start else copy.wait()
                for hbm, buf, i in ((ks_hbm, ksbuf, 2), (vs_hbm, vsbuf, 3)):
                    copy = pltpu.make_async_copy(
                        hbm.at[li, page],
                        buf.at[slot, :, pl.ds(j * rows, rows)],
                        sems.at[slot, j, i])
                    copy.start() if start else copy.wait()

    def valid_chunk(s):
        b = s // nc
        c = s - b * nc
        return c * cp < npages(b)

    for s0 in range(min(NBUF, total)):
        @pl.when(valid_chunk(jnp.int32(s0)))
        def _pro(s0=s0):
            dma_chunk(s0 % NBUF, jnp.int32(s0), True)

    def body(s, _):
        b = s // nc
        c = s - b * nc
        slot = jax.lax.rem(s, NBUF)
        clen = seq_ref[b]

        @pl.when(c == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(valid_chunk(s))
        def _upd():
            dma_chunk(slot, s, False)
            v2 = vbuf[slot].astype(jnp.bfloat16)
            ksr = ksbuf[slot].astype(jnp.float32)          # [1, cp*rows]
            vsr = vsbuf[slot].astype(jnp.float32)
            r = jax.lax.broadcasted_iota(jnp.int32, (1, cp * rows), 1)
            col = c * (cp * ps) + r // hkv
            qh = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
            kh = r % hkv
            blockmask = (qh == kh) & (col < clen)
            # un-DMA'd j-regions of a partial chunk hold stale VMEM (NaN in
            # interpret mode, arbitrary bits on chip): masked lanes zero out
            # via exp(-inf)=0, but 0*NaN=NaN — sanitize vsr explicitly
            vsr = jnp.where(col < clen, vsr, 0.0)
            if qk8:
                # W8A8 QK: quantize q per row and dot int8 x int8 -> int32 at
                # 2x the bf16 MXU rate (the QK dot is ~half the per-chunk
                # compute at bs128 — 2026-08-20 trace). The per-row q scale
                # and per-column k scale multiply back in f32.
                q2f = q_ref[pl.ds(b, 1)].astype(jnp.float32).reshape(hq, d)
                qa = jnp.max(jnp.abs(q2f), axis=-1, keepdims=True)
                qsc = jnp.maximum(qa, 1e-9) / 127.0
                q8 = jnp.clip(jnp.round(q2f / qsc), -127, 127).astype(jnp.int8)
                sci = jax.lax.dot_general(q8, kbuf[slot],
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                sc = sci.astype(jnp.float32) * qsc
            else:
                q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
                k2 = kbuf[slot].astype(jnp.bfloat16)      # [cp*rows, d]
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

        @pl.when((s + NBUF < total) & valid_chunk(s + NBUF))
        def _issue():
            dma_chunk(slot, s + NBUF, True)

        @pl.when(c == nc - 1)
        def _fin():
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
            vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
            _finalize_rows(q2, kn2, vn2, out_ref, b, acc_ref, m_ref, l_ref,
                           sm_scale=sm_scale, hkv=hkv, g=g, dv=dv)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v9_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                    k_scales, v_scales, cached_lens,
                                    block_table, sm_scale, page_size,
                                    layer_idx=0, chunk_pages=None):
    """Page-chunked token-major INT8 deferred-write decode (module docstring).

    Same contract as decode_v8.decode_gqa_pallas_v8_int8_defer: caches 4-D
    [L, P, ps*Hkv, D] int8 + [L, P, 1, ps*Hkv] f32 scales, layer picked by
    layer_idx; block_table holds per-layer page ids."""
    b, hq, dk = q.shape
    _, _, rows, _ = k_cache.shape
    hkv = k_new.shape[1]
    ps = rows // hkv
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]
    cp = min(max_pages, chunk_pages or CHUNK_PAGES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, hq, dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dv), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, hq, dv), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, cp * rows, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, cp * rows, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, 1, cp * rows), k_scales.dtype),
            pltpu.VMEM((NBUF, 1, cp * rows), v_scales.dtype),
            pltpu.VMEM((hq, dv), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, cp, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v9_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b, cp=cp,
                qk8=bool(int(__import__('os').environ.get(
                    'SKT_V9_QK8', '0')))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, dv), q.dtype),
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
      jnp.asarray(layer_idx, jnp.int32)[None],
      q, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales)
    return out
