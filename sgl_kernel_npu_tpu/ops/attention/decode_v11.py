"""Flash-decode v11: head-major-within-page pages + batched per-head dots.

Why v9 plateaued (bench ledger 2026-08-20, ROADMAP): at bs128 the v9 stream
runs at ~549 GB/s — int8-QK (halving MXU time) and bigger pages (halving DMA
issue count) both measured ~neutral, so the critical path is the VPU
online-softmax over the [hq, ps*hkv] score matrix, of which 7/8 of the lanes
are qh != kh waste that exists only because token-major rows interleave the
kv heads (row = t*hkv + h).

v11 stores pages HEAD-major: cache [L, P, hkv, ps, D] int8 (row = h*ps + t)
with scales [L, P, hkv, ps]. A whole page is still ONE DMA (same bytes,
same contiguity), but now head h's tokens are a contiguous [ps, D] block, so
scoring becomes a BATCHED dot over free views:

    q3 [hkv, g, D] x k3 [hkv, ps, D] -> sc3 [hkv, g, ps]

and the softmax runs on exactly the hq * ps lanes that matter — 8x (= hkv)
fewer VPU ops than v9's masked [hq, hkv*ps] matrix. PV is the mirrored
batched dot. Page chunking is fixed at ONE page per body (pair v11 with
SKT_PAGE_SIZE=256/512 so a decode sequence is 1-2 pages).

LIVE-ONLY fetch (r5): at ps=512 a full-page DMA streams every allocated
token, but the mean LIVE context of the bench window is ~70% of a page —
pure wasted HBM bytes for the tail sub-page. Each page is therefore fetched
as ps/SKT_V12_SUB (default 128-token) sub-chunk DMAs, each conditioned on
holding at least one live token: dead sub-chunks are never read. Score
lanes of the partially-live boundary sub-chunk mask exactly as before
(stale VMEM in dead regions is harmless: int8 bit patterns are always
finite, and the f32 scale lanes are where()-zeroed).

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
NBUF = int(__import__("os").environ.get("SKT_V11_NBUF", "4"))
# live-only sub-chunk fetch granularity (tokens). Default 0 = whole-page
# DMAs: the first chip A/B (2026-08-20, ps=512 bs128) measured the 128-token
# sub-chunking a net LOSS (6680 -> ~6500 class): the ~28% dead-byte saving
# did not cover 4x the DMA issue/wait pairs. Kept for configs with much
# larger dead fractions (set SKT_V12_SUB=128).
SUB = int(__import__("os").environ.get("SKT_V12_SUB", "0"))


def _kernel_v11_int8(seq_ref, bt_ref, li_ref, q_ref, kn_ref, vn_ref,
                     k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
                     kbuf, vbuf, ksbuf, vsbuf, acc_ref, m_ref, l_ref, sems,
                     *, page_size, sm_scale, hkv, g, max_pages, batch, nsub):
    ps = page_size
    sub = ps // nsub
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    nc = max_pages                     # one page per body step
    total = batch * nc

    def npages(b):
        return pl.cdiv(seq_ref[b], ps)

    def dma_page(slot, s, start):
        b = s // nc
        c = s - b * nc
        clen = seq_ref[b]
        for j in range(nsub):
            # live-only fetch: sub-chunk j of page c streams only when it
            # holds at least one live token (j=0 ⇔ the old c < npages gate)
            @pl.when(c * ps + j * sub < clen)
            def _(j=j):
                page = bt_ref[b, c]
                li = li_ref[0]
                for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1)):
                    copy = pltpu.make_async_copy(
                        hbm.at[li, page, :, pl.ds(j * sub, sub), :],
                        buf.at[slot, :, pl.ds(j * sub, sub), :],
                        sems.at[slot, j, i])
                    copy.start() if start else copy.wait()
                for hbm, buf, i in ((ks_hbm, ksbuf, 2), (vs_hbm, vsbuf, 3)):
                    copy = pltpu.make_async_copy(
                        hbm.at[li, page, :, pl.ds(j * sub, sub)],
                        buf.at[slot, :, pl.ds(j * sub, sub)],
                        sems.at[slot, j, i])
                    copy.start() if start else copy.wait()

    def valid_chunk(s):
        b = s // nc
        c = s - b * nc
        return c < npages(b)

    for s0 in range(min(NBUF, total)):
        @pl.when(valid_chunk(jnp.int32(s0)))
        def _pro(s0=s0):
            dma_page(s0 % NBUF, jnp.int32(s0), True)

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
            dma_page(slot, s, False)
            # free views: pages are [hkv, ps, D]; scales [hkv, ps]
            q3 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, g, d)
            k3 = kbuf[slot].astype(jnp.bfloat16)           # [hkv, ps, d]
            v3 = vbuf[slot].astype(jnp.bfloat16)           # [hkv, ps, dv]
            ks3 = ksbuf[slot].astype(jnp.float32).reshape(hkv, 1, ps)
            vs3 = vsbuf[slot].astype(jnp.float32).reshape(hkv, 1, ps)
            col = c * ps + jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps), 2)
            live = col < clen                               # [1, 1, ps]
            vs3 = jnp.where(live, vs3, 0.0)                 # stale-VMEM guard
            # batched per-head QK: [hkv, g, d] x [hkv, ps, d] -> [hkv, g, ps]
            sc = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            sc = jnp.where(live, sc * ks3 * sm_scale, _NEG_INF)
            m3 = m_ref[...].reshape(hkv, g, 1)
            l3 = l_ref[...].reshape(hkv, g, 1)
            a3 = acc_ref[...].reshape(hkv, g, dv)
            mh = jnp.maximum(m3, jnp.max(sc, -1, keepdims=True))
            alpha = jnp.exp(m3 - mh)
            pexp = jnp.exp(sc - mh)
            l3 = l3 * alpha + jnp.sum(pexp, -1, keepdims=True)
            # batched PV: [hkv, g, ps] x [hkv, ps, dv] -> [hkv, g, dv]
            o = jax.lax.dot_general(
                (pexp * vs3).astype(jnp.bfloat16), v3,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_ref[...] = (a3 * alpha + o).reshape(hq, dv)
            m_ref[...] = mh.reshape(hq, 1)
            l_ref[...] = l3.reshape(hq, 1)

        @pl.when((s + NBUF < total) & valid_chunk(s + NBUF))
        def _issue():
            dma_page(slot, s + NBUF, True)

        @pl.when(c == nc - 1)
        def _fin():
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
            vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
            _finalize_rows(q2, kn2, vn2, out_ref, b, acc_ref, m_ref, l_ref,
                           sm_scale=sm_scale, hkv=hkv, g=g, dv=dv)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v11_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                     k_scales, v_scales, cached_lens,
                                     block_table, sm_scale, page_size,
                                     layer_idx=0):
    """Head-major-page INT8 deferred-write decode (module docstring).

    caches 5-D [L, P, hkv, ps, D] int8 + [L, P, hkv, ps] f32 scales
    (row = h*ps + t); same call contract as decode_v9 otherwise."""
    b, hq, dk = q.shape
    _, _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]
    # live-only sub-chunk fetch granularity: SUB tokens (8-aligned static
    # offsets; nsub=1 = whole-page DMAs, the measured default)
    nsub = max(1, ps // SUB) if SUB and ps % SUB == 0 else 1

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
            pltpu.VMEM((NBUF, hkv, ps, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, ps, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, hkv, ps), k_scales.dtype),
            pltpu.VMEM((NBUF, hkv, ps), v_scales.dtype),
            pltpu.VMEM((hq, dv), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, nsub, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v11_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b, nsub=nsub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * max_pages * ps * dk,
            bytes_accessed=b * max_pages * hkv * ps * (dk + dv + 8),
            transcendentals=b * hq * max_pages * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      jnp.asarray(layer_idx, jnp.int32)[None],
      q, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales)
    return out


ALIGN = 8   # Mosaic ps-dim slice alignment (decode_v8 chip probe 2026-08-18)
# append ring depth: slot b%R frees only when writes(b-R) land, so R=2 stalls
# read(b) behind write(b-2) (in-loop trace 2026-08-20: 349 us/step vs the
# ~165 us traffic floor at bs128); deeper rings hide more of the write tail
RING = int(__import__("os").environ.get("SKT_V11_APPEND_RING", "4"))


def append_tm2_int8_pallas(kq, vq, k_cache, v_cache, pages, offs):
    """Head-major append: one token per (layer, sequence) into 5-D
    [L, P, hkv, ps, D] pages.

    The token's hkv rows are ps-strided single rows — below Mosaic's 8-row
    slice alignment — so the kernel does an ALIGNED read-merge-write per
    sequence: stage the ALIGN-row window [L, hkv, ALIGN, D] covering the
    slot, select-merge the new token's rows on the VPU, write the window
    back. 3x the write traffic of the v8 token-major append, still tens of
    KB per sequence (~40 us/step at bs128 vs the ~1.4 ms the layout saves
    in the attention softmax)."""
    l, batch, hkv, d = kq.shape
    num_pages, ps = k_cache.shape[1], k_cache.shape[3]

    def _kernel(pg_ref, off_ref, kq_hbm, vq_hbm, kc_in, vc_in,
                kc_out, vc_out, kwin, vwin, newbuf, sems):
        def copies(b, slot, out):
            page = pg_ref[b]
            base = (off_ref[b] // ALIGN) * ALIGN
            mk = []
            for which, arr, buf in ((0, kc_out, kwin), (1, vc_out, vwin)):
                hbm = arr.at[:, page, :, pl.ds(base, ALIGN), :]
                vm = buf.at[slot]
                mk.append(pltpu.make_async_copy(
                    vm if out else hbm, hbm if out else vm,
                    sems.at[slot, which]))
            if not out:
                mk.append(pltpu.make_async_copy(
                    kq_hbm.at[:, b], newbuf.at[slot, 0], sems.at[slot, 2]))
                mk.append(pltpu.make_async_copy(
                    vq_hbm.at[:, b], newbuf.at[slot, 1], sems.at[slot, 3]))
            return mk

        def active(b):
            return pg_ref[b] < num_pages

        def merge(b, slot):
            sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, ALIGN, 1), 2)
                   == (off_ref[b] - (off_ref[b] // ALIGN) * ALIGN))
            kwin[slot] = jnp.where(sel, newbuf[slot, 0][:, :, None, :],
                                   kwin[slot])
            vwin[slot] = jnp.where(sel, newbuf[slot, 1][:, :, None, :],
                                   vwin[slot])

        # RING-slot ring: reads(b) overlap merge+writes of up to RING-1
        # earlier sequences; slot b%RING frees when writes(b-RING) land
        ring = min(RING, max(2, batch))

        def body(b, _):
            slot = jax.lax.rem(b, ring)

            @pl.when((b >= ring) & active(b - ring))
            def _free_slot():
                for cp in copies(b - ring, slot, True):
                    cp.wait()

            @pl.when((b < batch) & active(b))
            def _reads():
                for cp in copies(b, slot, False):
                    cp.start()

            @pl.when((b >= 1) & active(b - 1))
            def _process_prev():
                prev_slot = jax.lax.rem(b - 1, ring)
                for cp in copies(b - 1, prev_slot, False):
                    cp.wait()
                merge(b - 1, prev_slot)
                for cp in copies(b - 1, prev_slot, True):
                    cp.start()
            return 0

        jax.lax.fori_loop(0, batch + 1, body, 0)

        # the loop's _free_slot waited writes up to batch-ring; the last
        # ring-1 sequences' writes remain outstanding
        def tail(b, _):
            @pl.when((b >= 0) & active(b))
            def _wt():
                for cp in copies(b, jax.lax.rem(b, ring), True):
                    cp.wait()
            return 0

        jax.lax.fori_loop(max(batch - ring + 1, 0), batch, tail, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((min(RING, max(2, batch)), l, hkv, ALIGN, d),
                       k_cache.dtype),
            pltpu.VMEM((min(RING, max(2, batch)), l, hkv, ALIGN, d),
                       v_cache.dtype),
            pltpu.VMEM((min(RING, max(2, batch)), 2, l, hkv, d), kq.dtype),
            pltpu.SemaphoreType.DMA((min(RING, max(2, batch)), 4)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(pages.astype(jnp.int32), offs.astype(jnp.int32),
      kq, vq, k_cache, v_cache)


def scatter_scales_tm2(k_scales, v_scales, ks, vs, pages, offs):
    """Scale update for head-major pages: dense masked select on the
    [L, P, hkv, ps] layout.

    Both where() operands are pure broadcasts of tiny arrays (own scale
    [L, P, hkv] and the [P, ps] token mask), so XLA fuses the whole update
    into ONE read+write sweep of each scale array. The previous flat
    [L, P, 1, hkv*ps] layout needed a reshape-of-broadcast for the update
    value, which MATERIALIZED a full [L, P, rows] f32 intermediate per
    array — measured 1.35 ms/step of reshape+broadcast time in the
    2026-08-20 bench trace vs the ~0.33 ms two-array sweep floor.

    k_scales/v_scales [L, P, hkv, ps] f32; ks/vs [L*B, hkv]."""
    l, num_pages, hkv, ps = k_scales.shape
    b = pages.shape[0]
    ks = ks.astype(jnp.float32).reshape(l, b, hkv)
    vs = vs.astype(jnp.float32).reshape(l, b, hkv)

    owner = jnp.full((num_pages,), -1, jnp.int32).at[pages].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop")          # [P]
    own_off = jnp.where(owner >= 0, offs[jnp.maximum(owner, 0)], -1)
    tok = jnp.arange(ps, dtype=jnp.int32)
    mask = tok[None, :] == own_off[:, None]                   # [P, ps]

    def upd(cache, new):
        own = new[:, jnp.maximum(owner, 0), :]                # [L, P, hkv]
        return jnp.where(mask[None, :, None, :], own[:, :, :, None], cache)

    return upd(k_scales, ks), upd(v_scales, vs)
