"""Flash-decode v8: mega-stream kernel + Pallas append over TOKEN-MAJOR pages.

Why the layout flip. v6 reads pages laid out head-major [P, hkv, ps, D]: one
DMA per page, but a single-token append writes hkv strided 128-byte runs.
Measured on the v5e (2026-08-18 micro A/B, 8B dims, bs64):
  - head-major + XLA scatter: the scatter prefers a token-major layout, so
    XLA relayout-copies the whole 600 MB cache every step (attend 7.4 +
    scatter 3.0 -> BOTH 13.2 ms/step);
  - token-major + XLA scatter: no relayout, but XLA:TPU row-serializes the
    2048-row scatter into a while loop of dynamic-update-slices
    (~3.5 us/row -> 7.3 ms/step).
Both XLA paths lose ~5 ms/step. The fix is to take XLA out of the k/v write
path entirely:

  pages token-major [P, ps*hkv, D], row r = t*hkv + h. One token is ONE
  contiguous [hkv, D] block, and the flat cache's layer stride is uniform
  (page + li*pages_per_layer), so ALL layers' new tokens for one sequence
  form a single strided HBM->HBM DMA [L, hkv, D]. `append_tm_int8_pallas`
  issues 2 descriptors per sequence (k, v) with aliased outputs — ~128
  descriptors/step replace the 2048-row scatter. Mosaic accepts exactly this
  slice form on v5e (sublane row ranges at 8-aligned offsets; probed
  2026-08-18 — head-major ps-dim slices and all lane-dim slices are
  REJECTED, which is what forces the layout flip).

Scales stay in an XLA scatter: Mosaic rejects their sub-row writes in every
layout, but the scale arrays are ~25 MB (no D axis), so XLA's worst case —
relayout copy — costs ~0.1 ms, not 2.5. They are stored [P, 1, ps*hkv] f32
with the same r = t*hkv + h column order so the attend kernel DMAs them as
one [1, ps*hkv] row (no in-kernel reshape; Mosaic rejects sublane->lane
shape casts).

The attend kernel streams page DMAs exactly like v6; only index arithmetic
changes: token col = r // hkv and head kh = r % hkv (v6: r % ps, r // ps).

Reference parity: decode attention package
(python/sgl_kernel_npu/attention/decode_attention.py) and the NPU
reshape-and-cache ops — the layout co-design replaces their in-place
single-token cache scatter (SURVEY §2.1).
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


def init_cache_tm_int8(num_pages, hkv, page_size, d):
    """Token-major INT8 cache pytree: k/v [P, ps*hkv, D], scales [P,1,ps*hkv]."""
    shape = (num_pages, page_size * hkv, d)
    sshape = (num_pages, 1, page_size * hkv)
    return {"k": jnp.zeros(shape, jnp.int8), "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.float32),
            "vs": jnp.zeros(sshape, jnp.float32)}


def reshape_and_cache_gqa_token_major_int8(k, v, k_cache, v_cache,
                                           k_scale_cache, v_scale_cache,
                                           slot_mapping):
    """INT8 token-major scatter: one contiguous [hkv, D] run per token.

    k, v [T, Hkv, D]; caches [P, ps*hkv, D]; scale caches [P, 1, ps*hkv];
    slot_mapping [T] (page*ps + off, or <0 to drop)."""
    num_pages, rows, d = k_cache.shape
    hkv = k.shape[1]
    ps = rows // hkv
    page = jnp.where(slot_mapping >= 0, slot_mapping // ps, num_pages)
    off = jnp.where(slot_mapping >= 0, slot_mapping % ps, 0)

    def q8(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-7) / 127.0
        qv = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
        return qv.astype(jnp.int8), scale[..., 0]

    kq, ks = q8(k)
    vq, vs = q8(v)
    kc4 = k_cache.reshape(num_pages, ps, hkv, d)       # free bitcast
    vc4 = v_cache.reshape(num_pages, ps, hkv, d)
    kc4 = kc4.at[page, off].set(kq, mode="drop")
    vc4 = vc4.at[page, off].set(vq, mode="drop")
    ks4 = k_scale_cache.reshape(num_pages, 1, ps, hkv)
    vs4 = v_scale_cache.reshape(num_pages, 1, ps, hkv)
    ks4 = ks4.at[page, 0, off].set(ks.astype(jnp.float32), mode="drop")
    vs4 = vs4.at[page, 0, off].set(vs.astype(jnp.float32), mode="drop")
    return (kc4.reshape(k_cache.shape), vc4.reshape(v_cache.shape),
            ks4.reshape(k_scale_cache.shape), vs4.reshape(v_scale_cache.shape))


APPEND_NSEM = 8


def _kernel_append_tm(pg_ref, off_ref, kq_hbm, vq_hbm, kc_in, vc_in,
                      kc_out, vc_out, sems):
    """Per-sequence strided append: 2 HBM->HBM DMAs cover all L layers.

    kq/vq [L, B, hkv, D] int8; caches viewed [L, P_l, ps*hkv, D]; pg_ref[b]
    is the per-layer page index (sentinel P_l for inactive rows), off_ref[b]
    the in-page token slot. DMA ring of APPEND_NSEM slots per direction."""
    batch = pg_ref.shape[0]
    hkv = kq_hbm.shape[2]
    num_pages = kc_out.shape[1]

    def mk(b, which):
        page = pg_ref[b]
        off = off_ref[b]
        src = (kq_hbm if which == 0 else vq_hbm).at[:, b]
        dst = (kc_out if which == 0 else vc_out).at[
            :, page, pl.ds(off * hkv, hkv), :]
        return pltpu.make_async_copy(src, dst, sems.at[b % APPEND_NSEM, which])

    def active(b):
        return pg_ref[b] < num_pages

    def body(b, _):
        # free slot b % NSEM before reuse (its previous DMA is b - NSEM)
        @pl.when((b >= APPEND_NSEM) & active(b - APPEND_NSEM))
        def _wait_prev():
            mk(b - APPEND_NSEM, 0).wait()
            mk(b - APPEND_NSEM, 1).wait()

        @pl.when(active(b))
        def _start():
            mk(b, 0).start()
            mk(b, 1).start()
        return 0

    jax.lax.fori_loop(0, batch, body, 0)

    def drain(b, _):
        @pl.when(active(b))
        def _w():
            mk(b, 0).wait()
            mk(b, 1).wait()
        return 0

    jax.lax.fori_loop(max(batch - APPEND_NSEM, 0), batch, drain, 0)


def append_tm_int8_pallas(kq, vq, k_cache, v_cache, pages, offs):
    """Append one quantized token per (layer, sequence) into token-major pages.

    kq/vq [L, B, hkv, D] int8 (pre-quantized); k_cache/v_cache 4-D
    [L, P_l, ps*hkv, D] int8 — keep the cache 4-D through the whole decode
    step: reshaping a 600 MB cache to fold/unfold the layer dim around this
    call materializes as a full relayout copy (~1 ms per reshape per array —
    v8 loop trace 2026-08-18); pages [B] per-layer page index (>= P_l drops
    the row), offs [B] token slot within the page. Returns updated caches
    (aliased — updated in place, no XLA scatter; module docstring).

    Mosaic constraint (chip-probed 2026-08-18): the [hkv, D] destination
    row-slice must sit at an 8-row-aligned offset with an 8-multiple size,
    so compiled runs need hkv % 8 == 0 (off*hkv is then always aligned);
    callers with smaller kv-head counts must use the head-major layout."""
    hkv = kq.shape[2]
    assert hkv % 8 == 0 or interpret_mode(), (
        f"append_tm_int8_pallas: Mosaic rejects {hkv}-row int8 slices "
        "(needs hkv % 8 == 0 on hardware); use the head-major layout")
    kc4, vc4 = k_cache, v_cache

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((APPEND_NSEM, 2))],
    )
    kc4, vc4 = pl.pallas_call(
        _kernel_append_tm,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kc4.shape, kc4.dtype),
                   jax.ShapeDtypeStruct(vc4.shape, vc4.dtype)],
        # flat operands: 2 scalars, kq=2, vq=3, kc=4, vc=5
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(pages.astype(jnp.int32), offs.astype(jnp.int32), kq, vq, kc4, vc4)
    return kc4, vc4


def quant_rows_int8(k, v):
    """Per-(token, head) symmetric INT8 quant of new k/v rows [..., Hkv, D].

    Returns (kq, vq int8, ks, vs f32 [..., Hkv]) — same math as
    decode_v3.reshape_and_cache_gqa_page_major_int8's q8."""
    def q8(x):
        x = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-7) / 127.0
        qv = jnp.clip(jnp.round(x / scale), -128, 127)
        return qv.astype(jnp.int8), scale[..., 0]
    kq, ks = q8(k)
    vq, vs = q8(v)
    return kq, vq, ks, vs


def scatter_scales_tm(k_scales, v_scales, ks, vs, pages, offs):
    """Scale update as a DENSE MASKED SELECT — no scatter, no reshape.

    An XLA scatter here either row-serializes (3.5 us/row on v5e) or forces
    relayout copies + materialized reshapes against the Pallas reader's
    pinned layout (~7 ms/step total — loop trace 2026-08-18). Pages are
    DISJOINT across sequences, so inverting the page->sequence map (a tiny
    [P] scatter) turns the update into one fused elementwise `where` over
    the ~75 MB scale arrays (~0.4 ms, layout-neutral).

    k_scales/v_scales [L, P, 1, ps*hkv] f32; ks/vs [L*B, hkv] (layer-major);
    pages [B] per-layer page index (>= P drops the row), offs [B] slot."""
    l, num_pages, _, rows = k_scales.shape
    hkv = ks.shape[-1]
    ps = rows // hkv
    b = pages.shape[0]
    ks = ks.astype(jnp.float32).reshape(l, b, hkv)
    vs = vs.astype(jnp.float32).reshape(l, b, hkv)

    owner = jnp.full((num_pages,), -1, jnp.int32).at[pages].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop")          # [P]
    own_off = jnp.where(owner >= 0, offs[jnp.maximum(owner, 0)], -1)
    col = jnp.arange(rows, dtype=jnp.int32) // hkv            # token of row r
    mask = col[None, :] == own_off[:, None]                   # [P, rows]

    def upd(cache, new):
        own = new[:, jnp.maximum(owner, 0), :]                # [L, P, hkv]
        tiled = jnp.broadcast_to(
            own[:, :, None, :], (l, num_pages, ps, hkv)
        ).reshape(l, num_pages, 1, rows)
        return jnp.where(mask[None, :, None, :], tiled, cache)

    return upd(k_scales, ks), upd(v_scales, vs)


def scatter_scales_prefill_tm(k_scales, v_scales, ksn, vsn, block_tables,
                              prefix_lens, valid_lens):
    """Prefill-chunk scale update as a dense masked select (no scatter).

    Same rationale as scatter_scales_tm, generalized to MANY tokens per page:
    invert the block tables (page -> owning sequence + logical page, a tiny
    [S*MP] scatter), derive each page slot's chunk-token index, and gather +
    select. k_scales/v_scales [L, P, 1, ps*hkv] f32; ksn/vsn [L, S, T, hkv];
    block_tables [S, MP]; prefix_lens/valid_lens [S]."""
    l, num_pages, _, rows = k_scales.shape
    hkv = ksn.shape[-1]
    ps = rows // hkv
    s, t = ksn.shape[1], ksn.shape[2]
    mp = block_tables.shape[1]

    # Only block-table entries inside each sequence's LIVE chunk page range
    # may claim a page: pad entries (commonly 0) would otherwise collide with
    # a real page 0 and silently zero its scales (engine bug 2026-08-18).
    js = jnp.arange(mp, dtype=jnp.int32)[None, :]
    in_range = ((js * ps < (prefix_lens + valid_lens)[:, None])
                & ((js + 1) * ps > prefix_lens[:, None])
                & (valid_lens[:, None] > 0))
    flat_bt = jnp.where(in_range, block_tables, num_pages).reshape(-1)
    owner = jnp.full((num_pages,), -1, jnp.int32).at[flat_bt].set(
        jnp.repeat(jnp.arange(s, dtype=jnp.int32), mp), mode="drop")
    plog = jnp.zeros((num_pages,), jnp.int32).at[flat_bt].set(
        jnp.tile(jnp.arange(mp, dtype=jnp.int32), s), mode="drop")

    own = jnp.maximum(owner, 0)
    off = jnp.arange(ps, dtype=jnp.int32)
    pos = (plog[:, None] * ps + off[None, :]
           - prefix_lens[own][:, None])                      # [P, ps]
    live = ((owner >= 0)[:, None] & (pos >= 0)
            & (pos < valid_lens[own][:, None]))

    posc = jnp.clip(pos, 0, t - 1)

    # row r = t*hkv + h: expand the per-token mask to per-row
    live_rows = jnp.repeat(live[:, :, None], hkv, axis=-1
                           ).reshape(num_pages, 1, rows)[None]

    def upd(cache, new):
        gathered = new[:, own[:, None], posc, :]             # [L, P, ps, hkv]
        return jnp.where(live_rows,
                         gathered.reshape(l, num_pages, 1, rows), cache)

    return upd(k_scales, ksn), upd(v_scales, vsn)


def _kernel_v8_int8(seq_ref, bt_ref, li_ref, q_ref, kn_ref, vn_ref,
                    k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
                    kbuf, vbuf, ksbuf, vsbuf, acc_ref, m_ref, l_ref, sems,
                    *, page_size, sm_scale, hkv, g, max_pages, batch):
    ps = page_size
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    total = batch * max_pages
    li = li_ref[0]

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
            cp = pltpu.make_async_copy(hbm.at[li, page], buf.at[slot],
                                       sems.at[slot, i])
            cp.start() if start else cp.wait()

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
            dma4(slot, s, False)
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            k2 = kbuf[slot].astype(jnp.bfloat16)          # [ps*hkv, d]
            v2 = vbuf[slot].astype(jnp.bfloat16)
            ksr = ksbuf[slot].astype(jnp.float32)          # [1, ps*hkv]
            vsr = vsbuf[slot].astype(jnp.float32)
            # token-major rows: r = t*hkv + h
            col = p * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, hkv * ps), 1) // hkv
            qh = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
            kh = jax.lax.broadcasted_iota(jnp.int32, (1, hkv * ps), 1) % hkv
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
            from .decode_v6 import _finalize_rows
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
            vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
            _finalize_rows(q2, kn2, vn2, out_ref, b, acc_ref, m_ref, l_ref,
                           sm_scale=sm_scale, hkv=hkv, g=g, dv=dv)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v8_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                    k_scales, v_scales, cached_lens,
                                    block_table, sm_scale, page_size,
                                    layer_idx=0):
    """Token-major mega-stream INT8 deferred-write decode (module docstring).

    q [B, Hq, D]; k_new/v_new [B, Hkv, D]; caches int8 [L, P, ps*Hkv, D],
    scales f32 [L, P, 1, ps*Hkv] — 4-D with the layer selected by layer_idx
    (a traced scalar is fine) so the model's scan never reshapes the cache;
    cached_lens [B]; block_table [B, MP] (per-layer page ids, no layer
    offset)."""
    b, hq, dk = q.shape
    _, _, rows, _ = k_cache.shape
    hkv = k_new.shape[1]
    ps = rows // hkv
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]

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
            pltpu.VMEM((NBUF, ps * hkv, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, ps * hkv, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, 1, ps * hkv), k_scales.dtype),
            pltpu.VMEM((NBUF, 1, ps * hkv), v_scales.dtype),
            pltpu.VMEM((hq, dv), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v8_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b),
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
