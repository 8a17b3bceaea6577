"""Flash-decode MLA v2: page-chunked mega-stream over a COMBINED latent cache.

The base decode_mla kernel (decode.py) walks one page per grid step with two
DMAs (ckv + krope) and re-stages q every step; the MLA model additionally
paid a per-layer dynamic_index/dynamic_update copy of the whole layer cache
(~56 MB x2 x27 layers/step at the bench dims — the dominant cost of the r4
MLA number). v2 applies the decode_v9 lessons to the latent cache:

  * COMBINED pages [L, P, ps, C] bf16 with C = Lkv + Lrope (DeepSeek 512|64):
    one DMA fetches a page's ctkv AND krope rows (the reference's cache_mode 0
    "full" layout, csrc/mla_preprocess — combined is the TPU-native choice
    because it halves DMA issue count; scoring needs all C columns anyway and
    PV reads the 128-aligned [:, :Lkv] prefix).
  * The kernel streams C pages per fori step into an NBUF ring (one wait
    group, one [H, C] x [C, cp*ps] MXU dot per chunk). MLA is MQA at the
    latent level — every q head shares the single latent row — so, unlike
    GQA's v9, the score matrix [H, cp*ps] has ZERO masked-lane waste.
  * DEFER-WRITE: the cache is read-only; the current token's latent row
    (ctkv|krope, post-RMSNorm/RoPE) is folded in from registers at finalize,
    and all layers' new rows are appended once post-scan
    (append_mla_pallas — read-merge-write of an 8-row aligned window, the
    same Mosaic row-slice-alignment treatment as decode_v11's tm2 append).

Reference parity: paged MLA decode
(python/sgl_kernel_npu/sgl_kernel_npu/attention/decode_attention.py:5-231,
_paged_mla_fwd_kernel/decode_mla) and the mla_preprocess cache modes
(csrc/mla_preprocess/README.md); SURVEY §3.5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode

_NEG_INF = -1e30
NBUF = int(__import__("os").environ.get("SKT_MLA_NBUF", "4"))
CHUNK_PAGES = int(__import__("os").environ.get("SKT_MLA_CP", "4"))


def decode_mla_v2_ref(q, kv_cache, new_latent, cached_lens, block_table,
                      sm_scale, page_size, lkv, layer_idx=0):
    """XLA twin of the v2 kernel (combined cache, deferred current token).

    q [B, H, C]; kv_cache [L, P, ps, C]; new_latent [B, C] (this step's
    ctkv|krope row, NOT yet in the cache); cached_lens [B] tokens already in
    the cache. Returns [B, H, lkv]."""
    b, h, c = q.shape
    ps = kv_cache.shape[2]
    max_pages = block_table.shape[1]
    kv_l = jax.lax.dynamic_index_in_dim(kv_cache, layer_idx, 0, keepdims=False)
    rows = kv_l[block_table].reshape(b, max_pages * ps, c).astype(jnp.float32)
    rows = jnp.concatenate([rows, new_latent[:, None].astype(jnp.float32)], 1)
    qf = q.astype(jnp.float32)
    s = jnp.einsum("bhc,bnc->bhn", qf, rows) * sm_scale
    n = max_pages * ps
    live = jnp.concatenate([
        jnp.arange(n)[None, :] < cached_lens[:, None],
        jnp.ones((b, 1), bool)], axis=1)
    s = jnp.where(live[:, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhn,bnc->bhc", p, rows[..., :lkv]).astype(q.dtype)


def decode_mla_v3_int8_ref(q, kv_cache, kv_scales, new_latent, cached_lens,
                           block_table, sm_scale, page_size, lkv,
                           layer_idx=0):
    """XLA twin of the INT8-latent grouped kernel: dequantize rows at gather
    (kv_scales [L, P, 1, ps] per-token), fold the bf16 current token."""
    kv_l = jax.lax.dynamic_index_in_dim(kv_cache, layer_idx, 0,
                                        keepdims=False).astype(jnp.float32)
    s_l = jax.lax.dynamic_index_in_dim(kv_scales, layer_idx, 0,
                                       keepdims=False)
    deq = (kv_l * jnp.transpose(s_l, (0, 2, 1))).astype(q.dtype)
    return decode_mla_v2_ref(
        q, deq[None], new_latent, cached_lens, block_table, sm_scale,
        page_size, lkv, layer_idx=0)


def quant_latent_rows(new):
    """Per-row symmetric int8 quant of [L, B, C] latent rows -> (int8 rows,
    f32 scales [L, B])."""
    n32 = new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(n32), axis=-1)
    scale = jnp.maximum(amax, 1e-7) / 127.0
    q = jnp.clip(jnp.round(n32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def scatter_latent_scales(kv_scales, new_scales, pages, offs):
    """Dense masked-select scale update on [L, P, 1, ps] (the
    scatter_scales_tm2 pattern: both where() operands are broadcasts, so XLA
    fuses the update into one sweep). new_scales [L, B]."""
    l, num_pages, _, ps = kv_scales.shape
    b = pages.shape[0]
    owner = jnp.full((num_pages,), -1, jnp.int32).at[pages].set(
        jnp.arange(b, dtype=jnp.int32), mode="drop")
    own_off = jnp.where(owner >= 0, offs[jnp.maximum(owner, 0)], -1)
    mask = jnp.arange(ps, dtype=jnp.int32)[None, :] == own_off[:, None]
    own = new_scales[:, jnp.maximum(owner, 0)]            # [L, P]
    return jnp.where(mask[None, :, None, :], own[:, :, None, None], kv_scales)


def _kernel_mla_v2(seq_ref, bt_ref, li_ref, q_ref, new_ref, kv_hbm, out_ref,
                   kvbuf, acc_ref, m_ref, l_ref, sems,
                   *, page_size, sm_scale, lkv, max_pages, batch, cp):
    ps = page_size
    h = q_ref.shape[1]
    c = q_ref.shape[2]
    nc = pl.cdiv(max_pages, cp)
    total = batch * nc
    li = li_ref[0]

    def npages(b):
        return pl.cdiv(seq_ref[b], ps)

    def dma_chunk(slot, s, start):
        b = s // nc
        ch = s - b * nc
        np_b = npages(b)
        for j in range(cp):
            p = ch * cp + j

            @pl.when(p < np_b)
            def _one(p=p, j=j):
                page = bt_ref[b, p]
                copy = pltpu.make_async_copy(
                    kv_hbm.at[li, page],
                    kvbuf.at[slot, pl.ds(j * ps, ps), :],
                    sems.at[slot, j])
                copy.start() if start else copy.wait()

            if start:
                # zero-fill un-fetched page regions of a PARTIAL chunk: their
                # stale VMEM could hold NaN bit patterns, and even exp(-inf)=0
                # score weights can't kill a NaN in the PV dot (0*NaN=NaN) —
                # same guard decode_v9 applies through its zeroed scales.
                @pl.when(p >= np_b)
                def _zero(j=j):
                    kvbuf[slot, pl.ds(j * ps, ps), :] = jnp.zeros(
                        (ps, c), kvbuf.dtype)

    def valid_chunk(s):
        b = s // nc
        ch = s - b * nc
        return ch * cp < npages(b)

    for s0 in range(min(NBUF, total)):
        @pl.when(valid_chunk(jnp.int32(s0)))
        def _pro(s0=s0):
            dma_chunk(s0 % NBUF, jnp.int32(s0), True)

    def body(s, _):
        b = s // nc
        ch = s - b * nc
        slot = jax.lax.rem(s, NBUF)
        clen = seq_ref[b]

        @pl.when(ch == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(valid_chunk(s))
        def _upd():
            dma_chunk(slot, s, False)
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(h, c)
            kv = kvbuf[slot].astype(jnp.bfloat16)           # [cp*ps, c]
            sc = jax.lax.dot_general(
                q2, kv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [h, cp*ps]
            col = ch * (cp * ps) + jax.lax.broadcasted_iota(
                jnp.int32, sc.shape, 1)
            sc = jnp.where(col < clen, sc * sm_scale, _NEG_INF)
            m_prev = m_ref[...]
            mh = jnp.maximum(m_prev, jnp.max(sc, -1, keepdims=True))
            alpha = jnp.exp(m_prev - mh)
            pexp = jnp.exp(sc - mh)
            l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
            o = jax.lax.dot_general(
                pexp.astype(jnp.bfloat16), kv[:, :lkv],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + o
            m_ref[...] = mh

        @pl.when((s + NBUF < total) & valid_chunk(s + NBUF))
        def _issue():
            dma_chunk(slot, s + NBUF, True)

        @pl.when(ch == nc - 1)
        def _fin():
            # fold the current token's latent row from registers + normalize.
            # n=1 "dots" are written as explicit broadcast-mul-reduce: Mosaic
            # lowers a [h, c] x [1, c] dot_general through a fused
            # broadcast+cast that fails verification at c=576 (chip probe
            # 2026-08-20) — the VPU form is the same cost and compiles.
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.float32).reshape(h, c)
            # new_ref is [B, 1, C]: B rides an UNTILED leading dim so the
            # dynamic b-index needs no sublane-alignment proof (a 2-D [B, C]
            # block put B on the sublane dim — Mosaic rejected the pl.ds)
            nrow = new_ref[pl.ds(b, 1)].astype(jnp.float32).reshape(1, c)
            s_new = jnp.sum(q2 * nrow, axis=-1,
                            keepdims=True) * sm_scale         # [h, 1]
            m_prev = m_ref[...]
            mh = jnp.maximum(m_prev, s_new)
            alpha = jnp.exp(m_prev - mh)
            pexp = jnp.exp(s_new - mh)
            l_fin = l_ref[...] * alpha + pexp
            o_new = pexp * nrow[:, :lkv]                      # [h, lkv]
            out = (acc_ref[...] * alpha + o_new) / jnp.maximum(l_fin, 1e-37)
            out_ref[pl.ds(b, 1)] = out.astype(out_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_mla_pallas_v2_defer(q, new_latent, kv_cache, cached_lens,
                               block_table, sm_scale, page_size, lkv,
                               layer_idx=0, chunk_pages=None):
    """Combined-cache deferred-write MLA decode (module docstring).

    q [B, H, C] (nope' | rope, C = lkv + lrope); new_latent [B, C] this
    step's latent row; kv_cache [L, P, ps, C]; cached_lens [B] EXCLUDING the
    current token; block_table [B, max_pages]. Returns [B, H, lkv]."""
    b, h, c = q.shape
    l, num_pages, ps, c2 = kv_cache.shape
    assert c2 == c and ps == page_size
    max_pages = block_table.shape[1]
    cp = min(max_pages, chunk_pages or CHUNK_PAGES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, h, c), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, 1, c), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, h, lkv), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, cp * ps, c), kv_cache.dtype),
            pltpu.VMEM((h, lkv), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, cp)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel_mla_v2, page_size=page_size, sm_scale=sm_scale,
                lkv=lkv, max_pages=max_pages, batch=b, cp=cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lkv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * max_pages * ps * (c + lkv),
            bytes_accessed=b * max_pages * ps * c * 2,
            transcendentals=b * h * max_pages * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      jnp.asarray(layer_idx, jnp.int32)[None],
      q, new_latent.astype(q.dtype)[:, None, :], kv_cache)


GROUP = int(__import__("os").environ.get("SKT_MLA_G", "8"))
NBUF_G = int(__import__("os").environ.get("SKT_MLA_G_NBUF", "2"))


def _kernel_mla_v3(seq_ref, bt_ref, li_ref, q_ref, new_ref, kv_hbm, *rest,
                   page_size, sm_scale, lkv, max_pages, batch, cp, gsz,
                   int8_kv):
    if int8_kv:
        (s_hbm, out_ref, kvbuf, sbuf, acc_ref, m_ref, l_ref, sems,
         ssems) = rest
    else:
        out_ref, kvbuf, acc_ref, m_ref, l_ref, sems = rest
        s_hbm = sbuf = ssems = None
    ps = page_size
    h = q_ref.shape[1]
    c = q_ref.shape[2]
    nc = pl.cdiv(max_pages, cp)
    ngroups = batch // gsz
    total = ngroups * nc

    def dma_group(slot, s, start):
        grp = s // nc
        ch = s - grp * nc
        for g in range(gsz):
            b = grp * gsz + g
            clen = seq_ref[b]
            for j in range(cp):
                p = ch * cp + j

                @pl.when(p * ps < clen)
                def _one(p=p, j=j, g=g, b=b):
                    page = bt_ref[b, p]
                    copy = pltpu.make_async_copy(
                        kv_hbm.at[li_ref[0], page],
                        kvbuf.at[slot, g, pl.ds(j * ps, ps), :],
                        sems.at[slot, g, j])
                    copy.start() if start else copy.wait()
                    if int8_kv:
                        scopy = pltpu.make_async_copy(
                            s_hbm.at[li_ref[0], page],
                            sbuf.at[slot, g, :, pl.ds(j * ps, ps)],
                            ssems.at[slot, g, j])
                        scopy.start() if start else scopy.wait()

                if start:
                    @pl.when(p * ps >= clen)
                    def _zero(j=j, g=g):
                        kvbuf[slot, g, pl.ds(j * ps, ps), :] = jnp.zeros(
                            (ps, c), kvbuf.dtype)
                        if int8_kv:
                            sbuf[slot, g, :, pl.ds(j * ps, ps)] = jnp.zeros(
                                (1, ps), sbuf.dtype)

    def valid(s):
        # a group step is live if ANY member still has pages; per-member
        # DMAs gate themselves
        ch = s - (s // nc) * nc
        return ch < nc

    for s0 in range(min(NBUF_G, total)):
        dma_group(s0 % NBUF_G, jnp.int32(s0), True)

    def clen_rows(grp):
        return jnp.concatenate(
            [jnp.full((h, 1), seq_ref[grp * gsz + g], jnp.int32)
             for g in range(gsz)], 0)                      # [gsz*h, 1]

    def body(s, _):
        grp = s // nc
        ch = s - grp * nc
        slot = jax.lax.rem(s, NBUF_G)

        @pl.when(ch == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        dma_group(slot, s, False)
        qg = q_ref[pl.ds(grp * gsz, gsz)].astype(jnp.bfloat16)   # [g, h, c]
        kv = kvbuf[slot].astype(jnp.bfloat16)            # [g, cp*ps, c]
        sc = jax.lax.dot_general(
            qg, kv, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, h, cp*ps]
        if int8_kv:
            # per-token latent row scales multiply the score AND the PV
            # weights (the v9 int8-KV pattern on the combined cache); dead
            # lanes' stale-f32 NaNs are erased by the where() below / zeroing
            svec = sbuf[slot].astype(jnp.float32)        # [g, 1, cp*ps]
            sc = sc * svec
        sc = sc.reshape(gsz * h, cp * ps)
        col = ch * (cp * ps) + jax.lax.broadcasted_iota(
            jnp.int32, sc.shape, 1)
        live = col < clen_rows(grp)
        sc = jnp.where(live, sc * sm_scale, _NEG_INF)
        m_prev = m_ref[...]
        mh = jnp.maximum(m_prev, jnp.max(sc, -1, keepdims=True))
        alpha = jnp.exp(m_prev - mh)
        pexp = jnp.exp(sc - mh)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
        p3 = pexp.reshape(gsz, h, cp * ps)
        if int8_kv:
            p3 = p3 * svec          # dead-page scales are zero-filled
        o = jax.lax.dot_general(
            p3.astype(jnp.bfloat16), kv[:, :, :lkv],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, h, lkv]
        acc_ref[...] = acc_ref[...] * alpha + o.reshape(gsz * h, lkv)
        m_ref[...] = mh

        @pl.when((s + NBUF_G < total) & valid(s + NBUF_G))
        def _issue():
            dma_group(slot, s + NBUF_G, True)

        @pl.when(ch == nc - 1)
        def _fin():
            qg2 = q_ref[pl.ds(grp * gsz, gsz)].astype(jnp.float32)
            nrow = new_ref[pl.ds(grp * gsz, gsz)].astype(jnp.float32)
            s_new = jnp.sum(qg2 * nrow, -1).reshape(gsz * h, 1) * sm_scale
            m_prev2 = m_ref[...]
            mh2 = jnp.maximum(m_prev2, s_new)
            alpha2 = jnp.exp(m_prev2 - mh2)
            pexp2 = jnp.exp(s_new - mh2)
            l_fin = l_ref[...] * alpha2 + pexp2
            o_new = (pexp2.reshape(gsz, h, 1)
                     * nrow[:, :, :lkv]).reshape(gsz * h, lkv)
            out = (acc_ref[...] * alpha2 + o_new) / jnp.maximum(l_fin, 1e-37)
            out_ref[pl.ds(grp * gsz, gsz)] = out.reshape(
                gsz, h, lkv).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_mla_pallas_v3_defer(q, new_latent, kv_cache, cached_lens,
                               block_table, sm_scale, page_size, lkv,
                               layer_idx=0, chunk_pages=None, group=None,
                               kv_scales=None):
    """Group-batched combined-cache MLA decode: G sequences per fori step.

    v2 at the bench dims ran 128 one-sequence iterations per layer whose
    scalar bookkeeping + single-wait-group DMA pipelining left the stream at
    ~64% of the page-fetch floor (trace 2026-08-20: 120.7 us/call vs ~77
    floor). v3 fetches G sequences' pages per step (G*cp DMAs, one ring
    slot), scores them as ONE batched [G, h, c] x [G, cp*ps, c] MXU dot, and
    runs the online softmax on a [G*h, cp*ps] matrix — 1/G the iterations,
    the same bytes. Same contract as decode_mla_pallas_v2_defer.

    kv_scales: optional [L, P, 1, ps] f32 per-token row scales — the cache is
    then INT8 (the reference's quantized-latent cache_mode, halving the KV
    stream); the current token's latent still folds in bf16 from registers.
    """
    b, h, c = q.shape
    l, num_pages, ps, c2 = kv_cache.shape
    assert c2 == c and ps == page_size
    int8_kv = kv_scales is not None
    max_pages = block_table.shape[1]
    cp = min(max_pages, chunk_pages or CHUNK_PAGES)
    gsz = group or GROUP
    while b % gsz:
        gsz //= 2
    if gsz <= 1:
        assert not int8_kv, "int8 latent cache requires the grouped kernel"
        return decode_mla_pallas_v2_defer(
            q, new_latent, kv_cache, cached_lens, block_table, sm_scale,
            page_size, lkv, layer_idx=layer_idx, chunk_pages=chunk_pages)

    in_specs = [
        pl.BlockSpec((b, h, c), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec((b, 1, c), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [q, new_latent.astype(q.dtype)[:, None, :], kv_cache]
    scratch = [
        pltpu.VMEM((NBUF_G, gsz, cp * ps, c), kv_cache.dtype),
        pltpu.VMEM((gsz * h, lkv), jnp.float32),
        pltpu.VMEM((gsz * h, 1), jnp.float32),
        pltpu.VMEM((gsz * h, 1), jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF_G, gsz, cp)),
    ]
    if int8_kv:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_scales)
        scratch.insert(1, pltpu.VMEM((NBUF_G, gsz, 1, cp * ps), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((NBUF_G, gsz, cp)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, h, lkv), lambda i, *_: (0, 0, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        partial(_kernel_mla_v3, page_size=page_size, sm_scale=sm_scale,
                lkv=lkv, max_pages=max_pages, batch=b, cp=cp, gsz=gsz,
                int8_kv=int8_kv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lkv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * max_pages * ps * (c + lkv),
            bytes_accessed=b * max_pages * ps * c * kv_cache.dtype.itemsize,
            transcendentals=b * h * max_pages * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      jnp.asarray(layer_idx, jnp.int32)[None],
      *operands)


ALIGN = 8   # Mosaic ps-dim row-slice alignment (decode_v8 chip probe)
RING = int(__import__("os").environ.get("SKT_MLA_APPEND_RING", "4"))


def append_mla_pallas(new, kv_cache, pages, offs):
    """Post-scan latent append: one [C] row per (layer, sequence) into
    [L, P, ps, C] pages.

    A single cache row is below Mosaic's 8-row slice alignment, so each
    sequence does an ALIGNED read-merge-write: stage the ALIGN-row window
    [L, ALIGN, C] covering the slot across ALL layers (one strided DMA
    pair), select-merge the new rows on the VPU, write back — the
    decode_v11 append ring adapted to the latent layout.

    new [L, B, C]; pages/offs [B] (page >= P drops the write)."""
    l, batch, c = new.shape
    num_pages, ps = kv_cache.shape[1], kv_cache.shape[2]

    def _kernel(pg_ref, off_ref, new_hbm, kc_in, kc_out, win, newbuf, sems):
        ring = min(RING, max(2, batch))

        def copies(b, slot, out):
            page = pg_ref[b]
            base = (off_ref[b] // ALIGN) * ALIGN
            hbm = kc_out.at[:, page, pl.ds(base, ALIGN), :]
            mk = [pltpu.make_async_copy(
                win.at[slot] if out else hbm,
                hbm if out else win.at[slot], sems.at[slot, 0])]
            if not out:
                # new rows arrive pre-broadcast as [L, B, ALIGN, C] so the
                # staging DMA and the select-merge are both full-window ops.
                # Chip probes 2026-08-20 killed every thinner form: an
                # in-kernel [:, None, :] reshape is an unsupported shape
                # cast, a size-1 ps-dim slice breaks the 8-row alignment,
                # and a [L, B, 1, C] operand breaks bf16's 2-row sublane
                # tiling. The broadcast costs ~8x the (tiny) new-row bytes.
                mk.append(pltpu.make_async_copy(
                    new_hbm.at[:, b], newbuf.at[slot],
                    sems.at[slot, 1]))
            return mk

        def active(b):
            return pg_ref[b] < num_pages

        def merge(b, slot):
            sel = (jax.lax.broadcasted_iota(jnp.int32, (1, ALIGN, 1), 1)
                   == (off_ref[b] - (off_ref[b] // ALIGN) * ALIGN))
            win[slot] = jnp.where(sel, newbuf[slot], win[slot])

        def body(b, _):
            slot = jax.lax.rem(b, ring)

            @pl.when((b >= ring) & active(b - ring))
            def _free_slot():
                for cp_ in copies(b - ring, slot, True):
                    cp_.wait()

            @pl.when((b < batch) & active(b))
            def _reads():
                for cp_ in copies(b, slot, False):
                    cp_.start()

            @pl.when((b >= 1) & active(b - 1))
            def _process_prev():
                prev = jax.lax.rem(b - 1, ring)
                for cp_ in copies(b - 1, prev, False):
                    cp_.wait()
                merge(b - 1, prev)
                for cp_ in copies(b - 1, prev, True):
                    cp_.start()
            return 0

        jax.lax.fori_loop(0, batch + 1, body, 0)

        def tail(b, _):
            @pl.when((b >= 0) & active(b))
            def _wt():
                for cp_ in copies(b, jax.lax.rem(b, ring), True):
                    cp_.wait()
            return 0

        jax.lax.fori_loop(max(batch - ring + 1, 0), batch, tail, 0)

    ring = min(RING, max(2, batch))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((ring, l, ALIGN, c), kv_cache.dtype),
            pltpu.VMEM((ring, l, ALIGN, c), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((ring, 2)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(pages.astype(jnp.int32), offs.astype(jnp.int32),
      jnp.broadcast_to(new.astype(kv_cache.dtype)[:, :, None, :],
                       (l, batch, ALIGN, c)), kv_cache)


def append_mla_ref(new, kv_cache, pages, offs):
    """XLA twin of append_mla_pallas (scatter on the [L, P, ps, C] cache)."""
    l, batch, c = new.shape
    return kv_cache.at[:, pages, offs, :].set(
        new.astype(kv_cache.dtype), mode="drop")
