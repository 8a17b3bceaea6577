"""Flash-decode v4: fused scatter+attend over the FULL stacked (per-layer)
cache with ``input_output_aliases``.

v3 + the model's scatter leave ~10 ms/step on the table at bs64 (ROADMAP §3):
each layer slices the stacked cache (``dynamic_index_in_dim`` copy), scatters
the new token (XLA ``.at[].set``), and launches the attention kernel on the
slice. v4 folds all three into ONE kernel per layer:

  * the stacked caches [L, P, Hkv, ps, D] are kernel inputs AND outputs,
    aliased (``input_output_aliases``) so XLA donates the buffers — zero
    copies, zero slicing; the layer index rides the scalar-prefetch channel;
  * the new token's K/V are quantized IN-kernel (bit-identical to
    ``reshape_and_cache_gqa_page_major_int8``) and DMA'd straight into the
    aliased HBM pages;
  * the write -> read hazard is eliminated by construction: the paged read
    masks the new token's position out and its attention contribution is added
    from VMEM registers instead, so the write DMA may land any time before the
    kernel ends (a partially-written row can only be read at masked positions;
    the V row is zeroed explicitly so masked-lane NaN * 0 cannot occur).

Reference parity: the fusion mirrors csrc/mla_preprocess's philosophy (one
launch per layer, no intermediate HBM round-trips) applied to the GQA decode
path; op behavior matches reshape_and_cache + paged attention exactly.
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


def _kernel_v4_int8(seq_lens_ref, block_table_ref, slot_ref, li_ref,
                    q_ref, kn_ref, vn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
                    out_ref, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
                    k_buf, v_buf, ks_buf, vs_buf, acc_ref, m_ref, l_ref,
                    wk_ref, wv_ref, wks_ref, wvs_ref,
                    *, page_size, sm_scale, hkv, g):
    b = pl.program_id(0)
    li = li_ref[0]
    seq_len = seq_lens_ref[b]
    slot = slot_ref[b]
    slot_c = jnp.maximum(slot, 0)          # padded rows: descriptor stays legal
    page_w = slot_c // page_size
    off_w = jax.lax.rem(slot_c, page_size)
    num_pages = pl.cdiv(seq_len, page_size)
    pos_new = seq_len - 1

    # ---- quantize the new token (bit-identical to the XLA scatter op)
    def q8(x):
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-7) / 127.0
        qv = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
        return qv, scale

    kn = kn_ref[0].astype(jnp.float32)                        # [Hkv, D]
    vn = vn_ref[0].astype(jnp.float32)
    kq, ksc = q8(kn)
    vq, vsc = q8(vn)
    kdq = kq.astype(jnp.float32) * ksc                        # what readers see
    vdq = vq.astype(jnp.float32) * vsc
    wk_ref[...] = kq[:, None, :]
    wv_ref[...] = vq[:, None, :]
    wks_ref[...] = ksc
    wvs_ref[...] = vsc

    def rd(buf, hbm, slot_, page_idx, sem):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[li, page], buf.at[slot_], sem)

    def body(p, _, sems):
        sl = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            rd(k_buf, k_hbm, nxt, p + 1, sems.at[nxt, 0]).start()
            rd(v_buf, v_hbm, nxt, p + 1, sems.at[nxt, 1]).start()
            rd(ks_buf, ks_hbm, nxt, p + 1, sems.at[nxt, 2]).start()
            rd(vs_buf, vs_hbm, nxt, p + 1, sems.at[nxt, 3]).start()

        rd(k_buf, k_hbm, sl, p, sems.at[sl, 0]).wait()
        rd(v_buf, v_hbm, sl, p, sems.at[sl, 1]).wait()
        rd(ks_buf, ks_hbm, sl, p, sems.at[sl, 2]).wait()
        rd(vs_buf, vs_hbm, sl, p, sems.at[sl, 3]).wait()

        col = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        # the new token is handled from VMEM below — masked out here, so the
        # in-flight write DMA to (page_w, off_w) cannot affect the result
        valid = (col < seq_len) & (col != pos_new)
        vcol = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (page_size, 1), 0)
        vkeep = vcol != pos_new

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)               # [G, D]
            ks = ks_buf[sl, h].astype(jnp.float32)            # [1, ps]
            vs = vs_buf[sl, h].astype(jnp.float32)
            k = k_buf[sl, h].astype(jnp.float32) * ks.reshape(page_size, 1)
            v = v_buf[sl, h].astype(jnp.float32) * vs.reshape(page_size, 1)
            v = jnp.where(vkeep, v, 0.0)                      # kill NaN*0 path
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

    def run(sems, wsems):
        writes = [
            pltpu.make_async_copy(
                wk_ref, ko_hbm.at[li, page_w, :, pl.ds(off_w, 1), :],
                wsems.at[0]),
            pltpu.make_async_copy(
                wv_ref, vo_hbm.at[li, page_w, :, pl.ds(off_w, 1), :],
                wsems.at[1]),
            pltpu.make_async_copy(
                wks_ref, kso_hbm.at[li, page_w, :, 0, pl.ds(off_w, 1)],
                wsems.at[2]),
            pltpu.make_async_copy(
                wvs_ref, vso_hbm.at[li, page_w, :, 0, pl.ds(off_w, 1)],
                wsems.at[3]),
        ]

        # fire the cache writes; they only need to land before kernel exit
        # (slot < 0 marks a padded batch row: nothing to write)
        @pl.when(slot >= 0)
        def _write():
            for w in writes:
                w.start()

        rd(k_buf, k_hbm, 0, 0, sems.at[0, 0]).start()
        rd(v_buf, v_hbm, 0, 0, sems.at[0, 1]).start()
        rd(ks_buf, ks_hbm, 0, 0, sems.at[0, 2]).start()
        rd(vs_buf, vs_hbm, 0, 0, sems.at[0, 3]).start()
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages, lambda p, c: body(p, c, sems), 0)

        # new-token contribution straight from registers
        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)               # [G, D]
            s_new = jnp.sum(q * kdq[h][None, :], -1,
                            keepdims=True) * sm_scale         # [G, 1]
            mh_prev = m_ref[h * g:(h + 1) * g, :]
            mh = jnp.maximum(mh_prev, s_new)
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(s_new - mh)
            l_ref[h * g:(h + 1) * g, :] = (
                l_ref[h * g:(h + 1) * g, :] * alpha + pexp)
            acc_ref[h * g:(h + 1) * g, :] = (
                acc_ref[h * g:(h + 1) * g, :] * alpha
                + pexp * vdq[h][None, :])

        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

        @pl.when(slot >= 0)
        def _drain():
            for w in writes:
                w.wait()

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF, 4)),
                  pltpu.SemaphoreType.DMA((4,)))


def decode_fused_v4_int8(q, k_new, v_new, k_cache, v_cache, k_scales, v_scales,
                         seq_lens, block_table, slot_mapping, layer_idx,
                         sm_scale, page_size):
    """Fused scatter+attend, INT8 stacked caches.

    q [B, Hq, D]; k_new/v_new [B, Hkv, D] (pre-RoPE'd); caches
    [L, P, Hkv, ps, D] int8 with scales [L, P, Hkv, 1, ps] f32; layer_idx a
    traced scalar. Returns (att [B, Hq, D], k_cache, v_cache, ks, vs) with the
    caches updated IN PLACE (donated via input_output_aliases).
    """
    b, hq, dk = q.shape
    _, _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, *_: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, dk), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, dv), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv * g, dv), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, page_size, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, hkv, 1, page_size), k_scales.dtype),
            pltpu.VMEM((NBUF, hkv, 1, page_size), v_scales.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv, 1, dk), jnp.int8),
            pltpu.VMEM((hkv, 1, dv), jnp.int8),
            pltpu.VMEM((hkv, 1), jnp.float32),
            pltpu.VMEM((hkv, 1), jnp.float32),
        ],
    )
    att, kc, vc, ks, vs = pl.pallas_call(
        partial(_kernel_v4_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
            jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
        ],
        # flat operand order: 4 scalars, q4=4, kn=5, vn=6, kc=7, vc=8, ks=9,
        # vs=10; outputs: att=0, kc=1, vc=2, ks=3, vs=4
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      slot_mapping.astype(jnp.int32), jnp.asarray(layer_idx, jnp.int32)[None],
      q4, k_new, v_new, k_cache, v_cache, k_scales, v_scales)
    return att.reshape(b, hq, dv), kc, vc, ks, vs


def _kernel_v4_bf16(seq_lens_ref, block_table_ref, slot_ref, li_ref,
                    q_ref, kn_ref, vn_ref, k_hbm, v_hbm,
                    out_ref, ko_hbm, vo_hbm,
                    k_buf, v_buf, acc_ref, m_ref, l_ref, wk_ref, wv_ref,
                    *, page_size, sm_scale, hkv, g):
    b = pl.program_id(0)
    li = li_ref[0]
    seq_len = seq_lens_ref[b]
    slot = slot_ref[b]
    slot_c = jnp.maximum(slot, 0)
    page_w = slot_c // page_size
    off_w = jax.lax.rem(slot_c, page_size)
    num_pages = pl.cdiv(seq_len, page_size)
    pos_new = seq_len - 1

    kn = kn_ref[0].astype(k_hbm.dtype)                        # [Hkv, D]
    vn = vn_ref[0].astype(v_hbm.dtype)
    wk_ref[...] = kn[:, None, :]
    wv_ref[...] = vn[:, None, :]
    kdq = kn.astype(jnp.float32)                              # what readers see
    vdq = vn.astype(jnp.float32)

    def rd(buf, hbm, slot_, page_idx, sem):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[li, page], buf.at[slot_], sem)

    def body(p, _, sems):
        sl = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            rd(k_buf, k_hbm, nxt, p + 1, sems.at[nxt, 0]).start()
            rd(v_buf, v_hbm, nxt, p + 1, sems.at[nxt, 1]).start()

        rd(k_buf, k_hbm, sl, p, sems.at[sl, 0]).wait()
        rd(v_buf, v_hbm, sl, p, sems.at[sl, 1]).wait()

        col = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        valid = (col < seq_len) & (col != pos_new)
        vcol = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (page_size, 1), 0)
        vkeep = vcol != pos_new

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)
            k = k_buf[sl, h].astype(jnp.float32)
            v = jnp.where(vkeep, v_buf[sl, h].astype(jnp.float32), 0.0)
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

    def run(sems, wsems):
        writes = [
            pltpu.make_async_copy(
                wk_ref, ko_hbm.at[li, page_w, :, pl.ds(off_w, 1), :],
                wsems.at[0]),
            pltpu.make_async_copy(
                wv_ref, vo_hbm.at[li, page_w, :, pl.ds(off_w, 1), :],
                wsems.at[1]),
        ]

        @pl.when(slot >= 0)
        def _write():
            for w in writes:
                w.start()

        rd(k_buf, k_hbm, 0, 0, sems.at[0, 0]).start()
        rd(v_buf, v_hbm, 0, 0, sems.at[0, 1]).start()
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages, lambda p, c: body(p, c, sems), 0)

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)
            s_new = jnp.sum(q * kdq[h][None, :], -1,
                            keepdims=True) * sm_scale
            mh_prev = m_ref[h * g:(h + 1) * g, :]
            mh = jnp.maximum(mh_prev, s_new)
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(s_new - mh)
            l_ref[h * g:(h + 1) * g, :] = (
                l_ref[h * g:(h + 1) * g, :] * alpha + pexp)
            acc_ref[h * g:(h + 1) * g, :] = (
                acc_ref[h * g:(h + 1) * g, :] * alpha
                + pexp * vdq[h][None, :])

        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

        @pl.when(slot >= 0)
        def _drain():
            for w in writes:
                w.wait()

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF, 2)),
                  pltpu.SemaphoreType.DMA((2,)))


def decode_fused_v4(q, k_new, v_new, k_cache, v_cache, seq_lens, block_table,
                    slot_mapping, layer_idx, sm_scale, page_size):
    """bf16 fused scatter+attend over aliased stacked caches [L, P, Hkv, ps, D].

    Same contract as decode_fused_v4_int8 without the scale planes. Returns
    (att [B, Hq, D], k_cache, v_cache)."""
    b, hq, dk = q.shape
    _, _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, *_: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, dk), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, dv), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv * g, dv), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, page_size, dv), v_cache.dtype),
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv, 1, dk), k_cache.dtype),
            pltpu.VMEM((hkv, 1, dv), v_cache.dtype),
        ],
    )
    att, kc, vc = pl.pallas_call(
        partial(_kernel_v4_bf16, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # flat operands: 4 scalars, q4=4, kn=5, vn=6, kc=7, vc=8
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      slot_mapping.astype(jnp.int32), jnp.asarray(layer_idx, jnp.int32)[None],
      q4, k_new, v_new, k_cache, v_cache)
    return att.reshape(b, hq, dv), kc, vc


def _kernel_v4b_int8(seq_lens_ref, block_table_ref, li_ref,
                     q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
                     out_ref, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
                     k_buf, v_buf, ks_buf, vs_buf, acc_ref, m_ref, l_ref,
                     *, page_size, sm_scale, hkv, g):
    del ko_hbm, vo_hbm, kso_hbm, vso_hbm   # aliased pass-through, never written
    b = pl.program_id(0)
    li = li_ref[0]
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)

    def rd(buf, hbm, slot_, page_idx, sem):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(hbm.at[li, page], buf.at[slot_], sem)

    def body(p, _, sems):
        sl = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + 1, NBUF)

        @pl.when(p + 1 < num_pages)
        def _start():
            rd(k_buf, k_hbm, nxt, p + 1, sems.at[nxt, 0]).start()
            rd(v_buf, v_hbm, nxt, p + 1, sems.at[nxt, 1]).start()
            rd(ks_buf, ks_hbm, nxt, p + 1, sems.at[nxt, 2]).start()
            rd(vs_buf, vs_hbm, nxt, p + 1, sems.at[nxt, 3]).start()

        rd(k_buf, k_hbm, sl, p, sems.at[sl, 0]).wait()
        rd(v_buf, v_hbm, sl, p, sems.at[sl, 1]).wait()
        rd(ks_buf, ks_hbm, sl, p, sems.at[sl, 2]).wait()
        rd(vs_buf, vs_hbm, sl, p, sems.at[sl, 3]).wait()

        col = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (g, page_size), 1)
        valid = col < seq_len

        for h in range(hkv):
            q = q_ref[0, h].astype(jnp.float32)
            ks = ks_buf[sl, h].astype(jnp.float32)
            vs = vs_buf[sl, h].astype(jnp.float32)
            k = k_buf[sl, h].astype(jnp.float32) * ks.reshape(page_size, 1)
            v = v_buf[sl, h].astype(jnp.float32) * vs.reshape(page_size, 1)
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
        rd(k_buf, k_hbm, 0, 0, sems.at[0, 0]).start()
        rd(v_buf, v_hbm, 0, 0, sems.at[0, 1]).start()
        rd(ks_buf, ks_hbm, 0, 0, sems.at[0, 2]).start()
        rd(vs_buf, vs_hbm, 0, 0, sems.at[0, 3]).start()
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        jax.lax.fori_loop(0, num_pages, lambda p, c: body(p, c, sems), 0)
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                      ).astype(out_ref.dtype)

    pl.run_scoped(run, pltpu.SemaphoreType.DMA((NBUF, 4)))


def scatter_stacked_int8(k, v, k_cache, v_cache, k_scales, v_scales,
                         layer_idx, slot_mapping):
    """Quantize + scatter the new tokens straight into the STACKED caches
    (one XLA scatter at [layer_idx, page, :, off]; quantization bit-identical
    to reshape_and_cache_gqa_page_major_int8)."""
    _, num_pages, hkv, ps, d = k_cache.shape
    page = jnp.where(slot_mapping >= 0, slot_mapping // ps, num_pages)
    off = jnp.where(slot_mapping >= 0, slot_mapping % ps, 0)

    def q8(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-7) / 127.0
        qv = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
        return qv.astype(jnp.int8), scale[..., 0]

    kq, ks = q8(k)
    vq, vs = q8(v)
    k_cache = k_cache.at[layer_idx, page, :, off].set(kq, mode="drop")
    v_cache = v_cache.at[layer_idx, page, :, off].set(vq, mode="drop")
    k_scales = k_scales.at[layer_idx, page, :, 0, off].set(
        ks.astype(k_scales.dtype), mode="drop")
    v_scales = v_scales.at[layer_idx, page, :, 0, off].set(
        vs.astype(v_scales.dtype), mode="drop")
    return k_cache, v_cache, k_scales, v_scales


def decode_v4b_int8(q, k_cache, v_cache, k_scales, v_scales,
                    seq_lens, block_table, layer_idx, sm_scale, page_size):
    """Attend over the STACKED int8 caches with pass-through aliasing.

    The caches (already containing this step's tokens via
    scatter_stacked_int8) are declared as aliased outputs the kernel never
    writes: XLA keeps the scatter in place and hands the same buffers through
    the scan carry — no defensive copy, no per-layer slice (the 4x-regression
    failure mode of an UNALIASED stacked-cache kernel, ROADMAP §3), and no
    sub-sublane write DMAs (Mosaic rejects single-row HBM writes — v5e
    verified: "slice along dim 3 must be aligned to tiling (8)").
    Returns (att [B, Hq, D], k_cache, v_cache, k_scales, v_scales).
    """
    b, hq, dk = q.shape
    _, _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, *_: (bb, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv * g, dv), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
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
    att, kc, vc, ks, vs = pl.pallas_call(
        partial(_kernel_v4b_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
            jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
        ],
        # flat operands: 3 scalars, q4=3, kc=4, vc=5, ks=6, vs=7
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      jnp.asarray(layer_idx, jnp.int32)[None],
      q4, k_cache, v_cache, k_scales, v_scales)
    return att.reshape(b, hq, dv), kc, vc, ks, vs
