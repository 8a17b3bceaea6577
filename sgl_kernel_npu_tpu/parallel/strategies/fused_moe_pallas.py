"""Single-launch comm/compute-overlapped fused MoE kernel (Pallas).

Reference parity: aclnnFusedDeepMoe's core engineering artifact —
`csrc/deepep/ops/op_kernel/fused_deep_moe.h:38-95` drives a grouped GEMM
built on the ACT template library with `MmadAtlasA2PreloadAsyncWithCallback`
dispatch policies: token arrival (communication) overlaps GEMM tiles inside
ONE kernel, instead of a dispatch op, a GMM op and a combine op scheduled
back-to-back. That overlap is the whole point of the ~23k-LoC fused stack
(FUSED_DEEP_MOE.md:24 credits it -70 us/layer at bs=32).

TPU realisation (ONE pallas_call per shard, grid=(1,)):

  phase S (send):   my chunk-aligned BF16 send buffer streams to every
                    peer's receive window in CHUNK-row remote DMAs, with
                    per-token INT8 absmax quant fused into the staging copy
                    (strategies/pallas_ll.py's wire protocol + the
                    reference's in-kernel QuantProcess). All sends are
                    ASYNC — the kernel moves on immediately.
  phase E (experts): for each local expert e:
                    1. start e's first GMM1 weight-tile DMA (PRELOAD — the
                       weight stream begins while e's tokens are still in
                       flight);
                    2. wait e's announced arrival chunks on e's OWN receive
                       semaphore (senders address the per-expert semaphore,
                       so arrivals for other experts can't satisfy the
                       wait — the magic/flag protocol's attribution);
                    3. GMM1 [rows_e, H]int8 x w13[e] -> dequant -> SwiGLU
                       -> per-token re-quant (VMEM-resident epilogue);
                    4. GMM2 x w2[e] -> dequant bf16;
                    5. phase C: the expert's output rows return to their
                       source ranks in CHUNK-row remote DMAs STRAIGHT FROM
                       VMEM — they never visit local HBM.
  phase W (wait):   wait for MY return chunks so the return buffer is
                    complete on exit; the final top-k weighted sum over
                    copies is a cheap XLA elementwise pass.

While expert e computes, chunks for experts e+1.. keep LANDING via the DMA
engines, and e's first weight tiles were fetched before its rows finished
arriving — communication rides entirely under the weight-bound GEMM stream.

Capacity contract: receive windows are max-token padded ([El, R*maxT, H]);
padding rows quantize to zero and are never returned (only announced counts
travel back).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode
from .low_latency import _exclusive_cumsum, _route_copies
from .pallas_ll import CHUNK, _aligned_layout


def _ceil_chunks(cnt):
    return pl.cdiv(cnt, CHUNK)


def _fused_kernel(
    send_cnt_ref, src_off_ref, dst_off_ref, recv_cnt_ref, back_off_ref,
    x_ref, w13_ref, w13s_ref, w2_ref, w2s_ref,
    recv_ref, rs_ref, back_ref,
    stage_buf, qchunk, schunk, act_buf, asc_buf, wbuf, ug_buf, act2_buf,
    acc_ref, out_buf,
    local_sem, wsem, send_sem, psem, s_send_sem, ssem, b_send_sem, b_recv_sem,
    *, num_ranks, num_local_experts, maxt, h, f, bm, bk, bn,
):
    """See module docstring. Scalar refs (all [R*El] int32):
      send_cnt  rows I send per (dst, e) slice
      src_off   chunk-aligned offsets into x_ref
      dst_off   slot offsets in the receiver's window
      recv_cnt  rows I receive per (src, e) (layout_range)
      back_off  where my return rows land in each source's back buffer
    """
    r, el = num_ranks, num_local_experts
    f2 = 2 * f
    rows_per_e = r * maxt
    m_tiles = rows_per_e // bm
    k1_tiles = h // bk
    n1_tiles = f2 // bn
    k2_tiles = f // bk
    n2_tiles = h // bn

    # ---------------- phase S: stream my slices out (async, in-kernel quant)
    def send_slice(i, _):
        dst = i // el
        e_of = i - dst * el
        cnt = send_cnt_ref[i]
        soff = src_off_ref[i]
        doff = dst_off_ref[i]

        def per_chunk(c, __):
            # alignment-proof form — see strategies/pallas_ll.py per_chunk
            src0 = (soff // CHUNK) * CHUNK + c * CHUNK
            dst0 = (doff // CHUNK) * CHUNK + c * CHUNK
            st = pltpu.make_async_copy(
                x_ref.at[pl.ds(src0, CHUNK), :], stage_buf, local_sem)
            st.start()
            st.wait()
            xb = stage_buf[...].astype(jnp.float32)
            amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
            scale = jnp.maximum(amax, 1e-7) / 127.0
            qchunk[...] = jnp.clip(jnp.round(xb / scale),
                                   -128, 127).astype(jnp.int8)
            # 128-lane f32 scale wire (Mosaic rejects 1-lane f32 DMAs —
            # see strategies/pallas_ll.py)
            schunk[...] = jnp.broadcast_to(scale, schunk.shape)
            # the receiver waits on ITS per-expert semaphore: address it by
            # the destination expert slot (SPMD-symmetric scratch)
            rd = pltpu.make_async_remote_copy(
                src_ref=qchunk, dst_ref=recv_ref.at[pl.ds(dst0, CHUNK), :],
                send_sem=send_sem, recv_sem=psem.at[e_of], device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rd.start()
            rd.wait_send()
            sd = pltpu.make_async_remote_copy(
                src_ref=schunk, dst_ref=rs_ref.at[pl.ds(dst0, CHUNK), :],
                send_sem=s_send_sem, recv_sem=ssem.at[e_of], device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            sd.start()
            sd.wait_send()
            return __

        jax.lax.fori_loop(0, _ceil_chunks(cnt), per_chunk, 0)
        return _

    jax.lax.fori_loop(0, r * el, send_slice, 0)

    # weight tile DMA helpers: one global double-buffer chain per GEMM,
    # indexed by a running tile counter (slot parity stays correct for odd
    # k-tile counts too)
    def w_start(wref, e, kt, nt, slot):
        pltpu.make_async_copy(
            wref.at[e, pl.ds(kt * bk, bk), pl.ds(nt * bn, bn)],
            wbuf.at[slot], wsem.at[slot]).start()

    def w_wait(wref, e, kt, nt, slot):
        pltpu.make_async_copy(
            wref.at[e, pl.ds(kt * bk, bk), pl.ds(nt * bn, bn)],
            wbuf.at[slot], wsem.at[slot]).wait()

    def gemm(wref, wsref, in_buf, k_tiles, n_tiles, e, epilogue, row_scale):
        """Tiled [bm, K] x w[e] with double-buffered weight DMAs.
        epilogue(nt, deq_f32_block) stores the [bm, bn] dequantized block.
        The FIRST tile must already be in flight (preload)."""
        def n_loop(nt, _):
            def k_loop(kt, __):
                idx = nt * k_tiles + kt
                slot = jax.lax.rem(idx, 2)
                w_wait(wref, e, kt, nt, slot)
                nxt = jax.lax.rem(idx + 1, 2)

                @pl.when(kt + 1 < k_tiles)
                def _():
                    w_start(wref, e, kt + 1, nt, nxt)

                @pl.when((kt + 1 == k_tiles) & (nt + 1 < n_tiles))
                def _():
                    w_start(wref, e, 0, nt + 1, nxt)

                @pl.when(kt == 0)
                def _():
                    acc_ref[...] = jnp.zeros_like(acc_ref)
                xa = in_buf[:, pl.ds(kt * bk, bk)]
                acc_ref[...] += jax.lax.dot_general(
                    xa, wbuf[slot], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return __

            jax.lax.fori_loop(0, k_tiles, k_loop, 0)
            ws = wsref[e, 0, pl.ds(nt * bn, bn)]
            deq = acc_ref[...].astype(jnp.float32) * row_scale * ws[None, :]
            epilogue(nt, deq)
            return _

        jax.lax.fori_loop(0, n_tiles, n_loop, 0)

    def expert(e, _):
        # PRELOAD: e's first GMM1 weight tile streams before the token wait
        w_start(w13_ref, e, 0, 0, 0)

        # flag protocol: wait e's announced chunks on e's OWN semaphores
        def wait_src(src, __):
            cnt = recv_cnt_ref[src * el + e]

            def wait_chunk(c, ___):
                pltpu.make_async_remote_copy(
                    src_ref=qchunk, dst_ref=recv_ref.at[pl.ds(0, CHUNK), :],
                    send_sem=send_sem, recv_sem=psem.at[e], device_id=src,
                    device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()
                pltpu.make_async_remote_copy(
                    src_ref=schunk, dst_ref=rs_ref.at[pl.ds(0, CHUNK), :],
                    send_sem=s_send_sem, recv_sem=ssem.at[e], device_id=src,
                    device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()
                return ___

            jax.lax.fori_loop(0, _ceil_chunks(cnt), wait_chunk, 0)
            return __

        jax.lax.fori_loop(0, r, wait_src, 0)

        def m_tile(mt, __):
            # the expert-level preload covers mt == 0; later m-tiles start
            # their own first-tile DMA here (before the activation staging
            # copies, so it still overlaps)
            @pl.when(mt > 0)
            def _():
                w_start(w13_ref, e, 0, 0, 0)

            slot_o = jax.lax.rem(e * m_tiles + mt, 2)

            # alignment-proof wrap on every SMEM/traced-derived ds offset
            # (Mosaic rejects unprovably-aligned dynamic DMA slices)
            row0 = ((e * rows_per_e + mt * bm) // CHUNK) * CHUNK
            st = pltpu.make_async_copy(
                recv_ref.at[pl.ds(row0, bm), :], act_buf, local_sem)
            st.start()
            st.wait()
            st2 = pltpu.make_async_copy(
                rs_ref.at[pl.ds(row0, bm), :], asc_buf, local_sem)
            st2.start()
            st2.wait()

            # ---- GMM1 -> ug_buf [bm, 2F] f32 (dequantized)
            def store_ug(nt, deq):
                ug_buf[:, pl.ds(nt * bn, bn)] = deq

            gemm(w13_ref, w13s_ref, act_buf, k1_tiles, n1_tiles, e,
                 store_ug, asc_buf[:, 0:1])

            # ---- GMM2's first weight tile streams DURING the SwiGLU (both
            # wbuf slots are idle once GMM1's n_loop returns)
            w_start(w2_ref, e, 0, 0, 0)

            # ---- SwiGLU + per-token re-quant -> act2 int8 [bm, F]
            g = ug_buf[:, pl.ds(0, f)]
            u = ug_buf[:, pl.ds(f, f)]
            act = g * jax.nn.sigmoid(g) * u
            amax2 = jnp.max(jnp.abs(act), axis=-1, keepdims=True)
            sc2 = jnp.maximum(amax2, 1e-7) / 127.0
            act2_buf[...] = jnp.clip(jnp.round(act / sc2),
                                     -128, 127).astype(jnp.int8)

            # out_buf slot reuse: drain the back-sends issued from this slot
            # two (e, mt) steps ago BEFORE overwriting it (phase-C sends are
            # fire-and-forget otherwise — VERDICT r4 next-5's "don't
            # wait_send inline")
            drain_back(e * m_tiles + mt - 2)

            def store_out(nt, deq):
                out_buf[slot_o, :, pl.ds(nt * bn, bn)] = deq.astype(
                    out_buf.dtype)

            gemm(w2_ref, w2s_ref, act2_buf, k2_tiles, n2_tiles, e,
                 store_out, sc2)

            # ---- phase C: return valid rows straight from VMEM, ASYNC —
            # the waits happen at this slot's next reuse (drain_back).
            # CHUNK-aligned rows never straddle a source's maxT region
            # (maxt % CHUNK == 0), so each chunk has ONE source.
            def back_rows(c, ___):
                row_in_e = mt * bm + c * CHUNK
                src = row_in_e // maxt
                within = row_in_e - src * maxt
                cnt_src = recv_cnt_ref[src * el + e]

                @pl.when(within < cnt_src)
                def _send():
                    boff = ((back_off_ref[src * el + e] + within)
                            // CHUNK) * CHUNK
                    pltpu.make_async_remote_copy(
                        src_ref=out_buf.at[slot_o, pl.ds(c * CHUNK, CHUNK), :],
                        dst_ref=back_ref.at[pl.ds(boff, CHUNK), :],
                        send_sem=b_send_sem, recv_sem=b_recv_sem,
                        device_id=src,
                        device_id_type=pltpu.DeviceIdType.LOGICAL).start()
                return ___

            jax.lax.fori_loop(0, bm // CHUNK, back_rows, 0)
            return __

        jax.lax.fori_loop(0, m_tiles, m_tile, 0)
        return _

    def drain_back(step):
        """wait_send for every back-DMA issued at (e, mt) = divmod(step):
        the same conditionals re-walked, waits instead of starts."""
        @pl.when(step >= 0)
        def _():
            e = step // m_tiles
            mt = step - e * m_tiles
            slot_o = jax.lax.rem(step, 2)

            def wrows(c, ___):
                row_in_e = mt * bm + c * CHUNK
                src = row_in_e // maxt
                within = row_in_e - src * maxt
                cnt_src = recv_cnt_ref[src * el + e]

                @pl.when(within < cnt_src)
                def _wait():
                    boff = ((back_off_ref[src * el + e] + within)
                            // CHUNK) * CHUNK
                    pltpu.make_async_remote_copy(
                        src_ref=out_buf.at[slot_o, pl.ds(c * CHUNK, CHUNK), :],
                        dst_ref=back_ref.at[pl.ds(boff, CHUNK), :],
                        send_sem=b_send_sem, recv_sem=b_recv_sem,
                        device_id=src,
                        device_id_type=pltpu.DeviceIdType.LOGICAL).wait_send()
                return ___

            jax.lax.fori_loop(0, bm // CHUNK, wrows, 0)

    jax.lax.fori_loop(0, el, expert, 0)
    # drain the last two slots' outstanding back-sends
    drain_back(el * m_tiles - 2)
    drain_back(el * m_tiles - 1)

    # ---------------- phase W: my dispatched rows come back processed
    def wait_back(i, _):
        cnt = send_cnt_ref[i]

        def wc(c, __):
            pltpu.make_async_remote_copy(
                src_ref=out_buf.at[0, pl.ds(0, CHUNK), :],
                dst_ref=back_ref.at[pl.ds(0, CHUNK), :],
                send_sem=b_send_sem, recv_sem=b_recv_sem,
                device_id=i // el,
                device_id_type=pltpu.DeviceIdType.LOGICAL).wait_recv()
            return __

        jax.lax.fori_loop(0, _ceil_chunks(cnt), wc, 0)
        return _

    jax.lax.fori_loop(0, r * el, wait_back, 0)


def fused_deep_moe_pallas_shard(
    x, topk_idx, topk_weights, w13_q, w13_scale, w2_q, w2_scale,
    *, axis_name, num_experts, num_ranks, num_max_dispatch_tokens_per_rank,
):
    """Per-shard single-kernel fused MoE (call inside shard_map over the EP
    axis). Same contract as fused_moe.fused_deep_moe_shard: x [T, H] bf16,
    w13_q [El, H, 2F] int8 (+[El, 2F] scales), w2_q [El, F, H] int8
    (+[El, H] scales) -> [T, H] bf16."""
    t, h = x.shape
    k = topk_idx.shape[1]
    r = num_ranks
    el = num_experts // r
    f2 = w13_q.shape[-1]
    f = f2 // 2
    maxt = num_max_dispatch_tokens_per_rank
    assert t <= maxt and (maxt % CHUNK == 0 or maxt < CHUNK)
    tk = t * k

    # routing + chunk-aligned send layout (identical to the pallas_ll tier)
    key, _ok = _route_copies(topk_idx, r, el)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    copy_of_slot = jnp.where(sorted_key < r * el, order, tk)
    copy_slot = jnp.full((tk + 1,), tk, jnp.int32).at[
        jnp.where(sorted_key < r * el, order, tk)
    ].set(jnp.arange(tk, dtype=jnp.int32), mode="drop")[:tk]
    counts = jnp.sum(jax.nn.one_hot(key, r * el + 1, dtype=jnp.int32),
                     axis=0)[: r * el].reshape(r, el)
    input_offsets = _exclusive_cumsum(counts.reshape(-1))
    aligned_offsets, aligned_pos, sbuf = _aligned_layout(
        counts.reshape(-1), input_offsets, tk, r, el, maxt)

    tok = jnp.where(copy_of_slot < tk, copy_of_slot // k, 0)
    payload = x[tok]
    x_send = jnp.zeros((sbuf + 1, h), payload.dtype).at[aligned_pos].set(
        payload, mode="drop")[:sbuf]

    # metadata exchange (== aclnnNotifyDispatch) + reverse landing offsets
    recv_counts = jax.lax.all_to_all(counts, axis_name, 0, 0, tiled=True)
    their_aligned = jax.lax.all_to_all(
        aligned_offsets.reshape(r, el), axis_name, 0, 0, tiled=True
    ).reshape(-1)
    me = jax.lax.axis_index(axis_name)
    ee = jax.lax.broadcasted_iota(jnp.int32, (r, el), 1)
    dst_off = (ee * (r * maxt) + me * maxt).reshape(-1)

    bm = min(128, r * maxt)
    while (r * maxt) % bm:
        bm //= 2
    # 1024-square weight tiles (r5): the 512 tiles left the kernel at 290
    # GB/s — 168 tile iterations/expert of ~0.3 us DMA each drowned in
    # per-iteration scalar overhead. 4x the tile bytes quarters the
    # iteration count; VMEM: wbuf 2x1 MB + acc 128x1024 int32 0.5 MB.
    bk = min(1024, h)
    while h % bk or f % bk:
        bk //= 2
    bn = min(1024, min(h, f2))
    while h % bn or f2 % bn:
        bn //= 2
    assert bm % CHUNK == 0 or bm < CHUNK, (bm, CHUNK)

    recv, rs, back = pl.pallas_call(
        partial(_fused_kernel, num_ranks=r, num_local_experts=el, maxt=maxt,
                h=h, f=f, bm=bm, bk=bk, bn=bn),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # x_send
                pl.BlockSpec(memory_space=pltpu.ANY),   # w13 (tile-DMA'd)
                # weight scales are small ([El, 2F]/[El, H] f32) — resident
                # in VMEM so epilogues can index them directly
                pl.BlockSpec((el, 1, f2), lambda s, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),   # w2 (tile-DMA'd)
                pl.BlockSpec((el, 1, h), lambda s, *_: (0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
            scratch_shapes=[
                pltpu.VMEM((CHUNK, h), x.dtype),           # stage_buf
                pltpu.VMEM((CHUNK, h), jnp.int8),          # qchunk
                pltpu.VMEM((CHUNK, 128), jnp.float32),     # schunk
                pltpu.VMEM((bm, h), jnp.int8),             # act_buf
                pltpu.VMEM((bm, 128), jnp.float32),        # asc_buf
                pltpu.VMEM((2, bk, bn), jnp.int8),         # wbuf
                pltpu.VMEM((bm, f2), jnp.float32),         # ug_buf
                pltpu.VMEM((bm, f), jnp.int8),             # act2_buf
                pltpu.VMEM((bm, bn), jnp.int32),           # acc
                pltpu.VMEM((2, bm, h), jnp.bfloat16),      # out_buf (2 slots
                # so phase-C sends of step i-2 drain while step i computes)
                pltpu.SemaphoreType.DMA(()),               # local
                pltpu.SemaphoreType.DMA((2,)),             # weight slots
                pltpu.SemaphoreType.DMA(()),               # payload send
                pltpu.SemaphoreType.DMA((el,)),            # payload recv/e
                pltpu.SemaphoreType.DMA(()),               # scale send
                pltpu.SemaphoreType.DMA((el,)),            # scale recv/e
                pltpu.SemaphoreType.DMA(()),               # back send
                pltpu.SemaphoreType.DMA(()),               # back recv
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((el * r * maxt, h), jnp.int8),
            jax.ShapeDtypeStruct((el * r * maxt, 128), jnp.float32),
            jax.ShapeDtypeStruct((sbuf, h), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=(pltpu.InterpretParams(uninitialized_memory="zero")
                   if interpret_mode() else False),
    )(counts.reshape(-1), aligned_offsets.astype(jnp.int32),
      dst_off.astype(jnp.int32), recv_counts.reshape(-1),
      their_aligned.astype(jnp.int32),
      x_send, w13_q, w13_scale.reshape(el, 1, f2).astype(jnp.float32),
      w2_q, w2_scale.reshape(el, 1, h).astype(jnp.float32))

    # top-k weighted sum over the returned copies (cheap XLA elementwise)
    row = jnp.where(copy_slot < tk,
                    aligned_pos[jnp.clip(copy_slot, 0, tk - 1)], sbuf)
    copies = back[jnp.clip(row, 0, sbuf - 1)]
    w = jnp.where(topk_idx.reshape(-1) >= 0, topk_weights.reshape(-1), 0.0)
    w = jnp.where((copy_slot < tk) & (row < sbuf), w, 0.0)
    combined = jnp.sum(
        (copies.astype(jnp.float32) * w[:, None]).reshape(t, k, h), axis=1)
    return combined.astype(x.dtype)
