"""Pallas ICI low-latency dispatch/combine — the custom-kernel tier.

STATUS: kernel pair complete (dispatch + combine). The data-dependent
chunk-count protocol (the real design) runs EVERYWHERE: on real TPU slices,
in single-chip loopback on the real TPU (self-targeted remote DMA exercises
descriptors/semaphores without a slice), and off-TPU under
`pltpu.InterpretParams` — the TPU-interpret simulator models per-device
shared memory, remote DMAs and semaphores with real cross-device semantics,
so asymmetric (per-rank data-dependent) traffic validates on the CPU test
mesh at EP ∈ {2,4,8} (tests/test_pallas_ll.py). Round-2 history: the plain
`interpret=True` interpreter accounted DMA semaphores sender-locally, which
forced a symmetric-padded fallback off-TPU; that fallback is deleted.

Reference parity: the optimized tier of the strategy stack
(DefaultLowLatencyCommStrategy's aclnnMoeLowLatencyDispatchV2/
aclnnMoeLowLatencyCombineV2 custom kernels,
csrc/deepep/ops/op_kernel/moe_distribute_dispatch_v2.h and
moe_distribute_combine_v2.h): tokens are written DIRECTLY into peer receive
windows and receivers spin on flags. On TPU the peer window is the remote
output buffer, the write is `pltpu.make_async_remote_copy`, and the flag
protocol is semaphores — the equivalence called out in SURVEY.md §5 ("HCCS
window + flag protocol ≈ Pallas ICI remote_copy + semaphore signaling").

Protocol per rank (ONE pallas_call inside shard_map, payload + scales in the
same launch):
  1. metadata: per-(dst-rank, expert) count matrix exchanged via a tiny XLA
     all_to_all (== aclnnNotifyDispatch).
  2. payload: for each (dst, slice), stream rows in fixed-size CHUNK-row
     remote DMAs into the destination's slot region (chunked so slice sizes
     stay static while the chunk COUNT is data-dependent — the raggedness
     lives in the number of DMAs, like the reference's per-token UB writes).
  3. receivers derive how many payload chunks to expect from the count
     exchange and wait the recv semaphore down to that count.

Both directions are instances of one generic "chunked ragged remote scatter":
  dispatch: my chunk-aligned send buffer -> peer [El, R*maxT, H] slot regions
  combine:  my [El, R*maxT, H] expert outputs -> peer chunk-aligned buffers,
            then weighted-sum at the source (ref: weighted sum in
            MoeLowLatencyCombine, BF16) — the reverse wiring, same kernel.
"""

from __future__ import annotations


from functools import partial


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import env as _env
from ...utils import interpret_mode
from ..strategy import register_low_latency_strategy
from .low_latency import (
    DefaultLowLatencyCommStrategy,
    LowLatencyDispatchResult,
    LowLatencyHandle,
    _exclusive_cumsum,
    _route_copies,
)

CHUNK = 8  # rows per payload DMA


def _scatter_kernel(
    send_cnt_ref, src_off_ref, dst_off_ref, wait_cnt_ref,   # scalar prefetch
    x_ref, s_ref,               # payloads (ANY): [SRC_ROWS, H], [SRC_ROWS, 128]
    out_ref, s_out_ref,         # outputs  (ANY): [DST_ROWS, H], [DST_ROWS, 128]
    stage_buf, chunk_buf, s_chunk_buf, local_sem, s_local_sem,
    send_sem, recv_sem, s_send_sem, s_recv_sem,
    *, num_ranks, slices_per_rank, with_scales, quantize,
):
    """Generic chunked ragged remote scatter (see module docstring).

    Slice i (i = dst_rank * slices_per_rank + slice) moves
    send_cnt[i] rows from x[src_off[i]:] into dst_rank's out[dst_off[i]:] in
    CHUNK-row remote DMAs; receivers wait cdiv(wait_cnt[i], CHUNK) arrivals
    per slice. Scales (optional) ride the same loop on their own semaphores.

    quantize=True: the staged BF16 chunk is per-token-absmax INT8 quantized
    ON the VPU between the local stage copy and the remote DMA — the
    reference's in-kernel dynamic quant (QuantInit/QuantProcess,
    cam_moe_dispatch_normal.h:62-65). The int8 activation and its scales
    never exist in HBM on the send side; the XLA pre-quant pass (a full
    extra HBM round-trip over x) is gone.
    """
    spr = slices_per_rank

    def n_chunks(cnt):
        return pl.cdiv(cnt, CHUNK)

    # --- sender: stream my slices into each receiver's slot regions.
    def per_slice(i, _):
        dst = i // spr
        cnt = send_cnt_ref[i]
        src_off = src_off_ref[i]
        dst_off = dst_off_ref[i]

        def per_chunk(c, __):
            # (x // CHUNK) * CHUNK: semantically a no-op (the chunk-aligned
            # layout guarantees it) but REQUIRED for Mosaic to compile —
            # dynamic DMA offsets from SMEM scalars are rejected unless
            # their alignment is provable (chip bisect 2026-08-20; this was
            # the r3 BENCH_OPS MosaicError)
            src0 = (src_off // CHUNK) * CHUNK + c * CHUNK
            dst0 = (dst_off // CHUNK) * CHUNK + c * CHUNK
            if quantize:
                # stage bf16 rows, quantize on-VPU into the wire buffers
                stage = pltpu.make_async_copy(
                    x_ref.at[pl.ds(src0, CHUNK), :], stage_buf, local_sem)
                stage.start()
                stage.wait()
                xb = stage_buf[...].astype(jnp.float32)
                amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
                scale = jnp.maximum(amax, 1e-7) / 127.0
                chunk_buf[...] = jnp.clip(
                    jnp.round(xb / scale), -128, 127).astype(jnp.int8)
                # scale wire is a FULL 128-lane f32 tile: Mosaic rejects
                # 1-lane f32 DMA slices outright (chip bisect 2026-08-20 —
                # the second half of the r3 pallas_ll MosaicError)
                s_chunk_buf[...] = jnp.broadcast_to(
                    scale, s_chunk_buf.shape)
            else:
                stage = pltpu.make_async_copy(
                    x_ref.at[pl.ds(src0, CHUNK), :], chunk_buf, local_sem)
                stage.start()
                stage.wait()
            rdma = pltpu.make_async_remote_copy(
                src_ref=chunk_buf,
                dst_ref=out_ref.at[pl.ds(dst0, CHUNK), :],
                send_sem=send_sem,
                recv_sem=recv_sem,
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()
            if with_scales:
                if not quantize:
                    s_stage = pltpu.make_async_copy(
                        s_ref.at[pl.ds(src0, CHUNK), :], s_chunk_buf,
                        s_local_sem)
                    s_stage.start()
                    s_stage.wait()
                s_rdma = pltpu.make_async_remote_copy(
                    src_ref=s_chunk_buf,
                    dst_ref=s_out_ref.at[pl.ds(dst0, CHUNK), :],
                    send_sem=s_send_sem,
                    recv_sem=s_recv_sem,
                    device_id=dst,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
                s_rdma.start()
                s_rdma.wait_send()
            return __

        jax.lax.fori_loop(0, n_chunks(cnt), per_chunk, 0)
        return _

    jax.lax.fori_loop(0, num_ranks * spr, per_slice, 0)

    # --- receiver: wait the exact chunks announced by the count exchange,
    # via receiver-constructed descriptors (the flag protocol).
    def wait_slice(i, _):
        src = i // spr
        cnt = wait_cnt_ref[i]

        def wait_chunk(c, __):
            pltpu.make_async_remote_copy(
                src_ref=chunk_buf, dst_ref=out_ref.at[pl.ds(0, CHUNK), :],
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=src, device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            if with_scales:
                pltpu.make_async_remote_copy(
                    src_ref=s_chunk_buf,
                    dst_ref=s_out_ref.at[pl.ds(0, CHUNK), :],
                    send_sem=s_send_sem, recv_sem=s_recv_sem,
                    device_id=src, device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).wait_recv()
            return __

        jax.lax.fori_loop(0, n_chunks(cnt), wait_chunk, 0)
        return _

    jax.lax.fori_loop(0, num_ranks * spr, wait_slice, 0)


def _remote_scatter(x, scales, send_cnt, src_off, dst_off, wait_cnt, *,
                    num_ranks, slices_per_rank, out_rows, quantize=False):
    """One launch of the generic kernel. scales may be None.

    quantize=True: x is BF16/f32 and the kernel quantizes each staged chunk
    to INT8 + per-row f32 scales on the wire (scales input must be None).
    Returns (out [out_rows, H] int8, s_out [out_rows, 1] f32).

    Otherwise returns (out [out_rows, H] of x.dtype, s_out | None)."""
    src_rows, h = x.shape
    with_scales = scales is not None or quantize
    assert not (quantize and scales is not None)
    if scales is None:
        # dummy stream so the kernel signature is static (128-lane f32 tile
        # — see the scale-wire note in _scatter_kernel)
        scales = jnp.zeros((src_rows, 1), jnp.float32)
    scales = jnp.broadcast_to(scales.astype(jnp.float32), (src_rows, 128))
    wire_dtype = jnp.int8 if quantize else x.dtype

    out, s_out = pl.pallas_call(
        partial(_scatter_kernel, num_ranks=num_ranks,
                slices_per_rank=slices_per_rank, with_scales=with_scales,
                quantize=quantize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((CHUNK, h), x.dtype),
                pltpu.VMEM((CHUNK, h), wire_dtype),
                pltpu.VMEM((CHUNK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((out_rows, h), wire_dtype),
                   jax.ShapeDtypeStruct((out_rows, 128), jnp.float32)],
        # NB: no collective_id — the kernel synchronizes purely through its
        # own per-launch DMA semaphores (make_async_remote_copy), and Mosaic
        # rejects collective_id without a get_barrier_semaphore() user
        # ("collective_id has to be unspecified ... when not using a custom
        # barrier", observed on v5e in the r2 bench sweep).
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
        ),
        # Off-TPU: the TPU-interpret SIMULATOR (per-device shared memory +
        # remote-DMA/semaphore semantics), NOT the plain interpreter — plain
        # interpret accounts DMA semaphores sender-locally, deadlocking any
        # asymmetric multi-device traffic. uninitialized_memory="zero"
        # matches the zeros XLA hands a fresh HBM output buffer in practice;
        # never-written padding slots must stay finite because combine
        # multiplies gathered padding rows by weight 0 (0*NaN would poison
        # the weighted sum).
        interpret=(pltpu.InterpretParams(uninitialized_memory="zero")
                   if interpret_mode() else False),
    )(send_cnt.reshape(-1).astype(jnp.int32),
      src_off.reshape(-1).astype(jnp.int32),
      dst_off.reshape(-1).astype(jnp.int32),
      wait_cnt.reshape(-1).astype(jnp.int32),
      x, scales)
    return out, (s_out[:, 0:1] if with_scales else None)


def _aligned_layout(counts_flat, input_offsets, tk, r, el, maxt):
    """Chunk-aligned send-buffer layout, derivable from the count matrix alone
    (so combine can reconstruct it from the base handle — no extra fields).

    Returns (aligned_offsets [R*El], aligned_pos [tk] slot->row (sbuf =
    invalid), sbuf static)."""
    aligned_sizes = ((counts_flat + CHUNK - 1) // CHUNK) * CHUNK
    sbuf = tk + r * el * (CHUNK - 1) + CHUNK
    aligned_offsets = _exclusive_cumsum(aligned_sizes)
    # slot -> owning slice: slot s belongs to slice i iff
    # input_offsets[i] <= s < input_offsets[i] + counts[i].
    slot_ids = jnp.arange(tk)
    slice_of_slot = jnp.searchsorted(
        jnp.cumsum(counts_flat), slot_ids, side="right")
    slice_c = jnp.clip(slice_of_slot, 0, r * el - 1)
    total = jnp.sum(counts_flat)
    aligned_pos = jnp.where(
        slot_ids < total,
        aligned_offsets[slice_c] + (slot_ids - input_offsets[slice_c]),
        sbuf)
    return aligned_offsets, aligned_pos, sbuf


@register_low_latency_strategy("pallas")
class PallasLowLatencyCommStrategy(DefaultLowLatencyCommStrategy):
    """Custom-kernel tier: direct remote writes + semaphore flags.

    Routing/sorting stays in XLA (it is compute, not comm); the kernels own
    the wire protocol in both directions. Payload and per-token scales ride
    ONE launch (the round-1 scaffold launched twice on the latency path).
    """

    def low_latency_dispatch(self, x, topk_idx, *, axis_name, num_experts,
                             num_ranks, num_max_dispatch_tokens_per_rank,
                             quant_mode="bf16", elastic_info=None,
                             shared_expert_rank_num=0):
        """Elastic EP + shared-expert ranks are first-class here too (ref:
        elasticInfo inside the optimized kernels,
        moe_distribute_dispatch_v2.h:261-283, shared ranks deep_ep.cpp:838-846):
        both are host-side routing math (_route_copies) feeding the same wire
        kernels — the remap changes WHICH slices carry rows, not the protocol.
        """
        from ...ops.quant import per_token_quant_int8

        t, h = x.shape
        k = topk_idx.shape[1]
        r = num_ranks
        s = shared_expert_rank_num
        el = (num_experts // (r - s)) if s > 0 else num_experts // r
        maxt = num_max_dispatch_tokens_per_rank
        assert t <= maxt
        # chunked writes land in maxt-strided recv slot regions; the last
        # chunk of a full slice must not spill into the next region
        assert maxt % CHUNK == 0 or maxt < CHUNK, \
            f"maxt={maxt} must be CHUNK({CHUNK})-aligned (or < CHUNK)"
        tk = t * k + (t if s > 0 else 0)   # +1 shared copy per token

        key, _ok = _route_copies(topk_idx, r, el, elastic_info, s)
        order = jnp.argsort(key, stable=True)
        sorted_key = key[order]
        copy_of_slot = jnp.where(sorted_key < r * el, order, tk)
        copy_slot = jnp.full((tk + 1,), tk, jnp.int32).at[
            jnp.where(sorted_key < r * el, order, tk)
        ].set(jnp.arange(tk, dtype=jnp.int32), mode="drop")[:tk]

        counts = jnp.sum(jax.nn.one_hot(key, r * el + 1, dtype=jnp.int32),
                         axis=0)[: r * el].reshape(r, el)
        input_offsets = _exclusive_cumsum(counts.reshape(-1))
        # chunk-align each slice's send region so fixed-size chunk DMAs never
        # leak another slice's rows: place slice i at offset aligned to CHUNK.
        aligned_offsets, _apos, sbuf = _aligned_layout(
            counts.reshape(-1), input_offsets, tk, r, el, maxt)

        tok = jnp.where(
            copy_of_slot < t * k, copy_of_slot // k, copy_of_slot - t * k)
        tok = jnp.where(copy_of_slot < tk, jnp.clip(tok, 0, t - 1), 0)
        # In-kernel dynamic INT8 quant (default): ship the BF16 payload into
        # the kernel and let the staging copy quantize on the VPU — no XLA
        # pre-quant HBM pass (ref QuantProcess inside the dispatch kernel,
        # cam_moe_dispatch_normal.h:62-65). SKT_PALLAS_INLINE_QUANT=0 keeps
        # the XLA pre-pass for A/B.
        quant_inline = False
        if quant_mode == "int8":
            if _env.env_bool("SKT_PALLAS_INLINE_QUANT", True):
                payload = x[tok]
                scales = None
                quant_inline = True
            else:
                xq, xs = per_token_quant_int8(x)
                payload = xq[tok]
                scales = xs[tok][:, 0]
        else:
            payload = x[tok]
            scales = None

        # scatter compacted slices to chunk-aligned layout
        aligned_pos = _apos
        x_send = jnp.zeros((sbuf + 1, h), payload.dtype).at[aligned_pos].set(
            payload, mode="drop")[:sbuf]
        s_send = None
        if scales is not None:
            s_send = jnp.zeros((sbuf + 1, 1), jnp.float32).at[aligned_pos].set(
                scales[:, None], mode="drop")[:sbuf]

        # metadata exchange == aclnnNotifyDispatch: a tiny XLA all_to_all
        recv_counts = jax.lax.all_to_all(counts, axis_name, 0, 0, tiled=True)

        # dispatch wiring of the generic scatter: slice i=(dst, e) goes from
        # my aligned region to dst's [e, me*maxT] slot region.
        me = jax.lax.axis_index(axis_name)
        ee = jax.lax.broadcasted_iota(jnp.int32, (r, el), 1)
        dst_off = (ee * (r * maxt) + me * maxt).reshape(-1)
        recv_flat, s_flat = _remote_scatter(
            x_send, s_send, counts, aligned_offsets, dst_off, recv_counts,
            num_ranks=r, slices_per_rank=el, out_rows=el * r * maxt,
            quantize=quant_inline)
        recv_x = recv_flat.reshape(el, r * maxt, h)
        recv_scales = s_flat.reshape(el, r * maxt) if s_flat is not None else None

        handle = LowLatencyHandle(
            copy_slot=copy_slot, send_counts=counts,
            input_offsets=input_offsets, recv_counts=recv_counts,
            num_tokens=t, topk=k, max_tokens=maxt,
            num_local_experts=el, num_ranks=r,
        )
        return LowLatencyDispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            packed_recv_count=jnp.sum(recv_counts, axis=0),
            layout_range=recv_counts, handle=handle,
        )

    def low_latency_combine(self, x, topk_idx, topk_weights, handle, *,
                            axis_name):
        """Kernel-tier combine: reverse chunked remote scatter + weighted sum
        at the source (ref moe_distribute_combine_v2.h: producers write into
        share windows, source does the BF16 weighted reduce).

        The chunk-aligned send layout is reconstructed from the base handle's
        count matrix (the layout is a pure function of the counts), so the
        handle crossing the Buffer's shard_map boundary needs no extra fields.
        """
        hd: LowLatencyHandle = handle
        el, _slots, h = x.shape
        r, maxt, t, k = hd.num_ranks, hd.max_tokens, hd.num_tokens, hd.topk
        tk = hd.copy_slot.shape[0]   # t*k, or t*k + t with shared-expert ranks
        has_shared = tk > t * k
        aligned_offsets, aligned_pos, sbuf = _aligned_layout(
            hd.send_counts.reshape(-1), hd.input_offsets, tk, r, el, maxt)

        # Combine wiring: slice i=(src, e) of my expert outputs goes back to
        # rank src, landing at src's chunk-aligned send-slot region for
        # (me, e) — i.e. src's aligned_offsets row for me, fetched by the
        # same all_to_all trick as the default strategy's reverse offsets.
        their_aligned = jax.lax.all_to_all(
            aligned_offsets.reshape(r, el), axis_name, 0, 0, tiled=True
        ).reshape(-1)                                          # [(src, e)]
        ss = jax.lax.broadcasted_iota(jnp.int32, (r, el), 0)
        ee = jax.lax.broadcasted_iota(jnp.int32, (r, el), 1)
        src_off = (ee * (r * maxt) + ss * maxt).reshape(-1)    # my x rows
        # rows I send back per slice = what I received; rows I expect back
        # per slice = what I originally sent.
        back, _ = _remote_scatter(
            x.reshape(el * r * maxt, h), None,
            hd.recv_counts, src_off, their_aligned, hd.send_counts,
            num_ranks=r, slices_per_rank=el, out_rows=sbuf)

        # Weighted sum over the k copies at the source (+0 for invalid);
        # shared-expert copies (one per token after the T*K routed ones, ref
        # deep_ep.cpp:838-846) add with weight 1.0.
        row = jnp.where(hd.copy_slot < tk,
                        aligned_pos[jnp.clip(hd.copy_slot, 0, tk - 1)], sbuf)
        copies = back[jnp.clip(row, 0, sbuf - 1)]              # [TK(+T), H]
        w_routed = jnp.where(topk_idx.reshape(-1) >= 0,
                             topk_weights.reshape(-1), 0.0)
        if has_shared:
            w = jnp.concatenate([w_routed, jnp.ones((t,), w_routed.dtype)])
        else:
            w = w_routed
        w = jnp.where((hd.copy_slot < tk) & (row < sbuf), w, 0.0)
        copies = copies.astype(jnp.float32) * w[:, None]
        combined = jnp.sum(copies[: t * k].reshape(t, k, h), axis=1)
        if has_shared:
            combined = combined + copies[t * k:]
        return combined.astype(x.dtype)
