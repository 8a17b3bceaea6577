"""Pallas ICI low-latency dispatch/combine — the custom-kernel tier.

STATUS: EXPERIMENTAL. The wire protocol (sender-side chunked remote DMA +
receiver-side descriptor waits) follows real-TPU semaphore semantics, but this
round's environment has a single TPU chip, and Pallas interpret mode executes
devices sequentially with sender-local DMA semaphore accounting — asymmetric
RDMA traffic cannot be validated there (verified empirically: late writes to
already-snapshotted peers are lost). The `default` ragged-collective strategy
remains the production tier; this kernel is the scaffold to validate and tune
on a real multi-chip slice (round 2+).

Reference parity: the optimized tier of the strategy stack
(DefaultLowLatencyCommStrategy's aclnnMoeLowLatencyDispatchV2 custom kernels,
csrc/deepep/ops/op_kernel/moe_distribute_dispatch_v2.h): tokens are written
DIRECTLY into peer receive windows and receivers spin on flags. On TPU the
peer window is the remote output buffer, the write is
`pltpu.make_async_remote_copy`, and the flag protocol is semaphores — the
equivalence called out in SURVEY.md §5 ("HCCS window + flag protocol ≈ Pallas
ICI remote_copy + semaphore signaling").

Protocol per rank (one pallas_call inside shard_map):
  1. metadata: remote-write my per-(dst-rank, expert) count row into every
     receiver's counts buffer (== aclnnNotifyDispatch), signal its barrier.
  2. payload: for each (dst, expert) slice, stream my tokens in fixed-size
     row chunks into the destination slot region [e, me*maxT + i] of the
     receiver's [El, R*maxT, H] buffer (chunked so slice sizes stay static
     while the chunk COUNT is data-dependent — the raggedness lives in the
     number of DMAs, like the reference's per-token UB writes).
  3. receivers wait for all count rows, derive how many payload chunks to
     expect, and wait the data semaphore up to that count.

The same [El, R*maxT, H] output contract as strategies/low_latency.py, so the
XLA-collective tier is the drop-in oracle for this kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _dispatch_kernel(
    counts_ref, offsets_ref, recv_counts_ref,   # scalar prefetch
    x_send_ref,                                 # [SBUF, H] send payload (ANY)
    recv_ref,                                   # output [El*R*maxT, H] (ANY)
    chunk_buf, local_sem, send_sem, recv_sem,
    *, num_ranks, num_local_experts, max_tokens, h, axis_name, symmetric,
):
    r, el, maxt = num_ranks, num_local_experts, max_tokens
    me = jax.lax.axis_index(axis_name)

    # --- sender: stream my slices into each receiver's slot regions.
    def per_slice(i, _):
        dst = i // el
        e = jax.lax.rem(i, el)
        cnt = counts_ref[i]
        off = offsets_ref[i]
        # symmetric mode (interpret-test only): every slice moves its full
        # padded region so per-rank byte counts match — interpret-mode DMA
        # semaphores account sender-locally and desync on ragged traffic.
        n_chunks = (max_tokens + CHUNK - 1) // CHUNK if symmetric else pl.cdiv(cnt, CHUNK)

        def per_chunk(c, __):
            src0 = off + c * CHUNK
            dst0 = e * (r * maxt) + me * maxt + c * CHUNK
            stage = pltpu.make_async_copy(
                x_send_ref.at[pl.ds(src0, CHUNK), :], chunk_buf, local_sem)
            stage.start()
            stage.wait()
            rdma = pltpu.make_async_remote_copy(
                src_ref=chunk_buf,
                dst_ref=recv_ref.at[pl.ds(dst0, CHUNK), :],
                send_sem=send_sem,
                recv_sem=recv_sem,
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdma.wait_send()
            return __

        jax.lax.fori_loop(0, n_chunks, per_chunk, 0)
        return _

    jax.lax.fori_loop(0, r * el, per_slice, 0)

    # --- receiver: wait the exact chunks announced by the (XLA-side) count
    # exchange, via receiver-constructed descriptors (the flag protocol).
    def wait_slice(i, _):
        src = i // el
        e = jax.lax.rem(i, el)
        cnt = recv_counts_ref[i]
        n_chunks = (max_tokens + CHUNK - 1) // CHUNK if symmetric else pl.cdiv(cnt, CHUNK)

        def wait_chunk(c, __):
            dst0 = e * (r * maxt) + src * maxt + c * CHUNK
            pltpu.make_async_remote_copy(
                src_ref=chunk_buf, dst_ref=recv_ref.at[pl.ds(dst0, CHUNK), :],
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=src, device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            return __

        jax.lax.fori_loop(0, n_chunks, wait_chunk, 0)
        return _

    jax.lax.fori_loop(0, r * el, wait_slice, 0)


def _pallas_dispatch(x_send, counts, offsets, recv_counts, *, num_ranks,
                     num_local_experts, max_tokens, axis_name="ep",
                     symmetric=False):
    sbuf, h = x_send.shape
    r, el, maxt = num_ranks, num_local_experts, max_tokens
    out_rows = el * r * maxt
    recv = pl.pallas_call(
        partial(_dispatch_kernel, num_ranks=r, num_local_experts=el,
                max_tokens=maxt, h=h, axis_name=axis_name, symmetric=symmetric),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((CHUNK, h), x_send.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, h), x_send.dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0,
        ),
        interpret=interpret_mode(),
    )(counts.reshape(-1).astype(jnp.int32), offsets.astype(jnp.int32),
      recv_counts.reshape(-1).astype(jnp.int32), x_send)
    return recv


@register_low_latency_strategy("pallas")
class PallasLowLatencyCommStrategy(DefaultLowLatencyCommStrategy):
    """Custom-kernel tier: direct remote writes + semaphore flags.

    Routing/sorting stays in XLA (it is compute, not comm); the kernel owns
    the wire protocol. Combine currently reuses the ragged-collective path
    (reverse direction is bandwidth-symmetric); a fused combine kernel is the
    next tier.
    """

    def low_latency_dispatch(self, x, topk_idx, *, axis_name, num_experts,
                             num_ranks, num_max_dispatch_tokens_per_rank,
                             quant_mode="bf16", elastic_info=None,
                             shared_expert_rank_num=0):
        assert elastic_info is None and shared_expert_rank_num == 0, \
            "pallas tier: base contract (use 'default' for elastic/shared)"
        from ...ops.quant import per_token_quant_int8

        t, h = x.shape
        k = topk_idx.shape[1]
        r = num_ranks
        el = num_experts // r
        maxt = num_max_dispatch_tokens_per_rank
        assert t <= maxt
        tk = t * k

        key, _ok = _route_copies(topk_idx, r, el)
        order = jnp.argsort(key, stable=True)
        sorted_key = key[order]
        copy_of_slot = jnp.where(sorted_key < r * el, order, tk)
        copy_slot = jnp.full((tk + 1,), tk, jnp.int32).at[
            jnp.where(sorted_key < r * el, order, tk)
        ].set(jnp.arange(tk, dtype=jnp.int32), mode="drop")[:tk]

        from ...utils import on_tpu
        symmetric = not on_tpu()

        counts = jnp.sum(jax.nn.one_hot(key, r * el + 1, dtype=jnp.int32),
                         axis=0)[: r * el].reshape(r, el)
        input_offsets = _exclusive_cumsum(counts.reshape(-1))
        # chunk-align each slice's send region so fixed-size chunk DMAs never
        # leak another slice's rows: place slice i at offset aligned to CHUNK.
        maxt_pad = ((maxt + CHUNK - 1) // CHUNK) * CHUNK
        if symmetric:
            aligned_sizes = jnp.full((r * el,), maxt_pad, jnp.int32)
        else:
            aligned_sizes = ((counts.reshape(-1) + CHUNK - 1) // CHUNK) * CHUNK
        aligned_offsets = _exclusive_cumsum(aligned_sizes)
        sbuf = (r * el * maxt_pad if symmetric
                else tk + r * el * (CHUNK - 1) + CHUNK)

        tok = jnp.where(copy_of_slot < tk, copy_of_slot // k, 0)
        if quant_mode == "int8":
            xq, xs = per_token_quant_int8(x)
            payload = xq[tok]
            scales = xs[tok][:, 0]
        else:
            payload = x[tok]
            scales = None

        # scatter compacted slices to chunk-aligned layout
        slot_ids = jnp.arange(tk)
        slice_id = jnp.clip(sorted_key, 0, r * el - 1)
        within = slot_ids - input_offsets[slice_id]
        aligned_pos = jnp.where(sorted_key < r * el,
                                aligned_offsets[slice_id] + within, sbuf)
        x_send = jnp.zeros((sbuf + 1, h), payload.dtype).at[aligned_pos].set(
            payload, mode="drop")[:sbuf]

        # metadata exchange == aclnnNotifyDispatch: a tiny XLA all_to_all
        recv_counts = jax.lax.all_to_all(counts, axis_name, 0, 0, tiled=True)

        recv_flat = _pallas_dispatch(
            x_send, counts, aligned_offsets, recv_counts,
            num_ranks=r, num_local_experts=el, max_tokens=maxt,
            axis_name=axis_name, symmetric=symmetric)
        recv_x = recv_flat.reshape(el, r * maxt, h)

        recv_scales = None
        if scales is not None:
            s_send = jnp.zeros((sbuf + 1, 1), jnp.float32).at[aligned_pos].set(
                scales[:, None], mode="drop")[:sbuf]
            s_flat = _pallas_dispatch(
                s_send, counts, aligned_offsets, recv_counts,
                num_ranks=r, num_local_experts=el, max_tokens=maxt,
                axis_name=axis_name, symmetric=symmetric)
            recv_scales = s_flat.reshape(el, r * maxt)

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
