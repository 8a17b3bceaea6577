"""Normal-mode (prefill/training) EP dispatch/combine.

Reference parity:
  DefaultNormalCommStrategy (python/deep_ep/deep_ep/strategies/normal_strategy.py
  :72-133) backed by aclnnNotifyDispatch + aclnnCamMoeDispatchNormal /
  aclnnCamMoeCombineNormal (csrc/deepep/deep_ep.cpp:175-388,524-580), and the
  AlltoAllNormalCommStrategy pure-collective fallback (normal_strategy.py:435-760).

TPU-native design:
  * The count exchange (aclnnNotifyDispatch) is an all_gather of the RxR
    send-count matrix — a few KB on ICI.
  * The payload dispatch (CamMoeDispatchNormal's direct peer-window writes) is
    `jax.lax.ragged_all_to_all`: XLA moves exactly the valid bytes over ICI,
    which is the same thing the reference's UB-staged HCCS window writes do.
  * The reference stalls on two `.item()` D2H syncs to size outputs
    (deep_ep.cpp:298-303) — here shapes are static by design: the receive
    buffer holds capacity_factor * T * min(K, R) rows and counts ride in a
    handle. No host sync anywhere on the path.
  * Per-token INT8 comm quant (QuantProcess in-kernel) is a fused VPU pass
    before the gather into the send buffer.

A token routed to multiple experts on one rank is sent to that rank ONCE
(dedup by is_token_in_rank); combine scales each received row by the sum of its
received topk_weights and reduces the per-rank copies at the source by
addition — exactly the semantics asserted by the reference's
tests/python/deepep/test_intranode.py:412-441.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...ops.quant import per_token_quant_int8
from ..layout import get_dispatch_layout
from ..comm import ragged_all_to_all
from ..strategy import (
    NormalEPCommStrategy,
    register_normal_strategy,
)

BIG = jnp.int32(2**30)


@dataclass
class DispatchHandle:
    """Everything combine needs to reverse the dispatch (ref handle tuple,
    normal_strategy.py: the rank_prefix_matrix etc.)."""

    send_slot_token: Any      # [SBUF] source token id per send slot (T = invalid)
    send_valid: Any           # [SBUF] bool
    send_counts: Any          # [R] rows I sent to each rank
    input_offsets: Any        # [R]
    output_offsets: Any       # [R] where my block starts in each receiver
    recv_sizes: Any           # [R] rows received from each rank
    recv_offsets: Any         # [R]
    num_tokens: int           # T (static)
    topk: int                 # K (static)
    sbuf: int                 # send capacity (static)
    rbuf: int                 # recv capacity (static)
    overflow: Any = None      # per-rank bool (facade-attached; None inside jit)


@dataclass
class DispatchResult:
    recv_x: Any                    # [RBUF, H] (bf16) or int8 when quantized
    recv_x_scales: Optional[Any]   # [RBUF, 1] f32 when int8
    recv_topk_idx: Any             # [RBUF, K] global ids, non-local -> -1
    recv_topk_weights: Any         # [RBUF, K] f32, non-local -> 0
    recv_count: Any                # [] total valid rows
    recv_tokens_per_expert: Any    # [E/R] counts for my local experts
    handle: DispatchHandle
    overflow: Any = False          # [] bool: arrivals exceeded rbuf (rows dropped)


def _exclusive_cumsum(x, axis=0):
    c = jnp.cumsum(x, axis=axis)
    return c - x


@register_normal_strategy("default")
class DefaultNormalCommStrategy(NormalEPCommStrategy):
    """Ragged-collective dispatch/combine (the optimized tier on TPU)."""

    def dispatch(self, x, topk_idx, topk_weights, *, axis_name, num_experts,
                 num_ranks, quant_mode="bf16", capacity_factor=2.0, config=None):
        t, h = x.shape
        k = topk_idx.shape[1]
        r = num_ranks
        el = num_experts // r
        me = jax.lax.axis_index(axis_name)

        _, _, in_rank = get_dispatch_layout(topk_idx, num_experts, r)  # [T, R]
        send_counts = jnp.sum(in_rank.astype(jnp.int32), axis=0)  # [R]

        # Destination-major stable ordering of (rank, token) send pairs.
        sbuf = t * min(k, r)
        prio = jnp.where(in_rank.T, jax.lax.broadcasted_iota(jnp.int32, (r, t), 0) * t
                         + jax.lax.broadcasted_iota(jnp.int32, (r, t), 1), BIG)
        order = jnp.argsort(prio.reshape(-1), stable=True)[:sbuf]
        send_valid = jnp.take_along_axis(prio.reshape(-1), order, 0) < BIG
        send_token = jnp.where(send_valid, order % t, t)  # T = sentinel

        gather_tok = jnp.clip(send_token, 0, t - 1)
        if quant_mode == "int8":
            xq, xscale = per_token_quant_int8(x)
            send_x = xq[gather_tok]
            send_scales = xscale[gather_tok]
        else:
            send_x = x[gather_tok]
            send_scales = None
        send_idx = topk_idx[gather_tok]
        send_w = topk_weights[gather_tok]

        # Count exchange (== aclnnNotifyDispatch): RxR matrix via all_gather.
        m = jax.lax.all_gather(send_counts, axis_name)            # [R, R]
        input_offsets = _exclusive_cumsum(send_counts)            # [R]
        col_cum = _exclusive_cumsum(m, axis=0)                    # [R, R]
        output_offsets = col_cum[me, :]                           # my row offsets at receivers... see below
        # output_offsets[j] = sum_{i<me} M[i, j]: where my block starts in j's buffer.
        recv_sizes = m[:, me]                                     # [R]

        # True worst case is r*t rows (every rank sends its full batch here);
        # capacity_factor trades memory for drop-resistance below that cap.
        rbuf = min(max(int(sbuf * capacity_factor), sbuf), r * t)

        # Overflow safety (skewed routing with k < r can exceed rbuf): cap
        # per-sender offsets/sizes IN-GRAPH so ragged_all_to_all never writes
        # out of range, and surface the drop via DispatchResult.overflow. The
        # reference sizes outputs exactly (deep_ep.cpp:298-303 .item() syncs);
        # static shapes can't, so the contract is capacity + explicit flag.
        cap = jnp.int32(rbuf)
        output_offsets = jnp.minimum(output_offsets, cap)
        send_sizes_capped = jnp.minimum(send_counts, cap - output_offsets)
        arrive_cum = jnp.minimum(col_cum[:, me], cap)
        recv_sizes_capped = jnp.minimum(recv_sizes, cap - arrive_cum)
        overflow = jnp.sum(recv_sizes) > cap

        def ra2a(payload, fill=0):
            out = jnp.full((rbuf,) + payload.shape[1:], fill, payload.dtype)
            return ragged_all_to_all(
                payload, out, input_offsets, send_sizes_capped, output_offsets,
                recv_sizes_capped, axis_name=axis_name,
            )

        recv_x = ra2a(send_x)
        recv_scales = ra2a(send_scales) if send_scales is not None else None
        recv_idx = ra2a(send_idx, fill=-1)
        recv_w = ra2a(send_w)

        # Receiver-side masking: keep only my local experts.
        local_lo = me * el
        is_local = (recv_idx >= local_lo) & (recv_idx < local_lo + el)
        recv_count = jnp.sum(recv_sizes_capped)
        row_valid = jnp.arange(rbuf) < recv_count
        recv_topk_idx = jnp.where(is_local & row_valid[:, None], recv_idx, -1)
        recv_topk_weights = jnp.where(recv_topk_idx >= 0, recv_w, 0.0)

        local_ids = jnp.where(recv_topk_idx >= 0, recv_topk_idx - local_lo, el)
        recv_tokens_per_expert = jnp.sum(
            jax.nn.one_hot(local_ids, el + 1, dtype=jnp.int32), axis=(0, 1)
        )[:el]

        # Capped sizes in the handle keep combine's reverse transfer consistent
        # with what actually landed (first-n-rows-of-block semantics).
        handle = DispatchHandle(
            send_slot_token=send_token, send_valid=send_valid,
            send_counts=send_sizes_capped, input_offsets=input_offsets,
            output_offsets=output_offsets, recv_sizes=recv_sizes_capped,
            recv_offsets=arrive_cum, num_tokens=t, topk=k, sbuf=sbuf, rbuf=rbuf,
        )
        return DispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            recv_topk_idx=recv_topk_idx, recv_topk_weights=recv_topk_weights,
            recv_count=recv_count, recv_tokens_per_expert=recv_tokens_per_expert,
            handle=handle, overflow=overflow,
        )

    def combine(self, x, handle, topk_weights, *, axis_name, config=None):
        hd: DispatchHandle = handle
        rbuf, h = x.shape
        assert rbuf == hd.rbuf

        # Weighted rows (ref CamMoeCombineNormal ReadBufferAndWeightedSum).
        w_row = jnp.sum(topk_weights, axis=-1, keepdims=True)
        y = (x.astype(jnp.float32) * w_row).astype(x.dtype)

        # Reverse ragged a2a: my per-src receive blocks go back to their senders'
        # original send slots.
        their_input_offset_for_me = jax.lax.all_to_all(
            hd.input_offsets, axis_name, 0, 0, tiled=True
        )
        out = jnp.zeros((hd.sbuf, h), y.dtype)
        back = ragged_all_to_all(
            y, out, hd.recv_offsets, hd.recv_sizes,
            their_input_offset_for_me, hd.send_counts, axis_name=axis_name,
        )
        wout = jnp.zeros((hd.sbuf, topk_weights.shape[1]), topk_weights.dtype)
        back_w = ragged_all_to_all(
            topk_weights, wout, hd.recv_offsets, hd.recv_sizes,
            their_input_offset_for_me, hd.send_counts, axis_name=axis_name,
        )

        # Scatter-add the returned copies to source token rows.
        seg = jnp.where(hd.send_valid, hd.send_slot_token, hd.num_tokens)
        combined = jax.ops.segment_sum(
            back.astype(jnp.float32), seg, num_segments=hd.num_tokens + 1
        )[: hd.num_tokens]
        combined_w = jax.ops.segment_sum(
            back_w, seg, num_segments=hd.num_tokens + 1
        )[: hd.num_tokens]
        return combined.astype(x.dtype), combined_w


@register_normal_strategy("alltoall")
class AllToAllNormalCommStrategy(DefaultNormalCommStrategy):
    """Dense-padded `lax.all_to_all` oracle (ref AlltoAllNormalCommStrategy,
    normal_strategy.py:435-760 — the pure-framework-collective fallback used to
    cross-check the optimized kernels).

    Produces the identical DispatchResult contract as the default strategy but
    moves fixed [R, T, H] padded blocks instead of ragged slices.
    """

    def dispatch(self, x, topk_idx, topk_weights, *, axis_name, num_experts,
                 num_ranks, quant_mode="bf16", capacity_factor=2.0, config=None):
        t, h = x.shape
        k = topk_idx.shape[1]
        r = num_ranks
        el = num_experts // r
        me = jax.lax.axis_index(axis_name)

        _, _, in_rank = get_dispatch_layout(topk_idx, num_experts, r)
        send_counts = jnp.sum(in_rank.astype(jnp.int32), axis=0)

        # Dense send blocks: slot i of block r = i-th token routed to rank r.
        # Scatter dense_tok[r, slot[t, r]] = t where in_rank[t, r]; entries for
        # unrouted (t, r) pairs aim at column t (out of range -> dropped).
        slot = _exclusive_cumsum(in_rank.astype(jnp.int32), axis=0)  # [T, R]
        tok_ids = jnp.arange(t)
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, r), 1).reshape(-1)
        cols = jnp.where(in_rank, slot, t).reshape(-1)
        vals = jnp.broadcast_to(tok_ids[:, None], (t, r)).reshape(-1)
        dense_tok = jnp.full((r, t), t, jnp.int32).at[rows, cols].set(vals, mode="drop")

        gather_tok = jnp.clip(dense_tok, 0, t - 1)
        if quant_mode == "int8":
            xq, xscale = per_token_quant_int8(x)
            send_x = xq[gather_tok]
            send_scales = xscale[gather_tok]
        else:
            send_x = x[gather_tok]
            send_scales = None
        send_idx = jnp.where((dense_tok < t)[..., None], topk_idx[gather_tok], -1)
        send_w = topk_weights[gather_tok]

        a2a = lambda p: jax.lax.all_to_all(p, axis_name, 0, 0, tiled=True)
        recv_x_d = a2a(send_x)          # [R*T, H] grouped by src rank
        recv_idx_d = a2a(send_idx).reshape(r, t, k)
        recv_w_d = a2a(send_w).reshape(r, t, k)
        recv_scales_d = a2a(send_scales).reshape(r, t, 1) if send_scales is not None else None
        m = jax.lax.all_gather(send_counts, axis_name)
        recv_sizes = m[:, me]

        # Compact dense blocks into the ragged contract.
        rbuf = min(max(int(t * min(k, r) * capacity_factor), t * min(k, r)), r * t)
        valid_d = (jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
                   < recv_sizes[:, None])
        prio = jnp.where(valid_d, jax.lax.broadcasted_iota(jnp.int32, (r, t), 0) * t
                         + jax.lax.broadcasted_iota(jnp.int32, (r, t), 1), BIG)
        order = jnp.argsort(prio.reshape(-1), stable=True)[:rbuf]
        ok = jnp.take_along_axis(prio.reshape(-1), order, 0) < BIG
        gat = jnp.clip(order, 0, r * t - 1)

        recv_x = jnp.where(ok[:, None], recv_x_d.reshape(r * t, h)[gat], 0)
        recv_idx = jnp.where(ok[:, None], recv_idx_d.reshape(r * t, k)[gat], -1)
        recv_w = jnp.where(ok[:, None], recv_w_d.reshape(r * t, k)[gat], 0.0)
        recv_scales = (jnp.where(ok[:, None], recv_scales_d.reshape(r * t, 1)[gat], 0.0)
                       if recv_scales_d is not None else None)

        local_lo = me * el
        is_local = (recv_idx >= local_lo) & (recv_idx < local_lo + el)
        recv_topk_idx = jnp.where(is_local, recv_idx, -1)
        recv_topk_weights = jnp.where(recv_topk_idx >= 0, recv_w, 0.0)
        local_ids = jnp.where(recv_topk_idx >= 0, recv_topk_idx - local_lo, el)
        recv_tokens_per_expert = jnp.sum(
            jax.nn.one_hot(local_ids, el + 1, dtype=jnp.int32), axis=(0, 1)
        )[:el]

        # Handle mirrors the default strategy's so combine() is shared.
        sbuf = t * min(k, r)
        prio_s = jnp.where(in_rank.T, jax.lax.broadcasted_iota(jnp.int32, (r, t), 0) * t
                           + jax.lax.broadcasted_iota(jnp.int32, (r, t), 1), BIG)
        order_s = jnp.argsort(prio_s.reshape(-1), stable=True)[:sbuf]
        send_valid = jnp.take_along_axis(prio_s.reshape(-1), order_s, 0) < BIG
        send_token = jnp.where(send_valid, order_s % t, t)
        # Same overflow capping as the default strategy: combine's reverse
        # ragged transfer must never index past the rbuf-row buffer.
        cap = jnp.int32(rbuf)
        out_off = jnp.minimum(_exclusive_cumsum(m, axis=0)[me, :], cap)
        arr_cum = jnp.minimum(_exclusive_cumsum(recv_sizes), cap)
        handle = DispatchHandle(
            send_slot_token=send_token, send_valid=send_valid,
            send_counts=jnp.minimum(send_counts, cap - out_off),
            input_offsets=_exclusive_cumsum(send_counts),
            output_offsets=out_off,
            recv_sizes=jnp.minimum(recv_sizes, cap - arr_cum),
            recv_offsets=arr_cum,
            num_tokens=t, topk=k, sbuf=sbuf, rbuf=rbuf,
        )
        return DispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            recv_topk_idx=recv_topk_idx, recv_topk_weights=recv_topk_weights,
            recv_count=jnp.minimum(jnp.sum(recv_sizes), rbuf),
            recv_tokens_per_expert=recv_tokens_per_expert, handle=handle,
            overflow=jnp.sum(recv_sizes) > rbuf,
        )


# ------------------------------------------------------ long-seq multi-round

def dispatch_long_seq(strategy, x, topk_idx, topk_weights, *, rounds, axis_name,
                      num_experts, num_ranks, quant_mode="bf16",
                      capacity_factor=2.0):
    """Multi-round normal dispatch for long sequences.

    Reference parity: DEEPEP_NORMAL_LONG_SEQ_ROUND
    (csrc/deepep/deep_ep.cpp:25-28,54-78; cam_moe_combine_normal_multi_round.h):
    up-to-131072-token batches are tiled through bounded comm windows in
    <=256 rounds of <=8192 tokens. Here each round is an independent ragged
    dispatch over a T/rounds slice; receive buffers stay rounds-times smaller.

    Returns a list of per-round DispatchResult (consume round-by-round, which
    is exactly how the reference overlaps expert compute with later rounds).
    """
    t = x.shape[0]
    assert t % rounds == 0, f"T={t} must divide into {rounds} rounds"
    pr = t // rounds
    out = []
    for i in range(rounds):
        sl = slice(i * pr, (i + 1) * pr)
        out.append(strategy.dispatch(
            x[sl], topk_idx[sl], topk_weights[sl], axis_name=axis_name,
            num_experts=num_experts, num_ranks=num_ranks,
            quant_mode=quant_mode, capacity_factor=capacity_factor,
        ))
    return out


def combine_long_seq(strategy, xs, handles, topk_weights_list, *, axis_name):
    """Reverse of dispatch_long_seq: per-round combine, concatenated.

    Ref: DEEPEP_NORMAL_COMBINE_ENABLE_LONG_SEQ (deep_ep.cpp:573-577)."""
    outs, wouts = [], []
    for x, hd, w in zip(xs, handles, topk_weights_list):
        o, wo = strategy.combine(x, hd, w, axis_name=axis_name)
        outs.append(o)
        wouts.append(wo)
    return jnp.concatenate(outs, axis=0), jnp.concatenate(wouts, axis=0)
