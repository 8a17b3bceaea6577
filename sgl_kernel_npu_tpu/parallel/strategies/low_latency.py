"""Low-latency (decode-path) EP dispatch/combine.

Reference parity:
  DefaultLowLatencyCommStrategy (python/deep_ep/deep_ep/strategies/
  low_latency_strategy.py:19-181) over aclnnMoeLowLatencyDispatchV2/
  aclnnMoeLowLatencyCombineV2 (csrc/deepep/deep_ep.cpp:824-977; kernels
  moe_distribute_dispatch_v2.h / moe_distribute_combine_v2.h), and the
  AllToAllLowLatencyCommStrategy fallback (:518-628).

Output contract == the reference's (§3.2 of SURVEY.md): dispatch returns a
max-token-PADDED buffer
    recv_x [num_local_experts, num_ranks * num_max_dispatch_tokens_per_rank, H]
where src rank r's tokens for local expert e occupy
    recv_x[e, r*maxT : r*maxT + layout_range[r, e]]
and validity is given by counts, never by a host sync — exactly how the
reference protects decode latency (no .item() on this path).

TPU-native realisation: one `jax.lax.ragged_all_to_all` carrying
num_local_experts slices per destination rank, whose output_offsets drop each
slice directly into its (expert, src-rank) slot. The per-token INT8/FP8 comm
quant of the reference (quantize_functions.h) is a fused VPU pass before the
send-buffer gather.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...ops import mxquant
from ...ops.quant import per_block_quant_fp8, per_token_quant_int8
from ..comm import ragged_all_to_all
from ..strategy import (
    LowLatencyEPCommStrategy,
    register_low_latency_strategy,
)

BIG = jnp.int32(2**30)


def _exclusive_cumsum(x, axis=0):
    c = jnp.cumsum(x, axis=axis)
    return c - x


def _route_copies(topk_idx, num_ranks, num_local_experts, elastic_info=None,
                  shared_expert_rank_num=0):
    """(token, k) copy -> (dst rank, local expert slot) group key.

    Reference parity: expert->rank math of moe_distribute_dispatch_v2 with the
    elasticInfo remap (moe_distribute_dispatch_v2.h:261-283) and shared-expert
    rank partitioning (deep_ep.cpp:838-846): with S shared ranks, routed
    experts live on ranks [S, R) and every token sends one extra copy to
    shared rank (token_idx %% S), stored in that rank's expert-0 slot region.

    Returns (key [T*K(+T)] int32 in [0, R*El] with R*El = drop, valid mask).
    """
    r, el = num_ranks, num_local_experts
    s = shared_expert_rank_num
    t, k = topk_idx.shape
    flat = topk_idx.reshape(-1)
    valid = flat >= 0
    g = jnp.where(valid, flat, 0)

    if elastic_info is not None:
        el_eff = jnp.where(
            elastic_info.flag > 0,
            jnp.maximum(elastic_info.moe_expert_num, 1)
            // jnp.maximum(elastic_info.new_world_size - elastic_info.shared_expert_rank_num, 1),
            el,
        )
        el_eff = jnp.maximum(el_eff, 1)
    else:
        el_eff = el
    dst_log = g // el_eff
    le = g % el_eff
    if s > 0:
        dst_log = dst_log + s  # routed experts live after the shared ranks
    if elastic_info is not None:
        from ..elastic import remap_dst_rank
        dst = remap_dst_rank(dst_log, elastic_info, r)
    else:
        dst = dst_log
    ok = valid & (le < el) & (dst < r)
    key = jnp.where(ok, dst * el + le, r * el)

    if s > 0:
        # one extra copy per token to shared rank (token %% S), expert slot 0
        shared_dst = jnp.arange(t, dtype=jnp.int32) % s
        if elastic_info is not None:
            from ..elastic import remap_dst_rank
            shared_dst = remap_dst_rank(shared_dst, elastic_info, r)
        shared_key = jnp.where(shared_dst < r, shared_dst * el, r * el)
        key = jnp.concatenate([key, shared_key])
        ok = jnp.concatenate([ok, shared_dst < r])
    return key, ok


@dataclass
class LowLatencyHandle:
    """Ref handle tuple (low_latency_strategy.py:94-101): src_info +
    layout_range + sizes."""

    copy_slot: Any        # [T*K] send-buffer slot of each (token, k) copy (or TK = invalid)
    send_counts: Any      # [R, El] my per-(dst, expert) copy counts
    input_offsets: Any    # [R*El]
    recv_counts: Any      # [R, El] per-(src, local expert) received counts (layout_range)
    num_tokens: int
    topk: int
    max_tokens: int       # maxT (static)
    num_local_experts: int
    num_ranks: int


@dataclass
class LowLatencyDispatchResult:
    recv_x: Any                  # [El, R*maxT, H] bf16 | int8
    recv_x_scales: Optional[Any] # [El, R*maxT] f32 (int8 mode)
    packed_recv_count: Any       # [El] valid tokens per local expert
    layout_range: Any            # [R, El] per-(src, expert) counts
    handle: LowLatencyHandle


@register_low_latency_strategy("default")
class DefaultLowLatencyCommStrategy(LowLatencyEPCommStrategy):
    def low_latency_dispatch(self, x, topk_idx, *, axis_name, num_experts,
                             num_ranks, num_max_dispatch_tokens_per_rank,
                             quant_mode="bf16", elastic_info=None,
                             shared_expert_rank_num=0):
        t, h = x.shape
        k = topk_idx.shape[1]
        r = num_ranks
        s = shared_expert_rank_num
        el = (num_experts // (r - s)) if s > 0 else num_experts // r
        me = jax.lax.axis_index(axis_name)
        maxt = num_max_dispatch_tokens_per_rank
        assert t <= maxt, f"T={t} exceeds num_max_dispatch_tokens_per_rank={maxt}"
        tk = t * k + (t if s > 0 else 0)   # +1 shared copy per token

        key, _ok = _route_copies(topk_idx, r, el, elastic_info, s)

        # Stable sort copies by (dst, expert): the send buffer layout.
        order = jnp.argsort(key, stable=True)                  # [T*K]
        sorted_key = key[order]
        copy_of_slot = jnp.where(sorted_key < r * el, order, tk)  # slot -> copy id
        # Inverse map: copy -> slot (invalid copies -> tk).
        copy_slot = jnp.full((tk + 1,), tk, jnp.int32).at[
            jnp.where(sorted_key < r * el, order, tk)
        ].set(jnp.arange(tk, dtype=jnp.int32), mode="drop")[:tk]

        counts = jnp.sum(jax.nn.one_hot(key, r * el + 1, dtype=jnp.int32), axis=0)[: r * el]
        counts = counts.reshape(r, el)
        input_offsets = _exclusive_cumsum(counts.reshape(-1))

        tok = jnp.where(
            copy_of_slot < t * k, copy_of_slot // k, copy_of_slot - t * k)
        tok = jnp.where(copy_of_slot < tk, jnp.clip(tok, 0, t - 1), 0)
        send_scales = send_scales2d = None
        if quant_mode == "int8":
            xq, xs = per_token_quant_int8(x)
            send_x = xq[tok]
            send_scales = xs[tok][:, 0]
        elif quant_mode == "fp8":
            # per-token FP8-E4M3 comm quant (ref quant modes MXFP8/per-token-FP8,
            # deep_ep.cpp:13-19; block routines quantize_functions.h:62-380)
            x32 = x.astype(jnp.float32)
            absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
            xs8 = jnp.maximum(absmax, 1e-7) / 448.0
            xq8 = (x32 / xs8).astype(jnp.float8_e4m3fn)
            send_x = xq8[tok]
            send_scales = xs8[tok][:, 0]
        elif quant_mode in ("mxfp8", "mxfp4"):
            # OCP MX block-32 quant (ref deep_ep.cpp:13-19 MXFP8/MXFP4 modes,
            # quantize_functions.h:62-380): payload fp8 (1 B/elt) or packed
            # fp4 (0.5 B/elt), E8M0 uint8 scales ride a second ragged a2a.
            qf, sf = (mxquant.quantize_mxfp8(x) if quant_mode == "mxfp8"
                      else mxquant.quantize_mxfp4(x))
            send_x = qf[tok]
            send_scales2d = sf[tok]
        else:
            send_x = x[tok]

        # Per-destination slice offsets: slice (dst, e) lands at
        # [e, me*maxT] of dst's [El, R*maxT, H] output.
        ee = jax.lax.broadcasted_iota(jnp.int32, (r, el), 1)
        output_offsets = (ee * (r * maxt) + me * maxt).reshape(-1)
        # ragged_all_to_all expects recv_sizes[(src, slice)] = size of slice
        # `slice` arriving from rank `src`; slice index here is the local expert.
        recv_counts = jax.lax.all_to_all(counts, axis_name, 0, 0, tiled=True)  # [R, El]
        recv_sizes = recv_counts.reshape(-1)

        hp = send_x.shape[-1]   # payload width (H; H/2 packed for mxfp4)
        out = jnp.zeros((el * r * maxt, hp), send_x.dtype)
        recv_x = ragged_all_to_all(
            send_x, out, input_offsets, counts.reshape(-1),
            output_offsets, recv_sizes, axis_name=axis_name,
        ).reshape(el, r * maxt, hp)

        recv_scales = None
        if send_scales is not None:
            sout = jnp.zeros((el * r * maxt,), jnp.float32)
            recv_scales = ragged_all_to_all(
                send_scales, sout, input_offsets, counts.reshape(-1),
                output_offsets, recv_sizes, axis_name=axis_name,
            ).reshape(el, r * maxt)
        elif send_scales2d is not None:
            sw = send_scales2d.shape[-1]
            sout = jnp.zeros((el * r * maxt, sw), send_scales2d.dtype)
            recv_scales = ragged_all_to_all(
                send_scales2d, sout, input_offsets, counts.reshape(-1),
                output_offsets, recv_sizes, axis_name=axis_name,
            ).reshape(el, r * maxt, sw)

        packed_recv_count = jnp.sum(recv_counts, axis=0)  # [El]
        handle = LowLatencyHandle(
            copy_slot=copy_slot, send_counts=counts, input_offsets=input_offsets,
            recv_counts=recv_counts, num_tokens=t, topk=k, max_tokens=maxt,
            num_local_experts=el, num_ranks=r,
        )
        return LowLatencyDispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            packed_recv_count=packed_recv_count, layout_range=recv_counts,
            handle=handle,
        )

    def low_latency_combine(self, x, topk_idx, topk_weights, handle, *, axis_name):
        hd: LowLatencyHandle = handle
        el, slots, h = x.shape
        r, maxt, t, k = hd.num_ranks, hd.max_tokens, hd.num_tokens, hd.topk
        me = jax.lax.axis_index(axis_name)
        tk = hd.copy_slot.shape[0]   # t*k, or t*k + t with shared-expert ranks
        has_shared = tk > t * k

        # Reverse ragged a2a: slice (src=r', e) of my buffer goes back to rank
        # r', landing at their original send-slot offsets.
        ee = jax.lax.broadcasted_iota(jnp.int32, (r, el), 1)
        my_slice_offsets = (ee * (r * maxt)).reshape(r, el) + \
            (jax.lax.broadcasted_iota(jnp.int32, (r, el), 0) * maxt)
        # their_input_offsets[(r', e)] = rank r''s input offset of its slice to me
        their_input_offsets = jax.lax.all_to_all(
            hd.input_offsets.reshape(r, el), axis_name, 0, 0, tiled=True
        ).reshape(-1)

        out = jnp.zeros((tk, h), x.dtype)
        back = ragged_all_to_all(
            x.reshape(el * r * maxt, h), out,
            my_slice_offsets.reshape(-1), hd.recv_counts.reshape(-1),
            their_input_offsets, hd.send_counts.reshape(-1),
            axis_name=axis_name,
        )  # [T*K, H] in send-slot order

        # Un-sort to (token, k) copies and weighted-sum over k at the source
        # (ref: BF16 weighted sum in MoeLowLatencyCombine). Shared-expert
        # copies (one per token, after the T*K routed copies) add with
        # weight 1.0.
        slot = jnp.clip(hd.copy_slot, 0, tk - 1)
        copies = back[slot]                                    # [TK(+T), H]
        w_routed = jnp.where(topk_idx.reshape(-1) >= 0, topk_weights.reshape(-1), 0.0)
        if has_shared:
            w = jnp.concatenate([w_routed, jnp.ones((t,), w_routed.dtype)])
        else:
            w = w_routed
        copies = copies.astype(jnp.float32) * w[:, None]
        routed_sum = jnp.sum(copies[: t * k].reshape(t, k, h), axis=1)
        if has_shared:
            routed_sum = routed_sum + copies[t * k:]
        return routed_sum.astype(x.dtype)


@register_low_latency_strategy("alltoall")
class AllToAllLowLatencyCommStrategy(DefaultLowLatencyCommStrategy):
    """Dense `lax.all_to_all` oracle (ref AllToAllLowLatencyCommStrategy,
    low_latency_strategy.py:518-628): moves the fully padded
    [R, El, maxT, H] blocks. Same output contract; bandwidth-wasteful but a
    direct correctness cross-check for the ragged path."""

    def low_latency_dispatch(self, x, topk_idx, *, axis_name, num_experts,
                             num_ranks, num_max_dispatch_tokens_per_rank,
                             quant_mode="bf16", elastic_info=None,
                             shared_expert_rank_num=0):
        assert elastic_info is None and shared_expert_rank_num == 0, \
            "the alltoall oracle covers the base contract only"
        t, h = x.shape
        k = topk_idx.shape[1]
        r = num_ranks
        el = num_experts // r
        maxt = num_max_dispatch_tokens_per_rank
        assert t <= maxt
        tk = t * k

        flat_idx = topk_idx.reshape(-1)
        valid = flat_idx >= 0
        g = jnp.where(valid, flat_idx, 0)
        dst = g // el
        le = g % el
        key = jnp.where(valid, dst * el + le, r * el)

        order = jnp.argsort(key, stable=True)
        sorted_key = key[order]
        copy_of_slot = jnp.where(sorted_key < r * el, order, tk)
        copy_slot = jnp.full((tk + 1,), tk, jnp.int32).at[
            jnp.where(sorted_key < r * el, order, tk)
        ].set(jnp.arange(tk, dtype=jnp.int32), mode="drop")[:tk]

        counts = jnp.sum(jax.nn.one_hot(key, r * el + 1, dtype=jnp.int32), axis=0)[: r * el]
        counts = counts.reshape(r, el)
        offsets = _exclusive_cumsum(counts.reshape(-1))

        # Scatter sorted copies into dense [R, El, maxT] slots.
        slot_ids = jnp.arange(tk)
        within = slot_ids - offsets[jnp.clip(sorted_key, 0, r * el - 1)]
        dense = jnp.zeros((r * el * maxt, h), x.dtype)
        tok = jnp.where(
            copy_of_slot < t * k, copy_of_slot // k, copy_of_slot - t * k)
        tok = jnp.where(copy_of_slot < tk, jnp.clip(tok, 0, t - 1), 0)
        scale_payload = scale2d_payload = None
        if quant_mode == "int8":
            xq, xs = per_token_quant_int8(x)
            payload = xq[tok]
            scale_payload = xs[tok][:, 0]
        elif quant_mode in ("mxfp8", "mxfp4"):
            qf, sf = (mxquant.quantize_mxfp8(x) if quant_mode == "mxfp8"
                      else mxquant.quantize_mxfp4(x))
            payload = qf[tok]
            scale2d_payload = sf[tok]
        else:
            payload = x[tok]
        hp = payload.shape[-1]
        pos = jnp.where(sorted_key < r * el, sorted_key * maxt + within, r * el * maxt)
        dense = jnp.zeros((r * el * maxt, hp), payload.dtype).at[pos].set(
            payload, mode="drop")

        a2a = lambda p: jax.lax.all_to_all(p, axis_name, 0, 0, tiled=True)
        recv_dense = a2a(dense.reshape(r, el * maxt * hp)).reshape(r, el, maxt, hp)
        recv_x = recv_dense.transpose(1, 0, 2, 3).reshape(el, r * maxt, hp)

        recv_scales = None
        if scale_payload is not None:
            dense_s = jnp.zeros((r * el * maxt,), jnp.float32).at[pos].set(
                scale_payload, mode="drop")
            recv_s = a2a(dense_s.reshape(r, el * maxt)).reshape(r, el, maxt)
            recv_scales = recv_s.transpose(1, 0, 2).reshape(el, r * maxt)
        elif scale2d_payload is not None:
            sw = scale2d_payload.shape[-1]
            dense_s = jnp.zeros((r * el * maxt, sw), scale2d_payload.dtype
                                ).at[pos].set(scale2d_payload, mode="drop")
            recv_s = a2a(dense_s.reshape(r, el * maxt * sw)).reshape(r, el, maxt, sw)
            recv_scales = recv_s.transpose(1, 0, 2, 3).reshape(el, r * maxt, sw)

        recv_counts = jax.lax.all_to_all(counts, axis_name, 0, 0, tiled=True)
        handle = LowLatencyHandle(
            copy_slot=copy_slot, send_counts=counts,
            input_offsets=offsets, recv_counts=recv_counts,
            num_tokens=t, topk=k, max_tokens=maxt,
            num_local_experts=el, num_ranks=r,
        )
        return LowLatencyDispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            packed_recv_count=jnp.sum(recv_counts, axis=0),
            layout_range=recv_counts, handle=handle,
        )

    def low_latency_combine(self, x, topk_idx, topk_weights, handle, *, axis_name):
        hd: LowLatencyHandle = handle
        el, slots, h = x.shape
        r, maxt, t, k = hd.num_ranks, hd.max_tokens, hd.num_tokens, hd.topk
        tk = t * k

        # Dense reverse: [El, R*maxT] -> [R, El, maxT] -> a2a -> my copies.
        y = x.reshape(el, r, maxt, h).transpose(1, 0, 2, 3)
        back_dense = jax.lax.all_to_all(
            y.reshape(r, el * maxt * h), axis_name, 0, 0, tiled=True
        )
        back = back_dense.reshape(r * el * maxt, h)

        # Gather each copy from its dense slot.
        flat_idx = topk_idx.reshape(-1)
        valid = flat_idx >= 0
        g = jnp.where(valid, flat_idx, 0)
        key = jnp.where(valid, (g // el) * el + (g % el), r * el)
        offsets = hd.input_offsets
        slot = jnp.clip(hd.copy_slot, 0, tk - 1)
        within = slot - offsets[jnp.clip(key, 0, r * el - 1)]
        pos = jnp.clip(key * maxt + within, 0, r * el * maxt - 1)
        copies = back[pos].astype(jnp.float32)
        w = jnp.where(valid, topk_weights.reshape(-1), 0.0)
        combined = jnp.sum((copies * w[:, None]).reshape(t, k, h), axis=1)
        return combined.astype(x.dtype)
