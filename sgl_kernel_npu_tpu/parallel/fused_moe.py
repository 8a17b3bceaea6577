"""fused_deep_moe — the full MoE layer as one jitted region.

Reference parity: Buffer.fused_deep_moe (python/deep_ep/deep_ep/buffer.py:782-898)
-> aclnnFusedDeepMoe (csrc/deepep/deep_ep.cpp:1054-1095; device pipeline
fused_deep_moe.h:38-95): InitRouting + AllToAll + GMM1(int8) +
dequant-SwiGLU-quant epilogue + GMM2 + dequant + combine, with comm overlapped
against GEMM tiles via preload-async callbacks.

TPU-native realisation: the whole layer is ONE jit region —
  low_latency_dispatch (ragged a2a, INT8 payload)
  -> compaction (InitRouting: valid slots gathered expert-major, group_list)
  -> grouped INT8 GEMM1 (ragged_dot on the MXU, int8xint8->int32)
  -> per-token-dequant + SwiGLU + re-quant epilogue (ops.activation.swiglu_quant
     math, fused by XLA into the GEMM epilogue)
  -> grouped INT8 GEMM2
  -> scatter back to the slotted layout -> low_latency_combine.
XLA's async collective scheduling overlaps the dispatch/combine collectives
with expert GEMMs of other microbatches; an explicitly double-buffered Pallas
pipeline is the next optimization tier.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.matmul import grouped_matmul_int8_pallas, grouped_matmul_int8_ref
from ..ops.quant import per_token_quant_int8
from ..utils import use_pallas
from .strategies.low_latency import LowLatencyDispatchResult


def _compact_slots(recv_counts, num_ranks, num_local_experts, max_tokens, cap):
    """Expert-major compaction of valid slots in the [El, R*maxT] layout.

    Returns (slot_ids [cap] gather indices (El*R*maxT = invalid), valid [cap],
    group_list [El] per-expert row counts)."""
    el, r, maxt = num_local_experts, num_ranks, max_tokens
    total_slots = el * r * maxt
    slot_pos = jax.lax.broadcasted_iota(jnp.int32, (el, r, maxt), 2)
    # recv_counts is [R, El]; valid[e, r, i] = i < recv_counts[r, e]
    valid = slot_pos < recv_counts.T[:, :, None]
    flat = jnp.arange(total_slots, dtype=jnp.int32).reshape(el, r, maxt)
    prio = jnp.where(valid, flat, jnp.int32(2**30))
    order = jnp.argsort(prio.reshape(-1), stable=True)[:cap]
    ok = jnp.take_along_axis(prio.reshape(-1), order, 0) < 2**30
    slot_ids = jnp.where(ok, order, total_slots)
    group_list = jnp.sum(recv_counts, axis=0)  # [El]
    return slot_ids, ok, group_list


def _compact_slots_aligned(recv_counts, num_ranks, num_local_experts,
                           max_tokens, cap, tile):
    """Like _compact_slots, but each expert's rows start at a multiple of
    `tile`, so every m-tile of the grouped Pallas GEMM is single-expert.

    Returns (slot_ids [cap_pad], valid [cap_pad], expert_per_mtile
    [cap_pad // tile]); padding rows carry zero scales -> zero output."""
    el, r, maxt = num_local_experts, num_ranks, max_tokens
    total_slots = el * r * maxt
    slot_pos = jax.lax.broadcasted_iota(jnp.int32, (el, r, maxt), 2)
    valid = slot_pos < recv_counts.T[:, :, None]
    flat = jnp.arange(total_slots, dtype=jnp.int32).reshape(el, r, maxt)
    prio = jnp.where(valid, flat, jnp.int32(2**30))
    order = jnp.argsort(prio.reshape(-1), stable=True)
    group_list = jnp.sum(recv_counts, axis=0)                  # [El]
    tight_off = jnp.cumsum(group_list) - group_list
    al_sizes = ((group_list + tile - 1) // tile) * tile
    incl = jnp.cumsum(al_sizes)
    al_off = incl - al_sizes
    cap_pad = ((cap + tile - 1) // tile + el) * tile           # static
    j = jnp.arange(cap_pad, dtype=jnp.int32)
    e = jnp.clip(jnp.searchsorted(incl, j, side="right"), 0, el - 1)
    idx = j - al_off[e]
    ok = (idx < group_list[e]) & (tight_off[e] + idx < cap)
    pos = jnp.clip(tight_off[e] + idx, 0, total_slots - 1)
    slot_ids = jnp.where(ok, order[pos], total_slots)
    eid = jnp.clip(jnp.searchsorted(
        incl, jnp.arange(cap_pad // tile, dtype=jnp.int32) * tile,
        side="right"), 0, el - 1)
    return slot_ids, ok, eid


def _expert_ffn_slotted(res: LowLatencyDispatchResult, w13_q, w13_scale,
                        w2_q, w2_scale, *, num_ranks, num_local_experts,
                        max_tokens, cap):
    """Compaction -> GMM1(int8) -> dequant-SwiGLU-quant -> GMM2 -> scatter
    back to the slotted [El, R*maxT, H] layout (the compute core of
    aclnnFusedDeepMoe, fused_deep_moe.h:59-95)."""
    r, el, maxt = num_ranks, num_local_experts, max_tokens
    h = res.recv_x.shape[-1]
    f = w13_q.shape[-1] // 2

    pallas_gmm = use_pallas()
    if pallas_gmm:
        tile = 128
        slot_ids, ok, eid = _compact_slots_aligned(
            res.layout_range, r, el, maxt, cap, tile)
    else:
        slot_ids, ok, group_list = _compact_slots(
            res.layout_range, r, el, maxt, cap)
    gat = jnp.clip(slot_ids, 0, el * r * maxt - 1)
    xq = res.recv_x.reshape(el * r * maxt, h)[gat]               # [cap, H] int8
    xs = res.recv_x_scales.reshape(el * r * maxt)[gat][:, None]  # [cap, 1]
    xq = jnp.where(ok[:, None], xq, 0)
    xs = jnp.where(ok[:, None], xs, 0.0)

    # The compaction is expert-major but group boundaries must match the
    # gathered ordering: rows of expert e are contiguous. (slot prio is
    # expert-major by construction.)
    if pallas_gmm:
        up_gate = grouped_matmul_int8_pallas(xq, w13_q, xs, w13_scale, eid)
    else:
        up_gate = grouped_matmul_int8_ref(xq, w13_q, xs, w13_scale, group_list)

    # dequant-SwiGLU-quant epilogue (GmmDeqSwigluQuant, fused_deep_moe.h:59-95)
    x1 = up_gate.astype(jnp.float32)[:, :f]
    x2 = up_gate.astype(jnp.float32)[:, f:]
    act = x1 * jax.nn.sigmoid(x1) * x2
    actq, act_scale = per_token_quant_int8(act)

    if pallas_gmm:
        y = grouped_matmul_int8_pallas(actq, w2_q, act_scale, w2_scale, eid)
    else:
        y = grouped_matmul_int8_ref(actq, w2_q, act_scale, w2_scale, group_list)

    # Scatter back into the slotted layout for combine.
    slotted = jnp.zeros((el * r * maxt + 1, h), y.dtype).at[slot_ids].set(
        jnp.where(ok[:, None], y, 0), mode="drop"
    )[: el * r * maxt]
    return slotted.reshape(el, r * maxt, h)


def fused_deep_moe_shard(
    x, topk_idx, topk_weights,
    w13_q, w13_scale, w2_q, w2_scale,
    *, strategy, axis_name, num_experts, num_ranks,
    num_max_dispatch_tokens_per_rank, capacity_rows: Optional[int] = None,
    chunk_rounds: int = 1,
):
    """Per-shard fused MoE layer (call inside shard_map over the EP axis).

    x [T, H] bf16; topk_idx/[T, K]; w13_q [El, H, 2F] int8 with
    w13_scale [El, 2F] f32; w2_q [El, F, H] int8 with w2_scale [El, H] f32.
    Returns [T, H] bf16.

    chunk_rounds > 1 software-pipelines the layer for comm/compute overlap
    (the reference's preload-async-callback core, fused_deep_moe.h:38-95, and
    the DEEPEP_NORMAL_LONG_SEQ_ROUND tiling, deep_ep.cpp:54-78): tokens are
    split into `chunk_rounds` slices, round i+1's dispatch collective is
    ISSUED before round i's expert GEMMs, so XLA's async scheduler runs the
    ragged a2a of the next slice while the MXU chews the current one. Combine
    of round i likewise overlaps GEMMs of round i+1.
    """
    t, h = x.shape
    k = topk_idx.shape[1]
    r = num_ranks
    el = num_experts // r
    maxt = num_max_dispatch_tokens_per_rank

    if chunk_rounds <= 1:
        res: LowLatencyDispatchResult = strategy.low_latency_dispatch(
            x, topk_idx, axis_name=axis_name, num_experts=num_experts,
            num_ranks=num_ranks, num_max_dispatch_tokens_per_rank=maxt,
            quant_mode="int8",
        )
        cap = capacity_rows or r * maxt * min(k, el)
        slotted = _expert_ffn_slotted(
            res, w13_q, w13_scale, w2_q, w2_scale, num_ranks=r,
            num_local_experts=el, max_tokens=maxt, cap=cap)
        return strategy.low_latency_combine(
            slotted, topk_idx, topk_weights, res.handle, axis_name=axis_name)

    assert t % chunk_rounds == 0, \
        f"T={t} must divide into {chunk_rounds} rounds"
    tr = t // chunk_rounds
    maxt_r = min(maxt, max(tr, 8))
    cap = capacity_rows or r * maxt_r * min(k, el)

    def dispatch(i):
        sl = slice(i * tr, (i + 1) * tr)
        return strategy.low_latency_dispatch(
            x[sl], topk_idx[sl], axis_name=axis_name,
            num_experts=num_experts, num_ranks=num_ranks,
            num_max_dispatch_tokens_per_rank=maxt_r, quant_mode="int8",
        )

    # Software pipeline: issue dispatch i+1, THEN compute round i — the
    # dataflow lets XLA hoist the collective start above the GEMMs.
    outs = []
    res = dispatch(0)
    for i in range(chunk_rounds):
        nxt = dispatch(i + 1) if i + 1 < chunk_rounds else None
        slotted = _expert_ffn_slotted(
            res, w13_q, w13_scale, w2_q, w2_scale, num_ranks=r,
            num_local_experts=el, max_tokens=maxt_r, cap=cap)
        sl = slice(i * tr, (i + 1) * tr)
        outs.append(strategy.low_latency_combine(
            slotted, topk_idx[sl], topk_weights[sl], res.handle,
            axis_name=axis_name))
        res = nxt
    return jnp.concatenate(outs, axis=0)


def scale_int64_to_float(scale_i64):
    """Decode the DISPATCH_FFN_COMBINE weight-scale convention: float32 bit
    patterns widened to int64 (ref test_dispatch_ffn_combine.py:61-70
    `scale_from_float_to_int64`: f32 bytes -> int32 view -> astype(int64)).
    The caller performs the forward conversion; this is the kernel-side
    decode (the reference does it on the device, dispatch_ffn_combine.h)."""
    return jax.lax.bitcast_convert_type(
        scale_i64.astype(jnp.int32), jnp.float32)


def dispatch_ffn_combine_shard(
    x, topk_idx, topk_weights,
    w13_q, w13_scale_i64, w2_q, w2_scale_i64,
    *, strategy, axis_name, num_experts, num_ranks,
    num_max_dispatch_tokens_per_rank, capacity_rows: Optional[int] = None,
):
    """Per-shard aclnnDispatchFFNCombine equivalent (FuseMode 2).

    Reference parity: csrc/deepep/ops/op_kernel/dispatch_ffn_combine.h +
    dispatch_ffn_combine_kernel/ (8.3k LoC) — the alternative single-kernel
    MoE fusion. Behavioral differences vs FUSED_DEEP_MOE (tabled in
    python/deep_ep/doc/FUSED_DEEP_MOE.md:44-52), all honored here:
      * weight scales arrive as int64 bit patterns of float32 (NOT
        auto-converted by the facade) -> decoded in-graph by
        scale_int64_to_float;
      * GMM1 weights in the standard (unpermuted) [El, H, 2F] layout — on
        TPU there is no NZ format and no tile-N permutation in either mode,
        so this is the same layout fused_deep_moe_shard consumes;
      * num_max_dispatch_tokens_per_rank means max tokens RECEIVED
        (max_bs * ranks * topk) -> converted to the per-rank slot bound;
      * second return is expert_token_nums [num_local_experts] int32 (tokens
        received per LOCAL expert), not the [El, R] ep_recv_count;
      * no shared experts, INT8 dispatch only (both enforced by construction:
        this path has no shared_expert_rank_num input and always quantizes).

    Returns (out [T, H] bf16, expert_token_nums [El] int32).
    """
    r = num_ranks
    el = num_experts // r
    k = topk_idx.shape[1]
    # received-token semantics -> per-source-rank slot bound
    maxt = max(1, num_max_dispatch_tokens_per_rank // (r * k))

    res: LowLatencyDispatchResult = strategy.low_latency_dispatch(
        x, topk_idx, axis_name=axis_name, num_experts=num_experts,
        num_ranks=num_ranks, num_max_dispatch_tokens_per_rank=maxt,
        quant_mode="int8",
    )
    w13_scale = scale_int64_to_float(w13_scale_i64)
    w2_scale = scale_int64_to_float(w2_scale_i64)
    cap = capacity_rows or r * maxt * min(k, el)
    slotted = _expert_ffn_slotted(
        res, w13_q, w13_scale, w2_q, w2_scale, num_ranks=r,
        num_local_experts=el, max_tokens=maxt, cap=cap)
    out = strategy.low_latency_combine(
        slotted, topk_idx, topk_weights, res.handle, axis_name=axis_name)
    expert_token_nums = res.packed_recv_count.astype(jnp.int32)   # [El]
    return out, expert_token_nums
