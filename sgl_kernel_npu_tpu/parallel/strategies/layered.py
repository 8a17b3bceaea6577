"""Layered (hierarchical) dispatch, low-latency AND normal mode — the A2
op-set equivalent.

Reference parity: csrc/deepep/ops2/ (26.9k LoC A2 set):
moe_distribute_dispatch_v2_layered / cam_moe_distribute_dispatch_a2_layered
(low-latency), and dispatch_normal_a2.h / notify_dispatch_a2.h /
moe_distribute_combine_a2_layered.h (normal mode), selected at runtime by
HCCL_INTRA_PCIE_ENABLE (deep_ep.cpp:925-934) — on 910B topology, tokens stage
through fast intranode HCCS, then cross nodes over RDMA, so each payload
crosses the slow fabric exactly once and intranode peers share the internode
legs.

TPU mapping: the two fabrics are two MESH AXES — "ici" (chips within a host)
and "dcn" (hosts). The layered dispatch:
  1. groups each rank's copies by destination (dcn_rank, ici_rank, expert);
  2. FIRST hop: all ranks exchange over the DCN axis only — each copy moves to
     the rank with the SAME ici index in the destination dcn group (its
     "gateway", so the dcn fabric is crossed once, by 1/ici_size of peers);
  3. SECOND hop: within the destination dcn group, copies fan out over the ICI
     axis into the final [El, R*maxT, H] slotted layout, where R = total ranks
     and the src-rank slot index is the GLOBAL rank of the original sender.

Output contract matches strategies/low_latency.py exactly (same handle,
combine runs the two hops in reverse), so the flat single-axis strategy is the
oracle: dispatching over a flattened (dcn*ici) axis must produce identical
buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..comm import ragged_all_to_all
from ..strategy import register_low_latency_strategy, register_normal_strategy
from .low_latency import (
    DefaultLowLatencyCommStrategy,
    LowLatencyDispatchResult,
    LowLatencyHandle,
    _exclusive_cumsum,
)
from .normal import DefaultNormalCommStrategy


@register_low_latency_strategy("layered")
class LayeredLowLatencyCommStrategy(DefaultLowLatencyCommStrategy):
    """Two-hop dispatch over ("dcn", "ici") axes.

    Call inside a shard_map over BOTH axes; `axis_name` is a tuple
    ("dcn", "ici"). Global rank = dcn_idx * ici_size + ici_idx.
    """

    def low_latency_dispatch(self, x, topk_idx, *, axis_name, num_experts,
                             num_ranks, num_max_dispatch_tokens_per_rank,
                             quant_mode="bf16", elastic_info=None,
                             shared_expert_rank_num=0):
        assert isinstance(axis_name, (tuple, list)) and len(axis_name) == 2, \
            "layered strategy needs ('dcn', 'ici') axis names"
        assert elastic_info is None and shared_expert_rank_num == 0
        dcn_ax, ici_ax = axis_name
        n_dcn = jax.lax.axis_size(dcn_ax)
        n_ici = jax.lax.axis_size(ici_ax)
        r = n_dcn * n_ici
        assert r == num_ranks
        t, h = x.shape
        k = topk_idx.shape[1]
        el = num_experts // r
        maxt = num_max_dispatch_tokens_per_rank
        assert t <= maxt
        tk = t * k
        me_dcn = jax.lax.axis_index(dcn_ax)
        me_ici = jax.lax.axis_index(ici_ax)
        me = me_dcn * n_ici + me_ici

        from ...ops.quant import per_token_quant_int8

        flat = topk_idx.reshape(-1)
        valid = flat >= 0
        g = jnp.where(valid, flat, 0)
        dst = g // el                 # global destination rank
        le = g % el
        dst_dcn = dst // n_ici
        dst_ici = dst % n_ici
        # hop-1 key: destination dcn group (gateway has my ici index there);
        # hop-2 + slotting need (dst_ici, le) and my global rank.
        key1 = jnp.where(valid, dst_dcn, n_dcn)
        order1 = jnp.argsort(key1, stable=True)
        k1s = key1[order1]
        copy_of_slot1 = jnp.where(k1s < n_dcn, order1, tk)

        counts1 = jnp.sum(jax.nn.one_hot(key1, n_dcn + 1, dtype=jnp.int32),
                          axis=0)[:n_dcn]
        off1 = _exclusive_cumsum(counts1)

        tok = jnp.where(copy_of_slot1 < tk, copy_of_slot1 // k, 0)
        if quant_mode == "int8":
            xq, xs = per_token_quant_int8(x)
            payload = xq[tok]
            scales = xs[tok][:, 0]
        else:
            payload = x[tok]
            scales = None
        # ship routing metadata with the payload for hop 2
        meta = jnp.stack([
            jnp.where(copy_of_slot1 < tk, dst_ici[jnp.clip(copy_of_slot1, 0, tk - 1)], n_ici),
            jnp.where(copy_of_slot1 < tk, le[jnp.clip(copy_of_slot1, 0, tk - 1)], 0),
            jnp.full((tk,), me, jnp.int32),
            jnp.where(copy_of_slot1 < tk, copy_of_slot1, tk),
        ], axis=1)  # [tk, 4]

        # --- hop 1: DCN-only ragged a2a (1 slice per dcn peer)
        m1 = jax.lax.all_gather(counts1, dcn_ax)             # [n_dcn, n_dcn]
        out_off1 = _exclusive_cumsum(m1, axis=0)[me_dcn, :]
        recv_sizes1 = m1[:, me_dcn]
        rbuf1 = n_dcn * maxt * k                             # worst case

        def hop1(p, fill=0):
            out = jnp.full((rbuf1,) + p.shape[1:], fill, p.dtype)
            return ragged_all_to_all(p, out, off1, counts1, out_off1,
                                     recv_sizes1, axis_name=dcn_ax)

        stage_x = hop1(payload)
        stage_meta = hop1(meta.astype(jnp.int32), fill=0)
        stage_scales = hop1(scales) if scales is not None else None
        stage_valid = jnp.arange(rbuf1) < jnp.sum(recv_sizes1)

        # --- hop 2: ICI fan-out into the final slotted layout.
        s_ici = jnp.where(stage_valid, stage_meta[:, 0], n_ici)
        s_le = stage_meta[:, 1]
        s_src = stage_meta[:, 2]                              # original global rank
        key2 = jnp.where(s_ici < n_ici, s_ici * el + s_le, n_ici * el)
        order2 = jnp.argsort(key2, stable=True)
        k2s = key2[order2]
        gat2 = jnp.clip(order2, 0, rbuf1 - 1)
        x2 = jnp.where((k2s < n_ici * el)[:, None], stage_x[gat2], 0)
        src2 = jnp.where(k2s < n_ici * el, s_src[gat2], r)

        # within the destination, rows must land at slot src_global*maxT + i,
        # grouped per (expert, src): order hop-2 sends by (ici, le, src).
        key2b = jnp.where(k2s < n_ici * el, k2s * r + jnp.clip(src2, 0, r - 1),
                          n_ici * el * r)
        order2b = jnp.argsort(key2b, stable=True)
        x2 = x2[order2b]
        src2b = src2[order2b]
        k2sb = key2b[order2b] // r
        # per-(ici, le, src) counts -> offsets inside the destination region
        cnt_fine = jnp.sum(jax.nn.one_hot(
            jnp.where(k2sb < n_ici * el, k2sb * r + jnp.clip(src2b, 0, r - 1),
                      n_ici * el * r),
            n_ici * el * r + 1, dtype=jnp.int32), axis=0)[: n_ici * el * r]
        off_fine = _exclusive_cumsum(cnt_fine)

        # destination offsets: slice (ici, le, src) lands at
        # [le, src*maxT] of the ici-peer's [El, R*maxT, H] buffer.
        lee = (jnp.arange(n_ici * el * r) // r) % el
        srcc = jnp.arange(n_ici * el * r) % r
        out_off2 = lee * (r * maxt) + srcc * maxt
        recv_cnt_fine = jax.lax.all_to_all(
            cnt_fine.reshape(n_ici, el * r), ici_ax, 0, 0, tiled=True
        ).reshape(-1)  # [(src_ici, le, src)] sizes

        out2 = jnp.zeros((el * r * maxt, h), x2.dtype)
        recv_x = ragged_all_to_all(
            x2, out2, off_fine, cnt_fine, out_off2, recv_cnt_fine,
            axis_name=ici_ax,
        ).reshape(el, r * maxt, h)

        recv_scales = None
        if stage_scales is not None:
            s2 = jnp.where(k2s < n_ici * el, stage_scales[gat2], 0.0)[order2b]
            sout = jnp.zeros((el * r * maxt,), jnp.float32)
            recv_scales = ragged_all_to_all(
                s2, sout, off_fine, cnt_fine,
                out_off2, recv_cnt_fine, axis_name=ici_ax,
            ).reshape(el, r * maxt)

        # layout_range [R, El]: counts per (src global, local expert).
        # A given original src arrives only via its gateway ici peer, so
        # summing the (src_ici, le, src) grid over src_ici is exact.
        rc = recv_cnt_fine.reshape(n_ici, el, r)
        recv_counts = jnp.transpose(jnp.sum(rc, axis=0), (1, 0))  # [r, el]

        # Combine reverses in ONE direct hop over the flattened axis pair (the
        # handle carries the FLAT-strategy bookkeeping, computed locally).
        key_flat = jnp.where(valid, dst * el + le, r * el)
        order_f = jnp.argsort(key_flat, stable=True)
        kfs = key_flat[order_f]
        copy_slot = jnp.full((tk + 1,), tk, jnp.int32).at[
            jnp.where(kfs < r * el, order_f, tk)
        ].set(jnp.arange(tk, dtype=jnp.int32), mode="drop")[:tk]
        counts_flat = jnp.sum(jax.nn.one_hot(key_flat, r * el + 1,
                                             dtype=jnp.int32), axis=0)[: r * el]
        handle = LowLatencyHandle(
            copy_slot=copy_slot, send_counts=counts_flat.reshape(r, el),
            input_offsets=_exclusive_cumsum(counts_flat),
            recv_counts=recv_counts, num_tokens=t, topk=k, max_tokens=maxt,
            num_local_experts=el, num_ranks=r,
        )
        return LowLatencyDispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            packed_recv_count=jnp.sum(recv_counts, axis=0),
            layout_range=recv_counts, handle=handle,
        )

    def low_latency_combine(self, x, topk_idx, topk_weights, handle, *, axis_name):
        """Reverse in one direct hop over the flattened ("dcn","ici") pair
        (the A2 reference also combines with fewer staging constraints)."""
        return super().low_latency_combine(
            x, topk_idx, topk_weights, handle, axis_name=tuple(axis_name))


# ------------------------------------------------------- layered NORMAL mode

@register_normal_strategy("layered")
class LayeredNormalCommStrategy(DefaultNormalCommStrategy):
    """Two-hop NORMAL-mode dispatch over ("dcn", "ici") axes (ref:
    dispatch_normal_a2.h + notify_dispatch_a2.h, hierarchical staging).

    hop 1 (slow fabric, crossed once): each rank ships its rows destined to
    dcn group j to that group's GATEWAY with the sender's own ici index —
    one contiguous block per dcn peer (the send buffer is dst-global-major,
    and dst-global order nests (dcn, ici), so dcn blocks are contiguous).
    hop 2 (fast fabric): gateways fan rows out over the ICI axis with one
    fine-grained slice per (dst_ici, src_dcn), landing each src's block at
    the destination's FLAT per-src offset — so the receive buffer is
    bit-identical to the flat single-axis strategy's (the oracle).

    The handle is the flat handle (computed from the globally-gathered count
    matrix), and combine reverses in one direct hop over the flattened axis
    pair, exactly like the layered low-latency tier (the A2 reference also
    combines with fewer staging constraints:
    moe_distribute_combine_a2_layered.h).
    """

    def dispatch(self, x, topk_idx, topk_weights, *, axis_name, num_experts,
                 num_ranks, quant_mode="bf16", capacity_factor=2.0,
                 config=None):
        assert isinstance(axis_name, (tuple, list)) and len(axis_name) == 2, \
            "layered strategy needs ('dcn', 'ici') axis names"
        dcn_ax, ici_ax = axis_name
        n_dcn = jax.lax.axis_size(dcn_ax)
        n_ici = jax.lax.axis_size(ici_ax)
        r = n_dcn * n_ici
        assert r == num_ranks
        t, h = x.shape
        k = topk_idx.shape[1]
        el = num_experts // r
        me_dcn = jax.lax.axis_index(dcn_ax)
        me_ici = jax.lax.axis_index(ici_ax)
        me = me_dcn * n_ici + me_ici

        from ...ops.quant import per_token_quant_int8
        from ..layout import get_dispatch_layout
        from .normal import BIG, DispatchHandle, DispatchResult

        _, _, in_rank = get_dispatch_layout(topk_idx, num_experts, r)  # [T, R]
        send_counts = jnp.sum(in_rank.astype(jnp.int32), axis=0)       # [R]

        # dst-global-major stable send order (identical to the flat strategy)
        sbuf = t * min(k, r)
        prio = jnp.where(
            in_rank.T,
            jax.lax.broadcasted_iota(jnp.int32, (r, t), 0) * t
            + jax.lax.broadcasted_iota(jnp.int32, (r, t), 1), BIG)
        order = jnp.argsort(prio.reshape(-1), stable=True)[:sbuf]
        sorted_prio = jnp.take_along_axis(prio.reshape(-1), order, 0)
        send_valid = sorted_prio < BIG
        send_token = jnp.where(send_valid, order % t, t)
        slot_dst = jnp.where(send_valid, sorted_prio // t, r)   # dst global
        slot_dst_ici = jnp.where(send_valid, slot_dst % n_ici, n_ici)

        gather_tok = jnp.clip(send_token, 0, t - 1)
        if quant_mode == "int8":
            xq, xscale = per_token_quant_int8(x)
            send_x = xq[gather_tok]
            send_scales = xscale[gather_tok]
        else:
            send_x = x[gather_tok]
            send_scales = None
        send_idx = jnp.where(send_valid[:, None], topk_idx[gather_tok], -1)
        send_w = topk_weights[gather_tok]

        # global count matrix == notify_dispatch_a2 (a few KB over both axes)
        m_full = jax.lax.all_gather(send_counts, (dcn_ax, ici_ax))  # [R, R]

        # ---- hop 1: one contiguous block per dcn peer, over the dcn axis
        counts_dcn = send_counts.reshape(n_dcn, n_ici).sum(axis=1)  # [n_dcn]
        off_dcn = _exclusive_cumsum(counts_dcn)
        m1 = jax.lax.all_gather(counts_dcn, dcn_ax)                 # [nD, nD]
        out_off1 = _exclusive_cumsum(m1, axis=0)[me_dcn, :]
        recv_sizes1 = m1[:, me_dcn]
        arrive1 = _exclusive_cumsum(recv_sizes1)
        # exact worst case: each dcn peer sends <= t * min(k, n_ici) rows
        # into my group (per-rank dedup caps a token at n_ici dsts per group)
        rbuf1 = n_dcn * t * min(k, n_ici)

        def hop1(p, fill=0):
            out = jnp.full((rbuf1,) + p.shape[1:], fill, p.dtype)
            return ragged_all_to_all(p, out, off_dcn, counts_dcn, out_off1,
                                     recv_sizes1, axis_name=dcn_ax)

        stage_x = hop1(send_x)
        stage_idx = hop1(send_idx, fill=-1)
        stage_w = hop1(send_w)
        stage_scales = hop1(send_scales) if send_scales is not None else None

        # ---- hop 2: fine slices (dst_ici, src_dcn) over the ici axis.
        # Gateway rows: src_dcn-major blocks (hop-1 order), within a block the
        # sender's dst-global-major order = (dst_ici, token) — so slice
        # (d, s) is contiguous at arrive1[s] + sum_{d'<d} cnt2[d', s].
        # cnt2[d, s] = rows from src (s, me_ici) to dst (me_dcn, d):
        src_g = (jnp.arange(n_dcn) * n_ici + me_ici)                # [nD]
        dst_g = (me_dcn * n_ici + jnp.arange(n_ici))                # [nI]
        cnt2 = m_full[src_g[None, :], dst_g[:, None]]               # [nI, nD]
        in_off2 = (arrive1[None, :]
                   + _exclusive_cumsum(cnt2, axis=0))               # [nI, nD]

        # flat per-src landing offsets at each destination, with the flat
        # strategy's overflow capping (normal.py:129-139)
        rbuf = min(max(int(sbuf * capacity_factor), sbuf), r * t)
        cap = jnp.int32(rbuf)
        col_cum = _exclusive_cumsum(m_full, axis=0)                 # [R, R]
        out_off2 = jnp.minimum(col_cum[src_g[None, :], dst_g[:, None]], cap)
        send_sizes2 = jnp.minimum(cnt2, cap - out_off2)

        # what I receive: slice (me_ici, s) from gateway (me_dcn, g) carries
        # src (s, g)'s rows — sizes/offsets from the same capped formulas
        src_of = (jnp.arange(n_dcn)[None, :] * n_ici
                  + jnp.arange(n_ici)[:, None])                     # [g, s]
        my_out_off = jnp.minimum(col_cum[src_of, me], cap)
        recv_sizes2 = jnp.minimum(m_full[src_of, me], cap - my_out_off)

        def hop2(p, fill=0):
            out = jnp.full((rbuf,) + p.shape[1:], fill, p.dtype)
            return ragged_all_to_all(
                p, out, in_off2.reshape(-1), send_sizes2.reshape(-1),
                out_off2.reshape(-1), recv_sizes2.reshape(-1),
                axis_name=ici_ax)

        recv_x = hop2(stage_x)
        recv_idx = hop2(stage_idx, fill=-1)
        recv_w = hop2(stage_w)
        recv_scales = hop2(stage_scales) if stage_scales is not None else None

        # receiver-side masking + handle: identical to the flat strategy,
        # computed from the global count matrix
        recv_sizes = m_full[:, me]
        arrive_cum = jnp.minimum(_exclusive_cumsum(recv_sizes), cap)
        recv_sizes_capped = jnp.minimum(recv_sizes, cap - arrive_cum)
        overflow = jnp.sum(recv_sizes) > cap
        recv_count = jnp.sum(recv_sizes_capped)

        local_lo = me * el
        is_local = (recv_idx >= local_lo) & (recv_idx < local_lo + el)
        row_valid = jnp.arange(rbuf) < recv_count
        recv_topk_idx = jnp.where(is_local & row_valid[:, None], recv_idx, -1)
        recv_topk_weights = jnp.where(recv_topk_idx >= 0, recv_w, 0.0)
        local_ids = jnp.where(recv_topk_idx >= 0, recv_topk_idx - local_lo, el)
        recv_tokens_per_expert = jnp.sum(
            jax.nn.one_hot(local_ids, el + 1, dtype=jnp.int32), axis=(0, 1)
        )[:el]

        input_offsets = _exclusive_cumsum(send_counts)
        output_offsets = jnp.minimum(col_cum[me, :], cap)
        handle = DispatchHandle(
            send_slot_token=send_token, send_valid=send_valid,
            send_counts=jnp.minimum(send_counts, cap - output_offsets),
            input_offsets=input_offsets, output_offsets=output_offsets,
            recv_sizes=recv_sizes_capped, recv_offsets=arrive_cum,
            num_tokens=t, topk=k, sbuf=sbuf, rbuf=rbuf,
        )
        return DispatchResult(
            recv_x=recv_x, recv_x_scales=recv_scales,
            recv_topk_idx=recv_topk_idx, recv_topk_weights=recv_topk_weights,
            recv_count=recv_count,
            recv_tokens_per_expert=recv_tokens_per_expert,
            handle=handle, overflow=overflow,
        )

    def combine(self, x, handle, topk_weights, *, axis_name, config=None):
        """One direct reverse hop over the flattened ("dcn", "ici") pair —
        the flat handle makes the default combine exact."""
        return super().combine(x, handle, topk_weights,
                               axis_name=tuple(axis_name), config=config)
