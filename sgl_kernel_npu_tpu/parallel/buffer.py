"""Buffer — the EP communication facade.

Reference parity: deep_ep.Buffer (python/deep_ep/deep_ep/buffer.py) — holds the
communicator/topology, selects normal + low-latency strategies from
DEEP_USE_MODE (buffer.py:85-123), exposes get_dispatch_layout / dispatch /
combine / low_latency_dispatch / low_latency_combine / fused_deep_moe, and the
per-EP-size Config presets (:138-179).

TPU realisation: the "communicator" is a jax.sharding.Mesh axis. Buffer wraps
each strategy's per-shard function in a shard_map over that axis and jits it.
Mesh axes other than the EP axis pass through untouched, so the same Buffer
composes with TP/DP axes of a larger mesh (the reference plumbs groupTp but
pins tpWorldSize=1 — deep_ep.cpp:189-190; here TP composes naturally).
"""

from __future__ import annotations

from enum import IntEnum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import env, get_logger
from .config import Config
from .layout import get_dispatch_layout as _layout
from .strategy import get_low_latency_strategy, get_normal_strategy
from .strategies import low_latency as _ll  # noqa: F401  (registers)
from .strategies import normal as _normal  # noqa: F401  (registers)


class FuseMode(IntEnum):
    """Fusion-mode selector for Buffer.fused_deep_moe (reference parity:
    deep_ep.buffer.FuseMode, python/deep_ep/deep_ep/buffer.py:21-23 — also
    deliberately NOT exported from the package __init__)."""
    FUSED_DEEP_MOE = 1
    DISPATCH_FFN_COMBINE = 2


class Buffer:
    """EP communication over a mesh axis.

    Args:
      mesh: the device mesh.
      axis_name: the EP axis of `mesh` (default "ep").
      num_experts: total experts, divisible by EP size.
      num_max_dispatch_tokens_per_rank: static decode-path token bound
        (ref: the same-named Buffer ctor arg).
    """

    def __init__(self, mesh: Mesh, num_experts: int, axis_name: str = "ep",
                 num_max_dispatch_tokens_per_rank: int = 128,
                 normal_strategy: Optional[str] = None,
                 low_latency_strategy: Optional[str] = None):
        self.mesh = mesh
        self.axis_name = axis_name
        self.num_ranks = mesh.shape[axis_name]
        assert num_experts % self.num_ranks == 0
        self.num_experts = num_experts
        self.num_local_experts = num_experts // self.num_ranks
        self.num_max_dispatch_tokens_per_rank = num_max_dispatch_tokens_per_rank

        self._last_notify_counts = None
        self._jit_cache: dict = {}
        n_name, ll_name = env.deep_use_mode()
        self._normal = get_normal_strategy(normal_strategy or n_name)
        self._low_latency = get_low_latency_strategy(low_latency_strategy or ll_name)
        get_logger().info(
            "Buffer: ep=%d experts=%d normal=%s low_latency=%s",
            self.num_ranks, num_experts,
            self._normal.strategy_name, self._low_latency.strategy_name,
        )

    # -------------------------------------------------------------- helpers

    def _smap(self, fn, in_specs, out_specs, key=None):
        """jit(shard_map(fn)). `key` (a hashable tuple of the call site's
        closed-over STATICS) enables caching the jitted callable on the
        Buffer — without it every API call builds a fresh closure, which is a
        jit cache miss, i.e. a full retrace+recompile per call (measured
        ~3.5 s per fused_deep_moe invocation before caching)."""
        if key is not None and key in self._jit_cache:
            return self._jit_cache[key]
        jitted = jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )
        if key is not None:
            self._jit_cache[key] = jitted
        return jitted

    def _ep(self, *rest):
        return P(self.axis_name, *rest)

    # ------------------------------------------------------------- layout

    def get_dispatch_layout(self, topk_idx):
        """Global (sharded) layout: counts per rank / expert + routing mask.
        Ref: Buffer.get_dispatch_layout -> aclnnDispatchLayout."""
        fn = self._smap(
            lambda idx: _layout(idx, self.num_experts, self.num_ranks),
            in_specs=(self._ep(),),
            out_specs=(self._ep(), self._ep(), self._ep()),
            key=("layout",),
        )
        return fn(topk_idx)

    # ------------------------------------------------------------- config

    @staticmethod
    def get_dispatch_config(num_ranks: int) -> Config:
        """Ref: Buffer.get_dispatch_config (buffer.py:138-158)."""
        return Config.get_dispatch_config(num_ranks)

    @staticmethod
    def get_combine_config(num_ranks: int) -> Config:
        """Ref: Buffer.get_combine_config (buffer.py:160-179)."""
        return Config.get_combine_config(num_ranks)

    def notify_verify(self, topk_idx):
        """Metadata-only dispatch (ref: Buffer.notify_verify, buffer.py:383-445
        -> aclnnNotifyDispatch): runs the count exchange and returns
        (recv_counts [R] rows per source rank, recv_offsets [R],
        expert_global_offset [E/R], total_recv_token [], max_bs [],
        recv_tokens_per_expert [E/R]) — all per-rank sharded.
        """
        e, r = self.num_experts, self.num_ranks
        el = e // r

        def fn(idx):
            ntr, nte, in_rank = _layout(idx, e, r)
            send_counts = jnp.sum(in_rank.astype(jnp.int32), axis=0)
            m = jax.lax.all_gather(send_counts, self.axis_name)
            me = jax.lax.axis_index(self.axis_name)
            recv_counts = m[:, me]
            recv_offsets = jnp.cumsum(recv_counts) - recv_counts
            # per-expert counts across all ranks for MY local experts
            nte_all = jax.lax.psum(nte, self.axis_name)
            mine = jax.lax.dynamic_slice(nte_all, (me * el,), (el,))
            expert_global_offset = jnp.cumsum(mine) - mine
            total_recv = jnp.sum(recv_counts)
            # max over ranks of their total send count (ref max_bs)
            max_bs = jnp.max(jnp.sum(m, axis=1))
            return (recv_counts, recv_offsets, expert_global_offset,
                    total_recv[None], max_bs[None], mine)

        out = self._smap(
            fn, in_specs=(self._ep(),), out_specs=tuple([self._ep()] * 6),
            key=("notify",),
        )(topk_idx)
        self._last_notify_counts = out[0]
        return out

    # ----------------------------------------------- reference API parity

    @staticmethod
    def set_num_sms(new_num_sms: int) -> None:
        """Ref: Buffer.set_num_sms (buffer.py:182-192) — sets the SM split for
        comm kernels. XLA owns TPU core scheduling, so this only updates the
        Config default (kept for call-site compatibility)."""
        Config.default_num_sms = int(new_num_sms)

    @staticmethod
    def capture():
        """Ref: Buffer.capture (buffer.py:194-202) — records a stream event
        for graph capture. TPU: ordering is data dependence; returns an empty
        completion token."""
        from .event import EventOverlap
        return EventOverlap()

    @staticmethod
    def get_low_latency_rdma_size_hint(num_max_dispatch_tokens_per_rank: int,
                                       hidden: int, num_ranks: int,
                                       num_experts: int) -> int:
        """Ref: Buffer.get_low_latency_rdma_size_hint (buffer.py:204-213):
        bytes of the slotted receive buffer [El, R*maxT, H] (int8 payload +
        f32 scale per token), for capacity planning parity."""
        el = num_experts // num_ranks
        per_token = hidden + 4
        return int(el * num_ranks * num_max_dispatch_tokens_per_rank * per_token)

    def clean_low_latency_buffer(self, *args, **kwargs) -> None:
        """Ref: Buffer.clean_low_latency_buffer (buffer.py:264-282) — zeroes
        the persistent RDMA buffers between phases. TPU: collectives use
        XLA-managed transient buffers; nothing persists to clean."""

    def get_notify_send_data(self):
        """Ref: Buffer.get_notify_send_data (buffer.py:254-262): the count
        matrix a subsequent dispatch would send — per-rank [R] row counts."""
        return self._last_notify_counts

    def internode_dispatch(self, *args, **kwargs):
        """Ref: Buffer.internode_dispatch (buffer.py:521-606). On TPU a
        single dispatch serves both fabrics: ragged collectives ride whatever
        mesh axis spans the ranks (DCN+ICI staging = the "layered" strategy).
        Delegates to dispatch()."""
        return self.dispatch(*args, **kwargs)

    def internode_combine(self, *args, **kwargs):
        """Ref: Buffer.internode_combine (buffer.py:608-649); see
        internode_dispatch."""
        return self.combine(*args, **kwargs)

    # ------------------------------------------------------------- normal

    def dispatch(self, x, topk_idx, topk_weights, quant_mode: str = "bf16",
                 capacity_factor: float = 2.0, config: Optional[Config] = None,
                 dispatch_wait_recv_cost_stats=None,
                 on_overflow: str = "retry"):
        """Normal-mode dispatch. Inputs sharded over the EP axis on dim 0.

        Returns per-rank-sharded (recv_x, recv_x_scales, recv_topk_idx,
        recv_topk_weights, recv_count, recv_tokens_per_expert, handle)
        [+ updated stats when `dispatch_wait_recv_cost_stats` is given].

        `dispatch_wait_recv_cost_stats` (ref: deep_ep.cpp:246-252 — a per-peer
        cost tensor the kernel accumulates into): pass an [R, R] int32 array;
        returns it with the per-(dst, src) received-token counts accumulated.
        XLA exposes no in-graph cycle counter, so the TPU contract records
        traffic volume (the load-balance signal); wall-time per collective
        comes from `jax.profiler` traces instead.

        Overflow contract (`on_overflow`): static receive buffers hold
        capacity_factor * T * min(K, R) rows per rank; adversarially skewed
        routing with K < R can exceed that. The reference cannot hit this (it
        sizes outputs exactly via .item() syncs, deep_ep.cpp:298-303); here:
          * "retry" (default): check the per-rank overflow flag (ONE small
            D2H sync — the reference pays two .item() syncs on this same
            path) and transparently re-dispatch at the exact worst-case
            capacity (R*T rows) — no token is ever dropped.
          * "flag": fully async; the per-rank bool rides `handle.overflow`
            and the caller decides (rows beyond capacity were dropped).
          * "error": like retry's check, but raises RuntimeError instead.
        """
        assert on_overflow in ("retry", "flag", "error"), on_overflow
        if env.bf16_dispatch():
            quant_mode = "bf16"
        config = config or Config.get_dispatch_config(self.num_ranks)
        strat = self._normal

        def fn(x, idx, w):
            res = strat.dispatch(
                x, idx, w, axis_name=self.axis_name,
                num_experts=self.num_experts, num_ranks=self.num_ranks,
                quant_mode=quant_mode, capacity_factor=capacity_factor,
                config=config,
            )
            hd = res.handle
            scales = res.recv_x_scales
            if scales is None:
                scales = jnp.zeros((res.recv_x.shape[0], 1), jnp.float32)
            return (res.recv_x, scales, res.recv_topk_idx, res.recv_topk_weights,
                    res.recv_count[None], res.recv_tokens_per_expert,
                    hd.send_slot_token, hd.send_valid, hd.send_counts,
                    hd.input_offsets, hd.output_offsets, hd.recv_sizes,
                    hd.recv_offsets, jnp.asarray(res.overflow).reshape(1))

        out = self._smap(
            fn,
            in_specs=(self._ep(), self._ep(), self._ep()),
            out_specs=tuple([self._ep()] * 14),
            key=("dispatch", quant_mode, capacity_factor, config),
        )(x, topk_idx, topk_weights)
        (recv_x, scales, recv_idx, recv_w, recv_count, per_expert,
         s_tok, s_valid, s_counts, i_off, o_off, r_sizes, r_off,
         overflow) = out
        t = x.shape[0] // self.num_ranks
        k = topk_idx.shape[1]
        if on_overflow != "flag" and bool(jax.device_get(overflow).any()):
            if on_overflow == "error":
                raise RuntimeError(
                    "normal dispatch overflow: skewed routing exceeded "
                    f"capacity_factor={capacity_factor} receive buffers "
                    "(rows would be dropped); retry with on_overflow='retry' "
                    "or a larger capacity_factor")
            # exact worst case: every rank sends its full T rows here -> the
            # min(rbuf, R*T) clamp in the strategy makes overflow impossible
            get_logger().warning(
                "dispatch overflow at capacity_factor=%s; re-dispatching at "
                "worst-case capacity (R*T rows)", capacity_factor)
            return self.dispatch(
                x, topk_idx, topk_weights, quant_mode=quant_mode,
                capacity_factor=float(self.num_ranks * t), config=config,
                dispatch_wait_recv_cost_stats=dispatch_wait_recv_cost_stats,
                on_overflow="flag")
        handle = _normal.DispatchHandle(
            send_slot_token=s_tok, send_valid=s_valid, send_counts=s_counts,
            input_offsets=i_off, output_offsets=o_off, recv_sizes=r_sizes,
            recv_offsets=r_off, num_tokens=t, topk=k,
            sbuf=t * min(k, self.num_ranks),
            rbuf=recv_x.shape[0] // self.num_ranks,
            overflow=overflow,
        )
        out = (recv_x, (scales if quant_mode in ("int8", "fp8") else None),
               recv_idx, recv_w, recv_count, per_expert, handle)
        if dispatch_wait_recv_cost_stats is not None:
            stats = dispatch_wait_recv_cost_stats + r_sizes.reshape(
                self.num_ranks, self.num_ranks).astype(
                    dispatch_wait_recv_cost_stats.dtype)
            out = out + (stats,)
        return out

    def combine(self, x, handle, topk_weights, config: Optional[Config] = None,
                combine_send_cost_stats=None):
        """Normal-mode combine (reverse of dispatch). Ref: Buffer.combine.

        `combine_send_cost_stats` (ref: deep_ep.cpp:546-552): pass an [R, R]
        int32 array; returns it with per-(src, dst) sent-token counts
        accumulated (combine sends back along the reversed dispatch routes)."""
        config = config or Config.get_combine_config(self.num_ranks)
        strat = self._normal
        hd = handle

        def fn(x, w, s_tok, s_valid, s_counts, i_off, o_off, r_sizes, r_off):
            local = _normal.DispatchHandle(
                send_slot_token=s_tok, send_valid=s_valid, send_counts=s_counts,
                input_offsets=i_off, output_offsets=o_off, recv_sizes=r_sizes,
                recv_offsets=r_off, num_tokens=hd.num_tokens, topk=hd.topk,
                sbuf=hd.sbuf, rbuf=hd.rbuf,
            )
            return strat.combine(x, local, w, axis_name=self.axis_name, config=config)

        out = self._smap(
            fn,
            in_specs=tuple([self._ep()] * 9),
            out_specs=(self._ep(), self._ep()),
            key=("combine", config, hd.num_tokens, hd.topk, hd.sbuf, hd.rbuf),
        )(x, topk_weights, hd.send_slot_token, hd.send_valid, hd.send_counts,
          hd.input_offsets, hd.output_offsets, hd.recv_sizes, hd.recv_offsets)
        if combine_send_cost_stats is not None:
            stats = combine_send_cost_stats + hd.recv_sizes.reshape(
                self.num_ranks, self.num_ranks).astype(
                    combine_send_cost_stats.dtype)
            return out + (stats,)
        return out

    # --------------------------------------------------------- low latency

    def low_latency_dispatch(self, x, topk_idx, quant_mode: str = "int8",
                             elastic_info=None,
                             cumulative_local_expert_recv_stats=None):
        """Decode-path dispatch. Ref: Buffer.low_latency_dispatch (§3.2).

        elastic_info: optional ElasticInfo (parallel.elastic) — scale-down
        remap consulted per step (ref elasticInfo contract).
        cumulative_local_expert_recv_stats: optional [E] int32 accumulator of
        per-expert received-token counts (ref buffer.py:679-681); the updated
        array is returned as an extra output when provided.
        """
        if env.bf16_dispatch():
            quant_mode = "bf16"
        strat = self._low_latency
        maxt = self.num_max_dispatch_tokens_per_rank
        shared = env.shared_expert_rank_num()

        def fn(x, idx):
            res = strat.low_latency_dispatch(
                x, idx, axis_name=self.axis_name,
                num_experts=self.num_experts, num_ranks=self.num_ranks,
                num_max_dispatch_tokens_per_rank=maxt, quant_mode=quant_mode,
                elastic_info=elastic_info, shared_expert_rank_num=shared,
            )
            hd = res.handle
            scales = res.recv_x_scales
            if scales is None:
                scales = jnp.zeros(res.recv_x.shape[:2], jnp.float32)
            return (res.recv_x, scales, res.packed_recv_count, res.layout_range,
                    hd.copy_slot, hd.send_counts, hd.input_offsets, hd.recv_counts)

        out = self._smap(
            fn,
            in_specs=(self._ep(), self._ep()),
            out_specs=tuple([self._ep()] * 8),
            key=(("ll_dispatch", quant_mode, shared)
                 if elastic_info is None else None),
        )(x, topk_idx)
        recv_x, scales, packed_count, layout_range, c_slot, s_counts, i_off, r_counts = out
        if cumulative_local_expert_recv_stats is not None:
            cumulative_local_expert_recv_stats = (
                cumulative_local_expert_recv_stats + packed_count.reshape(-1))
        t = x.shape[0] // self.num_ranks
        handle = _ll.LowLatencyHandle(
            copy_slot=c_slot, send_counts=s_counts, input_offsets=i_off,
            recv_counts=r_counts, num_tokens=t, topk=topk_idx.shape[1],
            max_tokens=maxt, num_local_experts=self.num_local_experts,
            num_ranks=self.num_ranks,
        )
        base = (recv_x,
                (scales if quant_mode in ("int8", "fp8", "mxfp8", "mxfp4")
                 else None),
                packed_count, layout_range, handle)
        if cumulative_local_expert_recv_stats is not None:
            return base + (cumulative_local_expert_recv_stats,)
        return base

    def fused_deep_moe(self, x, topk_idx, topk_weights,
                       w13_q, w13_scale, w2_q, w2_scale,
                       capacity_rows: Optional[int] = None,
                       chunk_rounds: int = 1,
                       fuse_mode: FuseMode = FuseMode.FUSED_DEEP_MOE):
        """Single-jit fused MoE layer (ref: Buffer.fused_deep_moe §3.3).

        x [Ttotal, H] sharded over EP; expert weights sharded over EP on dim 0:
        w13_q [E, H, 2F] int8, w13_scale [E, 2F], w2_q [E, F, H] int8,
        w2_scale [E, H]. Returns [Ttotal, H].

        chunk_rounds > 1 software-pipelines dispatch/GEMM/combine rounds for
        comm/compute overlap (ref fused_deep_moe.h:38-95 preload-async).

        fuse_mode=FuseMode.DISPATCH_FFN_COMBINE routes to the
        aclnnDispatchFFNCombine-parity path (ref buffer.py:881-896): scales
        must then be int64 bit patterns, and the call returns
        (out, expert_token_nums) — see dispatch_ffn_combine.
        """
        if fuse_mode == FuseMode.DISPATCH_FFN_COMBINE:
            # reference semantics: num_max_dispatch_tokens_per_rank means max
            # RECEIVED tokens in this mode (max_bs * ranks * topk)
            return self.dispatch_ffn_combine(
                x, topk_idx, topk_weights, w13_q, w13_scale, w2_q, w2_scale,
                capacity_rows=capacity_rows)
        from . import fused_moe as _fm

        strat = self._low_latency
        maxt = self.num_max_dispatch_tokens_per_rank

        # custom-kernel tier: ONE Pallas launch with comm/compute overlap
        # (strategies/fused_moe_pallas.py — the aclnnFusedDeepMoe analogue).
        # Selected with the pallas low-latency strategy; the shard function
        # owns its own dispatch wire protocol, so chunk_rounds (the XLA
        # software-pipelining lever) does not apply.
        if strat.strategy_name == "pallas" and capacity_rows is None:
            from .strategies.fused_moe_pallas import fused_deep_moe_pallas_shard

            def fnp(x, idx, w, w13q, w13s, w2q, w2s):
                return fused_deep_moe_pallas_shard(
                    x, idx, w, w13q, w13s, w2q, w2s,
                    axis_name=self.axis_name, num_experts=self.num_experts,
                    num_ranks=self.num_ranks,
                    num_max_dispatch_tokens_per_rank=maxt)

            return self._smap(
                fnp, in_specs=tuple([self._ep()] * 7), out_specs=self._ep(),
                key=("fused_moe_pallas",),
            )(x, topk_idx, topk_weights, w13_q, w13_scale, w2_q, w2_scale)

        def fn(x, idx, w, w13q, w13s, w2q, w2s):
            return _fm.fused_deep_moe_shard(
                x, idx, w, w13q, w13s, w2q, w2s,
                strategy=strat, axis_name=self.axis_name,
                num_experts=self.num_experts, num_ranks=self.num_ranks,
                num_max_dispatch_tokens_per_rank=maxt,
                capacity_rows=capacity_rows, chunk_rounds=chunk_rounds,
            )

        return self._smap(
            fn,
            in_specs=tuple([self._ep()] * 7),
            out_specs=self._ep(),
            key=("fused_moe", capacity_rows, chunk_rounds),
        )(x, topk_idx, topk_weights, w13_q, w13_scale, w2_q, w2_scale)

    def dispatch_ffn_combine(self, x, topk_idx, topk_weights,
                             w13_q, w13_scale_i64, w2_q, w2_scale_i64,
                             max_output_size: Optional[int] = None,
                             capacity_rows: Optional[int] = None):
        """aclnnDispatchFFNCombine (FuseMode 2) — the reference's alternative
        single-call MoE fusion (csrc/deepep/ops/op_kernel/dispatch_ffn_combine.h;
        facade deep_ep/buffer.py:881-896). Contract differences vs
        fused_deep_moe are honored in dispatch_ffn_combine_shard (which see):
        int64-bit-pattern scales (NOT auto-converted here — reference parity),
        received-token bound semantics, per-local-expert second return, no
        shared experts, INT8 only.

        max_output_size: max tokens RECEIVED in dispatch
        (max_bs * num_ranks * topk); defaults from the ctor bound.
        Returns (out [Ttotal, H] bf16, expert_token_nums [EP, El] int32 —
        one row per rank, each row this rank's local-expert counts).
        """
        from . import fused_moe as _fm

        # int32 also accepted: without jax_enable_x64, device_put narrows
        # int64 inputs to int32 — the f32 bit pattern lives in the low 32
        # bits either way (scale_from_float_to_int64 widens an int32 view).
        ok_dtypes = (jnp.int64, jnp.int32)
        assert w13_scale_i64.dtype in ok_dtypes and \
            w2_scale_i64.dtype in ok_dtypes, (
                "DISPATCH_FFN_COMBINE takes int64 bit-pattern scales "
                "(FUSED_DEEP_MOE.md:44-52); use "
                "np.frombuffer(f32.tobytes(), np.int32).astype(np.int64)")
        strat = self._low_latency
        k = int(topk_idx.shape[-1])
        recv_bound = max_output_size or (
            self.num_max_dispatch_tokens_per_rank * self.num_ranks * k)

        def fn(x, idx, w, w13q, w13s, w2q, w2s):
            out, nums = _fm.dispatch_ffn_combine_shard(
                x, idx, w, w13q, w13s, w2q, w2s,
                strategy=strat, axis_name=self.axis_name,
                num_experts=self.num_experts, num_ranks=self.num_ranks,
                num_max_dispatch_tokens_per_rank=recv_bound,
                capacity_rows=capacity_rows,
            )
            return out, nums[None]   # [1, El] per shard -> [EP, El] global

        return self._smap(
            fn,
            in_specs=tuple([self._ep()] * 7),
            out_specs=(self._ep(), self._ep()),
            key=("dispatch_ffn_combine", recv_bound, capacity_rows),
        )(x, topk_idx, topk_weights, w13_q, w13_scale_i64, w2_q, w2_scale_i64)

    def low_latency_combine(self, x, topk_idx, topk_weights, handle):
        """Decode-path combine. Ref: Buffer.low_latency_combine."""
        strat = self._low_latency
        hd = handle

        def fn(x, idx, w, c_slot, s_counts, i_off, r_counts):
            local = _ll.LowLatencyHandle(
                copy_slot=c_slot, send_counts=s_counts, input_offsets=i_off,
                recv_counts=r_counts, num_tokens=hd.num_tokens, topk=hd.topk,
                max_tokens=hd.max_tokens,
                num_local_experts=hd.num_local_experts, num_ranks=hd.num_ranks,
            )
            return strat.low_latency_combine(
                x, idx, w, local, axis_name=self.axis_name
            )

        return self._smap(
            fn,
            in_specs=tuple([self._ep()] * 7),
            out_specs=self._ep(),
            key=("ll_combine", hd.num_tokens, hd.topk, hd.max_tokens,
                 hd.num_local_experts, hd.num_ranks),
        )(x, topk_idx, topk_weights, hd.copy_slot, hd.send_counts,
          hd.input_offsets, hd.recv_counts)
