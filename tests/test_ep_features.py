"""EP feature extensions: elastic scale-down, shared-expert ranks, recv stats,
long-seq multi-round dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import Buffer
from sgl_kernel_npu_tpu.parallel.elastic import ElasticInfo
from sgl_kernel_npu_tpu.parallel.strategies import normal as normal_mod
from sgl_kernel_npu_tpu.parallel.strategy import get_normal_strategy

from .utils import assert_close

R, E, T, K, H = 8, 16, 8, 2, 32


def _mesh():
    return Mesh(np.array(jax.devices()[:R]), ("ep",))


def _routing(rng, total):
    idx = np.stack([rng.choice(E, K, replace=False) for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)
    return idx, w


@pytest.mark.parametrize("strategy", ["default", "pallas"])
def test_elastic_scale_down_reroutes(rng, strategy):
    """With rank 3 dead (remapped to rank 1 under renumbering), no tokens land
    on rank 3 and combine still reconstructs every token. Covers the custom
    pallas kernel tier too (ref: elasticInfo INSIDE the optimized kernels,
    moe_distribute_dispatch_v2.h:261-283)."""
    mesh = _mesh()
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T,
                 low_latency_strategy=strategy)
    total = R * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    topk_idx, topk_w = _routing(rng, total)

    # renumbered world: 7 ranks, experts renumber to 14 (E/R=2 per rank);
    # logical new-rank r -> physical rank skipping 3
    remap = np.array([0, 1, 2, 4, 5, 6, 7, -1], np.int32)
    elastic = ElasticInfo(
        flag=jnp.int32(1), new_world_size=jnp.int32(7),
        shared_expert_rank_num=jnp.int32(0), moe_expert_num=jnp.int32(14),
        rank_remap=jnp.array(remap),
    )
    # restrict routing to the renumbered expert space
    topk_idx = np.where(topk_idx >= 14, topk_idx - 14, topk_idx)

    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    recv_x, _, packed, lr, handle = buf.low_latency_dispatch(
        xs, jnp.array(topk_idx), quant_mode="bf16", elastic_info=elastic)
    packed = np.asarray(packed).reshape(R, E // R)
    assert packed[3].sum() == 0              # dead rank receives nothing
    assert packed.sum() == (topk_idx >= 0).sum()

    combined = buf.low_latency_combine(
        recv_x, jnp.array(topk_idx), jnp.array(topk_w), handle)
    golden = x * topk_w.sum(-1, keepdims=True)
    assert_close(combined, golden, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("strategy", ["default", "pallas"])
def test_shared_expert_ranks(rng, monkeypatch, strategy):
    """SKT_SHARED_EXPERT_RANK_NUM=2: ranks 0-1 receive one copy of every token
    (round-robin) and combine adds the shared contribution with weight 1."""
    monkeypatch.setenv("SKT_SHARED_EXPERT_RANK_NUM", "2")
    mesh = _mesh()
    s = 2
    e_routed = (R - s) * (E // R)  # experts on routed ranks
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T,
                 low_latency_strategy=strategy)
    total = R * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx = np.stack([rng.choice(e_routed, K, replace=False) for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)

    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    recv_x, _, packed, lr, handle = buf.low_latency_dispatch(
        xs, jnp.array(idx), quant_mode="bf16")
    packed = np.asarray(packed).reshape(R, E // R)
    # each rank sends T/2 tokens to each shared rank's expert-0 slot
    assert packed[0, 0] == R * (T // 2) and packed[1, 0] == R * (T // 2)

    combined = buf.low_latency_combine(
        recv_x, jnp.array(idx), jnp.array(w), handle)
    golden = x * (w.sum(-1, keepdims=True) + 1.0)  # identity experts: +1 shared
    assert_close(combined, golden, rtol=1e-3, atol=1e-3)


def test_recv_stats_accumulate(rng):
    mesh = _mesh()
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T)
    total = R * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx, w = _routing(rng, total)
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    stats = jnp.zeros((E,), jnp.int32)
    out = buf.low_latency_dispatch(xs, jnp.array(idx), "bf16",
                                   cumulative_local_expert_recv_stats=stats)
    stats = out[-1]
    out2 = buf.low_latency_dispatch(xs, jnp.array(idx), "bf16",
                                    cumulative_local_expert_recv_stats=stats)
    stats2 = np.asarray(out2[-1])
    per_expert = np.zeros(E, np.int64)
    for t_i in range(total):
        for kk in range(K):
            if idx[t_i, kk] >= 0:
                per_expert[idx[t_i, kk]] += 1
    np.testing.assert_array_equal(stats2, 2 * per_expert)


def test_long_seq_multi_round(rng):
    mesh = _mesh()
    strat = get_normal_strategy("default")
    total = R * T
    rounds = 4
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx, w = _routing(rng, total)

    def fn(x, i, ww):
        results = normal_mod.dispatch_long_seq(
            strat, x, i, ww, rounds=rounds, axis_name="ep",
            num_experts=E, num_ranks=R, capacity_factor=float(R))
        xs = [r.recv_x for r in results]
        hds = [r.handle for r in results]
        wl = [r.recv_topk_weights for r in results]
        return normal_mod.combine_long_seq(strat, xs, hds, wl, axis_name="ep")

    sm = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P("ep"), P("ep"), P("ep")),
        out_specs=(P("ep"), P("ep")), check_vma=False))
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    combined, _ = sm(xs, jnp.array(idx), jnp.array(w))
    w_valid = np.where(idx >= 0, w, 0.0)
    golden = x * w_valid.sum(-1, keepdims=True)
    assert_close(combined, golden, rtol=1e-3, atol=1e-3)


def test_low_latency_fp8_dispatch(rng):
    mesh = _mesh()
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T)
    total = R * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx, w = _routing(rng, total)
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    recv_x, scales, packed, lr, handle = buf.low_latency_dispatch(
        xs, jnp.array(idx), quant_mode="fp8")
    assert recv_x.dtype == jnp.float8_e4m3fn
    deq = jnp.array(np.asarray(recv_x, np.float32) * np.asarray(scales)[..., None])
    combined = buf.low_latency_combine(deq, jnp.array(idx), jnp.array(w), handle)
    w_valid = np.where(idx >= 0, w, 0.0)
    golden = x * w_valid.sum(-1, keepdims=True)
    assert_close(combined, golden, rtol=0.1, atol=0.1)


def test_notify_verify(rng):
    mesh = _mesh()
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T)
    total = R * T
    idx, _ = _routing(rng, total)
    rc, ro, ego, tot, mbs, per_exp = buf.notify_verify(jnp.array(idx))
    rc = np.asarray(rc).reshape(R, R)
    # total received == total copies after per-rank dedup
    el = E // R
    dedup = 0
    for t_i in range(total):
        dedup += len({e // el for e in idx[t_i] if e >= 0})
    assert int(np.asarray(tot).sum() / 1) == int(np.asarray(rc).sum()) == dedup
    # per-expert counts match global layout
    from sgl_kernel_npu_tpu.parallel import get_dispatch_layout
    _, g_nte, _ = get_dispatch_layout(jnp.array(idx), E, R)
    np.testing.assert_array_equal(np.asarray(per_exp).reshape(-1), np.asarray(g_nte))
