"""Single-kernel comm/compute-overlapped fused MoE (fused_moe_pallas) vs the
XLA-scheduled fused_deep_moe_shard oracle on the 8-device CPU mesh (the
TPU-interpret simulator gives the remote-DMA/semaphore protocol real
cross-device semantics off-chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import fused_moe
from sgl_kernel_npu_tpu.parallel.strategies.fused_moe_pallas import (
    fused_deep_moe_pallas_shard,
)
from sgl_kernel_npu_tpu.parallel.strategy import get_low_latency_strategy

from .utils import assert_close


def _qw(rng, e, kd, n):
    w = (rng.standard_normal((e, kd, n)) * 0.05).astype(np.float32)
    s = np.abs(w).max(axis=1) / 127.0 + 1e-8
    wq = np.clip(np.round(w / s[:, None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(wq), jnp.asarray(s, jnp.float32)


@pytest.mark.parametrize("r", [1, 4])
def test_fused_pallas_matches_xla_fused(rng, r):
    E_TOT, T, K, H, F = 2 * r, 16, 2, 256, 128
    mesh = Mesh(np.array(jax.devices()[:r]), ("ep",))
    total = r * T
    x = jnp.asarray(rng.standard_normal((total, H)) * 0.3, jnp.bfloat16)
    idx = jnp.asarray(
        np.stack([rng.choice(E_TOT, K, replace=False) for _ in range(total)]),
        jnp.int32)
    w = jnp.asarray(rng.random((total, K)), jnp.float32)
    w13q, w13s = _qw(rng, E_TOT, H, 2 * F)
    w2q, w2s = _qw(rng, E_TOT, F, H)
    strat = get_low_latency_strategy("default")

    def fn_pallas(x, i, ww, aq, as_, bq, bs_):
        return fused_deep_moe_pallas_shard(
            x, i, ww, aq, as_, bq, bs_, axis_name="ep", num_experts=E_TOT,
            num_ranks=r, num_max_dispatch_tokens_per_rank=T * K)

    def fn_xla(x, i, ww, aq, as_, bq, bs_):
        return fused_moe.fused_deep_moe_shard(
            x, i, ww, aq, as_, bq, bs_, strategy=strat, axis_name="ep",
            num_experts=E_TOT, num_ranks=r,
            num_max_dispatch_tokens_per_rank=T * K)

    ep = P("ep")
    specs = dict(in_specs=(ep, ep, ep, ep, ep, ep, ep), out_specs=ep,
                 check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, ep))
    args = (xs, idx, w, w13q, w13s, w2q, w2s)
    got = jax.jit(jax.shard_map(fn_pallas, mesh=mesh, **specs))(*args)
    want = jax.jit(jax.shard_map(fn_xla, mesh=mesh, **specs))(*args)
    # both paths quantize activations to int8 twice; tolerances match the
    # fused_deep_moe tests
    assert_close(np.asarray(got, np.float32), np.asarray(want, np.float32),
                 rtol=0.05, atol=0.05, name=f"r={r}")
    assert np.all(np.isfinite(np.asarray(got, np.float32)))
