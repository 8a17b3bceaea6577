"""Layered (hierarchical dcn+ici) dispatch vs the flat single-axis oracle on a
(2, 4) mesh of the 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel.strategy import get_low_latency_strategy

from .utils import assert_close

DCN, ICI = 2, 4
R, E, T, K, H = DCN * ICI, 16, 8, 2, 32


def test_layered_matches_flat(rng):
    devs = np.array(jax.devices()[:R]).reshape(DCN, ICI)
    mesh = Mesh(devs, ("dcn", "ici"))
    total = R * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx = np.stack([rng.choice(E, K, replace=False) for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)

    layered = get_low_latency_strategy("layered")
    flat = get_low_latency_strategy("default")

    def run_layered(x, i, ww):
        res = layered.low_latency_dispatch(
            x, i, axis_name=("dcn", "ici"), num_experts=E, num_ranks=R,
            num_max_dispatch_tokens_per_rank=T, quant_mode="bf16")
        comb = layered.low_latency_combine(
            res.recv_x, i, ww, res.handle, axis_name=("dcn", "ici"))
        return res.recv_x, res.layout_range, res.packed_recv_count, comb

    def run_flat(x, i, ww):
        res = flat.low_latency_dispatch(
            x, i, axis_name=("dcn", "ici"), num_experts=E, num_ranks=R,
            num_max_dispatch_tokens_per_rank=T, quant_mode="bf16")
        return res.recv_x, res.layout_range, res.packed_recv_count

    spec = P(("dcn", "ici"))
    sm_l = jax.jit(jax.shard_map(run_layered, mesh=mesh,
                                 in_specs=(spec, spec, spec),
                                 out_specs=(spec, spec, spec, spec),
                                 check_vma=False))
    sm_f = jax.jit(jax.shard_map(run_flat, mesh=mesh,
                                 in_specs=(spec, spec, spec),
                                 out_specs=(spec, spec, spec),
                                 check_vma=False))
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, spec))
    rx_l, lr_l, pc_l, comb = sm_l(xs, jnp.array(idx), jnp.array(w))
    rx_f, lr_f, pc_f = sm_f(xs, jnp.array(idx), jnp.array(w))

    np.testing.assert_array_equal(np.asarray(pc_l), np.asarray(pc_f))
    np.testing.assert_array_equal(np.asarray(lr_l), np.asarray(lr_f))
    # valid slot regions identical
    el = E // R
    lr = np.asarray(lr_f).reshape(R, R, el)
    a = np.asarray(rx_l).reshape(R, el, R * T, H)
    b = np.asarray(rx_f).reshape(R, el, R * T, H)
    for dst in range(R):
        for src in range(R):
            for e in range(el):
                n = lr[dst, src, e]
                if n:
                    np.testing.assert_allclose(
                        a[dst, e, src * T:src * T + n],
                        b[dst, e, src * T:src * T + n], rtol=1e-6)
    # combine identity through the layered-dispatched data
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(comb, x * w_valid.sum(-1, keepdims=True), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("quant", ["bf16", "int8"])
def test_layered_normal_matches_flat(rng, quant):
    """Layered NORMAL-mode dispatch (two-hop, ref dispatch_normal_a2.h) must
    produce buffers bit-identical to the flat single-axis strategy, and its
    combine must satisfy the round-trip identity."""
    from sgl_kernel_npu_tpu.parallel.strategy import get_normal_strategy

    devs = np.array(jax.devices()[:R]).reshape(DCN, ICI)
    mesh = Mesh(devs, ("dcn", "ici"))
    total = R * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx = np.stack([rng.choice(E, K, replace=False)
                    for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)

    layered = get_normal_strategy("layered")
    flat = get_normal_strategy("default")
    kw = dict(num_experts=E, num_ranks=R, quant_mode=quant,
              capacity_factor=float(R))

    def run(strat, do_combine):
        def fn(x, i, ww):
            res = strat.dispatch(x, i, ww, axis_name=("dcn", "ici"), **kw)
            outs = (res.recv_x, res.recv_topk_idx, res.recv_topk_weights,
                    res.recv_count[None], res.recv_tokens_per_expert)
            if do_combine:
                comb_x = res.recv_x
                if quant == "int8":
                    comb_x = (res.recv_x.astype(jnp.float32)
                              * res.recv_x_scales).astype(jnp.float32)
                comb, _ = strat.combine(comb_x, res.handle,
                                        res.recv_topk_weights,
                                        axis_name=("dcn", "ici"))
                outs = outs + (comb,)
            return outs
        spec = P(("dcn", "ici"))
        n_out = 6 if do_combine else 5
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=tuple([spec] * n_out), check_vma=False))

    xs = jax.device_put(jnp.array(x),
                        jax.NamedSharding(mesh, P(("dcn", "ici"))))
    out_l = run(layered, True)(xs, jnp.array(idx), jnp.array(w))
    out_f = run(flat, False)(xs, jnp.array(idx), jnp.array(w))

    for a, b, name in zip(out_l[:5], out_f,
                          ["recv_x", "idx", "w", "count", "per_expert"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)

    # combine identity through the layered handle
    w_valid = w  # no -1 entries in this routing
    golden = x * w_valid.sum(-1, keepdims=True)
    tol = 0.06 if quant == "int8" else 1e-3
    assert_close(out_l[5], golden, rtol=tol, atol=tol, name="layered combine")
