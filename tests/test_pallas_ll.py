"""Pallas ICI dispatch/combine kernels (custom tier) vs the XLA oracle.

Two validation layers (see pallas_ll.py STATUS):
  * 1-device loopback (runs anywhere): the axis has one rank, so every remote
    DMA self-targets (device_id=me) and the asymmetric data-dependent
    chunk-count protocol executes — descriptors and semaphores are exercised
    without a multi-chip slice.
  * multi-device (real TPU slices AND the 8-device CPU mesh): off-TPU the
    kernels run under `pltpu.InterpretParams` — the TPU-interpret simulator
    with real cross-device remote-DMA/semaphore semantics — so the asymmetric
    protocol is validated at EP ∈ {2,4,8} with per-rank data-dependent
    traffic (skewed routing included), matching the reference's multi-rank
    dispatch/combine tests (tests/python/deepep/test_low_latency.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import Buffer

from .utils import assert_close

R, E, T, K, H = 8, 16, 8, 2, 32


# ------------------------------------------------------- 1-device loopback

def _loopback_case(quant_mode, rng, experts=4, t=8, k=2, h=32, maxt=8):
    """Dispatch+combine on a 1-rank mesh: every copy loops back to me via
    self-targeted remote DMA running the ASYMMETRIC protocol."""
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    x = rng.standard_normal((t, h), dtype=np.float32)
    idx = np.stack([rng.choice(experts, k, replace=False)
                    for _ in range(t)]).astype(np.int32)
    w = rng.random((t, k)).astype(np.float32)

    outs = {}
    for strat in ("default", "pallas"):
        buf = Buffer(mesh, experts, low_latency_strategy=strat,
                     num_max_dispatch_tokens_per_rank=maxt)
        recv_x, scales, packed, lr, handle = buf.low_latency_dispatch(
            jnp.array(x, jnp.float32 if quant_mode == "bf16" else jnp.float32),
            jnp.array(idx), quant_mode=quant_mode)
        if quant_mode == "int8":
            deq = jnp.array(np.asarray(recv_x, np.float32)
                            * np.asarray(scales)[..., None], jnp.float32)
        else:
            deq = recv_x
        comb = buf.low_latency_combine(deq, jnp.array(idx), jnp.array(w),
                                       handle)
        outs[strat] = (np.asarray(recv_x, np.float32), np.asarray(packed),
                       np.asarray(lr), np.asarray(comb))
    return x, idx, w, outs


def test_loopback_dispatch_combine_bf16(rng):
    x, idx, w, outs = _loopback_case("bf16", rng)
    d, p = outs["default"], outs["pallas"]
    np.testing.assert_array_equal(d[1], p[1])     # packed counts
    np.testing.assert_array_equal(d[2], p[2])     # layout ranges
    # valid slot regions agree exactly
    el = 4
    lr = d[2].reshape(1, el)
    for e in range(el):
        n = lr[0, e]
        if n:
            np.testing.assert_allclose(p[0][e, :n], d[0][e, :n], rtol=1e-6)
    # combine through the kernel matches the weighted-sum identity
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(p[3], x * w_valid.sum(-1, keepdims=True), rtol=1e-3, atol=1e-3)
    assert_close(p[3], d[3], rtol=1e-5, atol=1e-5)


def test_loopback_dispatch_combine_int8(rng):
    x, idx, w, outs = _loopback_case("int8", rng)
    p = outs["pallas"]
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(p[3], x * w_valid.sum(-1, keepdims=True), rtol=5e-2, atol=5e-2)


def test_loopback_skewed_routing(rng):
    """Data-dependent chunk counts: all tokens pile onto one expert so slice
    sizes range from 0 to t — the raggedness the symmetric fallback hides."""
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    experts, t, k, h, maxt = 4, 8, 2, 32, 8
    x = rng.standard_normal((t, h), dtype=np.float32)
    idx = np.zeros((t, k), np.int32)
    idx[:, 1] = 3                        # experts 0 and 3 only
    w = np.ones((t, k), np.float32)

    buf = Buffer(mesh, experts, low_latency_strategy="pallas",
                 num_max_dispatch_tokens_per_rank=maxt)
    recv_x, _, packed, lr, handle = buf.low_latency_dispatch(
        jnp.array(x), jnp.array(idx), quant_mode="bf16")
    packed = np.asarray(packed)
    np.testing.assert_array_equal(packed, [t, 0, 0, t])
    np.testing.assert_allclose(np.asarray(recv_x)[0, :t], x, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(recv_x)[3, :t], x, rtol=1e-6)
    comb = buf.low_latency_combine(recv_x, jnp.array(idx), jnp.array(w),
                                   handle)
    assert_close(np.asarray(comb), 2.0 * x, rtol=1e-3, atol=1e-3)


# ------------------------------------------------- multi-device (CPU + TPU)

multichip = pytest.mark.skipif(
    len(jax.devices()) < 2,
    reason="requires >=2 devices (real slice or the CPU test mesh)",
)


@multichip
@pytest.mark.parametrize("r", [2, 4, 8])
def test_pallas_dispatch_matches_default(rng, r):
    r = min(r, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:r]), ("ep",))
    total = r * T
    el = E // r
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx = np.stack([rng.choice(E, K, replace=False) for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))

    outs = {}
    for strat in ("default", "pallas"):
        buf = Buffer(mesh, E, low_latency_strategy=strat,
                     num_max_dispatch_tokens_per_rank=T)
        recv_x, _, packed, lr, handle = buf.low_latency_dispatch(
            xs, jnp.array(idx), quant_mode="bf16")
        comb = buf.low_latency_combine(recv_x, jnp.array(idx), jnp.array(w), handle)
        outs[strat] = (np.asarray(recv_x), np.asarray(packed), np.asarray(lr),
                       np.asarray(comb))

    d, p = outs["default"], outs["pallas"]
    np.testing.assert_array_equal(d[1], p[1])   # packed counts
    np.testing.assert_array_equal(d[2], p[2])   # layout ranges
    # valid slot regions agree exactly (padding is undefined in the kernel tier)
    lr = d[2].reshape(r, r, el)  # [dst, src, e]
    rx_d = d[0].reshape(r, el, r * T, H)
    rx_p = p[0].reshape(r, el, r * T, H)
    for dst in range(r):
        for src in range(r):
            for e in range(el):
                n = lr[dst, src, e]
                if n:
                    np.testing.assert_allclose(
                        rx_p[dst, e, src * T: src * T + n],
                        rx_d[dst, e, src * T: src * T + n], rtol=1e-6)
    # combine identity through the kernel-dispatched data
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(p[3], x * w_valid.sum(-1, keepdims=True), rtol=1e-3, atol=1e-3)


@multichip
def test_pallas_multidev_skewed_routing(rng):
    """Maximally asymmetric traffic: every token on every rank routes to
    experts living on rank 0 only, so rank 0 receives r*T*K rows while the
    others receive zero — the per-rank data-dependent chunk counts the
    symmetric fallback could never exercise."""
    r = min(4, len(jax.devices()))
    el = E // r
    mesh = Mesh(np.array(jax.devices()[:r]), ("ep",))
    total = r * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx = np.stack([rng.choice(el, K, replace=False)      # rank-0 experts
                    for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    # rank 0 must hold every copy: maxt >= r*T (all ranks' tokens land there)
    buf = Buffer(mesh, E, low_latency_strategy="pallas",
                 num_max_dispatch_tokens_per_rank=T)
    recv_x, _, packed, lr, handle = buf.low_latency_dispatch(
        xs, jnp.array(idx), quant_mode="bf16")
    packed = np.asarray(packed).reshape(r, el)
    assert packed[0].sum() == total * K and packed[1:].sum() == 0
    comb = buf.low_latency_combine(recv_x, jnp.array(idx), jnp.array(w),
                                   handle)
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(np.asarray(comb), x * w_valid.sum(-1, keepdims=True),
                 rtol=1e-3, atol=1e-3)


@multichip
def test_pallas_dispatch_int8(rng):
    r = min(R, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:r]), ("ep",))
    total = r * T
    x = rng.standard_normal((total, H), dtype=np.float32)
    idx = np.stack([rng.choice(E, K, replace=False) for _ in range(total)]).astype(np.int32)
    w = rng.random((total, K)).astype(np.float32)
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    buf = Buffer(mesh, E, low_latency_strategy="pallas",
                 num_max_dispatch_tokens_per_rank=T)
    recv_x, scales, packed, lr, handle = buf.low_latency_dispatch(
        xs, jnp.array(idx), quant_mode="int8")
    assert recv_x.dtype == jnp.int8
    deq = jnp.array(np.asarray(recv_x, np.float32) * np.asarray(scales)[..., None],
                    jnp.float32)
    comb = buf.low_latency_combine(deq, jnp.array(idx), jnp.array(w), handle)
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(comb, x * w_valid.sum(-1, keepdims=True), rtol=5e-2, atol=5e-2)
