"""Pallas ICI dispatch kernel (custom tier) vs the XLA-collective oracle.

Skipped off-TPU: interpret mode runs devices sequentially with sender-local
DMA semaphore accounting, so asymmetric remote writes are dropped (see
pallas_ll.py STATUS). These tests are the validation harness for a real
multi-chip slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu" or len(jax.devices()) < 2,
    reason="requires real multi-chip TPU (interpret-mode RDMA is unsound for asymmetric traffic)",
)
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import Buffer

from .utils import assert_close

R, E, T, K, H = 8, 16, 8, 2, 32


def test_pallas_dispatch_matches_default(rng):
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    total = R * T
    el = E // R
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
    lr = d[2].reshape(R, R, el)  # [dst, src, e]
    rx_d = d[0].reshape(R, el, R * T, H)
    rx_p = p[0].reshape(R, el, R * T, H)
    for dst in range(R):
        for src in range(R):
            for e in range(el):
                n = lr[dst, src, e]
                if n:
                    np.testing.assert_allclose(
                        rx_p[dst, e, src * T: src * T + n],
                        rx_d[dst, e, src * T: src * T + n], rtol=1e-6)
    # combine identity through the kernel-dispatched data
    w_valid = np.where(idx >= 0, w, 0.0)
    assert_close(p[3], x * w_valid.sum(-1, keepdims=True), rtol=1e-3, atol=1e-3)


def test_pallas_dispatch_int8(rng):
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    total = R * T
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
