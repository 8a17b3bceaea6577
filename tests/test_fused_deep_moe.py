"""fused_deep_moe vs a dense numpy MoE golden (reference:
tests/python/deepep/test_fused_deep_moe.py pattern: quantized fused layer vs
unquantized dense computation within calc_diff tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.ops import moe_helpers
from sgl_kernel_npu_tpu.parallel import Buffer

from .utils import calc_diff

R, E, T, K = 8, 16, 8, 4
H, F = 64, 128


def _quant_weights(rng, e, kdim, n):
    w = (rng.standard_normal((e, kdim, n)) * 0.05).astype(np.float32)
    scale = np.abs(w).max(axis=1) / 127.0 + 1e-8  # [e, n] per-channel
    wq = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)
    return w, wq, scale.astype(np.float32)


def _dense_moe(x, topk_idx, topk_w, w13, w2):
    out = np.zeros_like(x)
    for t in range(x.shape[0]):
        for k in range(K):
            e = topk_idx[t, k]
            if e < 0:
                continue
            ug = x[t] @ w13[e]
            f = ug.shape[0] // 2
            act = ug[:f] / (1 + np.exp(-ug[:f])) * ug[f:]
            out[t] += topk_w[t, k] * (act @ w2[e])
    return out


@pytest.mark.parametrize("strategy", ["default", "alltoall"])
def test_fused_deep_moe(rng, strategy):
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    buf = Buffer(mesh, E, low_latency_strategy=strategy,
                 num_max_dispatch_tokens_per_rank=T)
    total = R * T
    x = (rng.standard_normal((total, H)) * 0.3).astype(np.float32)
    topk_idx = np.stack([rng.choice(E, K, replace=False) for _ in range(total)]).astype(np.int32)
    topk_idx[0, 0] = -1  # dropped slot
    topk_w = (rng.random((total, K)) * 0.5).astype(np.float32)

    w13, w13q, w13s = _quant_weights(rng, E, H, 2 * F)
    w2, w2q, w2s = _quant_weights(rng, E, F, H)

    xs = jax.device_put(jnp.array(x, jnp.bfloat16), jax.NamedSharding(mesh, P("ep")))
    out = buf.fused_deep_moe(
        xs, jnp.array(topk_idx), jnp.array(topk_w),
        jnp.array(w13q), jnp.array(w13s), jnp.array(w2q), jnp.array(w2s),
    )
    golden = _dense_moe(x, topk_idx, topk_w, w13, w2)
    diff = calc_diff(np.asarray(out, np.float32), golden)
    assert diff < 2e-3, f"cosine diff {diff}"


def test_mul_add(rng):
    a = rng.standard_normal((4, 8), dtype=np.float32)
    b = rng.standard_normal((4, 8), dtype=np.float32)
    out = moe_helpers.mul_add(jnp.array(a), jnp.array(b), 1.5)
    np.testing.assert_allclose(np.asarray(out), a * 1.5 + b, rtol=1e-5)


def test_zero_experts_compute_identity(rng):
    s, d, k, ne = 4, 8, 3, 10
    idx = np.array([[1, 12, 3], [11, 13, 2], [0, 1, 2], [10, 10, 10]], np.int32)
    scales = rng.random((s, k)).astype(np.float32)
    hs = rng.standard_normal((s, d), dtype=np.float32)
    zr, ni, ns = moe_helpers.zero_experts_compute_identity(
        jnp.array(idx), jnp.array(scales), ne, "identity", jnp.array(hs)
    )
    is_zero = idx >= ne
    golden = hs * (scales * is_zero).sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(zr), golden, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ni), np.where(is_zero, 0, idx))
    np.testing.assert_allclose(np.asarray(ns), np.where(is_zero, 0, scales))


def test_fused_deep_moe_pallas_gmm_matches_ref_path(monkeypatch, rng):
    """SKT_IMPL=pallas routes the grouped GEMMs through the aligned Pallas
    kernel (interpret off-TPU); outputs must match the ragged_dot path."""
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    total = R * T
    x = (rng.standard_normal((total, H)) * 0.3).astype(np.float32)
    topk_idx = np.stack([rng.choice(E, K, replace=False)
                         for _ in range(total)]).astype(np.int32)
    topk_w = (rng.random((total, K)) * 0.5).astype(np.float32)
    _, w13q, w13s = _quant_weights(rng, E, H, 2 * F)
    _, w2q, w2s = _quant_weights(rng, E, F, H)

    def run():
        buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T)
        xs = jax.device_put(jnp.array(x, jnp.bfloat16),
                            jax.NamedSharding(mesh, P("ep")))
        return np.asarray(buf.fused_deep_moe(
            xs, jnp.array(topk_idx), jnp.array(topk_w),
            jnp.array(w13q), jnp.array(w13s), jnp.array(w2q), jnp.array(w2s)),
            np.float32)

    monkeypatch.setenv("SKT_IMPL", "ref")
    out_ref = run()
    monkeypatch.setenv("SKT_IMPL", "pallas")
    out_pal = run()
    assert calc_diff(out_ref, out_pal) < 1e-5


@pytest.mark.parametrize("rounds", [2, 4])
def test_fused_deep_moe_chunked_matches_unchunked(rng, rounds):
    """chunk_rounds pipelining (comm/compute overlap) is semantics-preserving:
    the chunked layer equals the single-round layer bitwise-tolerance-wise."""
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T)
    total = R * T
    x = (rng.standard_normal((total, H)) * 0.3).astype(np.float32)
    topk_idx = np.stack([rng.choice(E, K, replace=False)
                         for _ in range(total)]).astype(np.int32)
    topk_w = (rng.random((total, K)) * 0.5).astype(np.float32)
    w13, w13q, w13s = _quant_weights(rng, E, H, 2 * F)
    w2, w2q, w2s = _quant_weights(rng, E, F, H)
    xs = jax.device_put(jnp.array(x, jnp.bfloat16),
                        jax.NamedSharding(mesh, P("ep")))
    args = (xs, jnp.array(topk_idx), jnp.array(topk_w), jnp.array(w13q),
            jnp.array(w13s), jnp.array(w2q), jnp.array(w2s))
    base = np.asarray(buf.fused_deep_moe(*args), np.float32)
    chunked = np.asarray(buf.fused_deep_moe(*args, chunk_rounds=rounds),
                         np.float32)
    assert calc_diff(chunked, base) < 1e-5
    golden = _dense_moe(x, topk_idx, topk_w, w13, w2)
    assert calc_diff(chunked, golden) < 2e-3


def test_dispatch_ffn_combine_matches_fused_and_counts(rng):
    """FuseMode 2 (aclnnDispatchFFNCombine parity): int64 bit-pattern scales,
    received-token bound semantics, per-local-expert count return — the output
    must equal fused_deep_moe's and the dense golden; expert_token_nums must
    equal the actual per-local-expert routed counts
    (ref: python/deep_ep/doc/FUSED_DEEP_MOE.md:44-52 differences table)."""
    from sgl_kernel_npu_tpu.parallel.buffer import FuseMode

    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    buf = Buffer(mesh, E, num_max_dispatch_tokens_per_rank=T)
    total = R * T
    x = (rng.standard_normal((total, H)) * 0.3).astype(np.float32)
    topk_idx = np.stack([rng.choice(E, K, replace=False)
                         for _ in range(total)]).astype(np.int32)
    topk_idx[0, 0] = -1  # dropped slot
    topk_w = (rng.random((total, K)) * 0.5).astype(np.float32)
    w13, w13q, w13s = _quant_weights(rng, E, H, 2 * F)
    w2, w2q, w2s = _quant_weights(rng, E, F, H)

    def to_i64(s):  # the reference caller-side conversion (test:61-70)
        return np.frombuffer(s.astype(np.float32).tobytes(),
                             np.int32).astype(np.int64).reshape(s.shape)

    xs = jax.device_put(jnp.array(x, jnp.bfloat16),
                        jax.NamedSharding(mesh, P("ep")))
    out, nums = buf.fused_deep_moe(
        xs, jnp.array(topk_idx), jnp.array(topk_w),
        jnp.array(w13q), jnp.array(to_i64(w13s)),
        jnp.array(w2q), jnp.array(to_i64(w2s)),
        fuse_mode=FuseMode.DISPATCH_FFN_COMBINE)
    golden = _dense_moe(x, topk_idx, topk_w, w13, w2)
    assert calc_diff(np.asarray(out, np.float32), golden) < 2e-3

    # identical numerics to FuseMode 1 at the same routing
    base = np.asarray(buf.fused_deep_moe(
        xs, jnp.array(topk_idx), jnp.array(topk_w),
        jnp.array(w13q), jnp.array(w13s), jnp.array(w2q), jnp.array(w2s)),
        np.float32)
    assert calc_diff(np.asarray(out, np.float32), base) < 1e-5

    # expert_token_nums [EP, El]: per-rank local-expert counts
    nums = np.asarray(nums)
    el = E // R
    assert nums.shape == (R, el)
    expect = np.zeros(E, np.int64)
    for e in topk_idx.reshape(-1):
        if e >= 0:
            expect[e] += 1
    np.testing.assert_array_equal(nums.reshape(-1), expect)
