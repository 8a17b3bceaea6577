"""Parameter-sweep robustness (reference: scripts/enumerate_test_low_latency.sh
grid over procs/tokens/hidden/topk/experts; generalization_test_fused_deep_moe.sh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.ops.attention import decode
from sgl_kernel_npu_tpu.parallel import Buffer

from .utils import assert_close


@pytest.mark.parametrize("hq,hkv,dk,ps", [
    (8, 8, 64, 16),    # MHA
    (16, 2, 32, 8),    # heavy GQA
    (4, 4, 128, 32),   # big head dim
])
def test_decode_gqa_shapes(rng, hq, hkv, dk, ps):
    b, mp = 2, 3
    num_pages = b * mp + 1
    q = rng.standard_normal((b, hq, dk)).astype(np.float32)
    kc = rng.standard_normal((hkv, num_pages, ps, dk)).astype(np.float32)
    vc = rng.standard_normal((hkv, num_pages, ps, dk)).astype(np.float32)
    bt = (np.arange(b * mp).reshape(b, mp) + 1).astype(np.int32)
    sl = np.array([ps * mp, ps + 3], np.int32)
    out_p = decode.decode_gqa_pallas(jnp.array(q), jnp.array(kc), jnp.array(vc),
                                     jnp.array(sl), jnp.array(bt), 0.2, ps)
    out_r = decode.decode_gqa_ref(jnp.array(q), jnp.array(kc), jnp.array(vc),
                                  jnp.array(sl), jnp.array(bt), 0.2, ps)
    assert_close(out_p, np.asarray(out_r), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("e,t,k", [(8, 4, 1), (32, 16, 8), (16, 1, 2)])
def test_ep_dispatch_shapes(rng, e, t, k):
    r = 8
    mesh = Mesh(np.array(jax.devices()[:r]), ("ep",))
    buf = Buffer(mesh, e, num_max_dispatch_tokens_per_rank=max(t, 1))
    total = r * t
    h = 32
    x = rng.standard_normal((total, h)).astype(np.float32)
    idx = np.stack([rng.choice(e, k, replace=False) for _ in range(total)]).astype(np.int32)
    w = rng.random((total, k)).astype(np.float32)
    xs = jax.device_put(jnp.array(x), jax.NamedSharding(mesh, P("ep")))
    recv_x, _, packed, lr, handle = buf.low_latency_dispatch(xs, jnp.array(idx), "bf16")
    assert int(np.asarray(packed).sum()) == (idx >= 0).sum()
    combined = buf.low_latency_combine(recv_x, jnp.array(idx), jnp.array(w), handle)
    golden = x * w.sum(-1, keepdims=True)
    assert_close(combined, golden, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("t,c", [(5, 16), (64, 16), (100, 32)])
def test_gdn_chunk_sizes(rng, t, c):
    from sgl_kernel_npu_tpu.ops import gdn
    b, h, d = 1, 2, 16
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    g = (-rng.random((b, t, h)) * 0.3).astype(np.float32)
    beta = rng.random((b, t, h)).astype(np.float32)
    out16, st16 = gdn.chunk_gated_delta_rule(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(g), jnp.array(beta),
        chunk_size=c, output_final_state=True, use_qk_l2norm_in_kernel=True)
    # chunk-size invariance: different chunk size, same result
    out8, st8 = gdn.chunk_gated_delta_rule(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(g), jnp.array(beta),
        chunk_size=8, output_final_state=True, use_qk_l2norm_in_kernel=True)
    assert_close(out16, np.asarray(out8), rtol=1e-3, atol=1e-3)
    assert_close(st16, np.asarray(st8), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("hkv,g,ps,d", [
    (1, 1, 8, 32), (2, 4, 16, 64), (8, 4, 32, 128), (4, 1, 16, 32),
])
def test_decode_v4_int8_shape_sweep(rng, hkv, g, ps, d):
    """v4 fused kernel across head/group/page/dim shapes vs scatter+v3."""
    import jax.numpy as jnp
    from sgl_kernel_npu_tpu.ops.attention import decode_v3, decode_v4

    L, b = 2, 2
    hq = hkv * g
    li = 1
    P = 2 * b * 3 + 1
    sm = 1.0 / d ** 0.5
    kc = jnp.asarray(rng.integers(-127, 128, (L, P, hkv, ps, d)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (L, P, hkv, ps, d)), jnp.int8)
    ks = jnp.asarray(rng.random((L, P, hkv, 1, ps)) * 0.01 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.random((L, P, hkv, 1, ps)) * 0.01 + 1e-3, jnp.float32)
    seq = jnp.array([ps, 2 * ps + 1], jnp.int32)      # page-exact + cross-page
    bt = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    pos = seq - 1
    slots = bt[jnp.arange(b), pos // ps] * ps + pos % ps
    q = jnp.asarray(rng.standard_normal((b, hq, d)) * 0.3, jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, hkv, d)) * 0.3, jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, hkv, d)) * 0.3, jnp.bfloat16)

    kl, vl, ksl, vsl = decode_v3.reshape_and_cache_gqa_page_major_int8(
        kn, vn, kc[li], vc[li], ks[li], vs[li], slots)
    ref = decode_v3.decode_gqa_pallas_v3_int8(q, kl, vl, ksl, vsl, seq, bt,
                                              sm, ps)
    att, kc2, *_ = decode_v4.decode_fused_v4_int8(
        q, kn, vn, kc, vc, ks, vs, seq, bt, slots, jnp.int32(li), sm, ps)
    np.testing.assert_array_equal(np.asarray(kc2[li]), np.asarray(kl))
    from .utils import calc_diff
    assert calc_diff(np.asarray(att, np.float32),
                     np.asarray(ref, np.float32)) < 1e-3
