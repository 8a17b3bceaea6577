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


