"""helloworld op pattern + rope helpers (reference: test_hello_world.py,
test_fused_rope_qk_mqa.py)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import helloworld as hw
from sgl_kernel_npu_tpu.ops import rope

from .utils import assert_close


def test_helloworld(rng):
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((16, 128)), jnp.bfloat16)
    out = hw.helloworld(x, y)
    assert_close(out, np.asarray(x, np.float32) + np.asarray(y, np.float32),
                 rtol=1e-2, atol=1e-2)
    out_p = hw.helloworld_pallas(x, y)
    np.testing.assert_array_equal(np.asarray(out_p, np.float32),
                                  np.asarray(hw.helloworld_ref(x, y), np.float32))
    assert "sgl_kernel_npu_tpu" in hw.version_info()


def test_fused_rope_qk_mqa(rng):
    t, hq, d, rot = 6, 4, 32, 32
    q = rng.standard_normal((t, hq * d)).astype(np.float32)
    k = rng.standard_normal((t, d)).astype(np.float32)
    cs = np.asarray(rope.make_cos_sin_cache(t, rot))
    q2, k2 = rope.fused_rope_qk_mqa(jnp.array(q), jnp.array(k), jnp.array(cs), rot)
    # golden neox rope per head
    cos, sin = cs[:, : rot // 2], cs[:, rot // 2:]
    def rot_neox(x, c, s):
        h = x.shape[-1] // 2
        return np.concatenate([x[..., :h] * c - x[..., h:] * s,
                               x[..., h:] * c + x[..., :h] * s], -1)
    gq = q.reshape(t, hq, d).copy()
    for hh in range(hq):
        gq[:, hh, :rot] = rot_neox(gq[:, hh, :rot], cos, sin)
    gk = k.copy()
    gk[:, :rot] = rot_neox(k[:, :rot], cos, sin)
    assert_close(q2.reshape(t, hq, d), gq, rtol=1e-4, atol=1e-4)
    assert_close(k2, gk, rtol=1e-4, atol=1e-4)


def test_make_cos_sin_cache_identity_at_zero():
    cs = np.asarray(rope.make_cos_sin_cache(4, 8))
    np.testing.assert_allclose(cs[0, :4], 1.0)   # cos(0)
    np.testing.assert_allclose(cs[0, 4:], 0.0)   # sin(0)


def test_sampling_ops(rng):
    import jax
    import jax.numpy as jnp
    from sgl_kernel_npu_tpu.ops import sampling

    logits = jnp.asarray(rng.standard_normal((4, 64)) * 3, jnp.float32)

    # greedy passthrough
    ids = sampling.sample(logits, jax.random.PRNGKey(0), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.asarray(jnp.argmax(logits, -1)))

    # top-k=1 equals greedy regardless of temperature/noise
    ids = sampling.sample(logits, jax.random.PRNGKey(1), temperature=2.0, top_k=1)
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.asarray(jnp.argmax(logits, -1)))

    # top-k masks exactly k survivors
    m = sampling.top_k_mask(logits, 5)
    assert int((np.asarray(m) > -1e29).sum(1).max()) == 5

    # top-p keeps the smallest nucleus: p→0 keeps only the top token
    m = sampling.top_p_mask(logits, 1e-9)
    assert int((np.asarray(m) > -1e29).sum()) == 4
    # nucleus contains the top token and its mass is >= p for p=0.6
    m = np.asarray(sampling.top_p_mask(logits, 0.6))
    probs = np.asarray(jax.nn.softmax(logits, -1))
    for i in range(4):
        keep = m[i] > -1e29
        assert keep[probs[i].argmax()]
        assert probs[i][keep].sum() >= 0.6 - 1e-5

    # min_p: all survivors within factor of max prob
    m = np.asarray(sampling.min_p_mask(logits, 0.3))
    for i in range(4):
        keep = m[i] > -1e29
        assert probs[i][keep].min() >= 0.3 * probs[i].max() - 1e-7

    # sampled ids are always inside the top-k mask
    ids = np.asarray(sampling.sample(logits, jax.random.PRNGKey(2),
                                     temperature=1.5, top_k=3))
    topk_sets = np.argsort(-np.asarray(logits), -1)[:, :3]
    for i in range(4):
        assert ids[i] in topk_sets[i]


def test_apply_penalties(rng):
    import jax.numpy as jnp
    from sgl_kernel_npu_tpu.ops import sampling

    logits = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    out_ids = jnp.array([[3, 3, 5, 0], [7, 0, 0, 0]], jnp.int32)
    out_len = jnp.array([3, 1], jnp.int32)

    x = np.asarray(sampling.apply_penalties(
        logits, out_ids, out_len, presence_penalty=0.5, frequency_penalty=0.25))
    base = np.asarray(logits)
    # token 3 appeared twice for row 0: -0.5 - 2*0.25
    np.testing.assert_allclose(x[0, 3], base[0, 3] - 1.0, rtol=1e-6)
    np.testing.assert_allclose(x[0, 5], base[0, 5] - 0.75, rtol=1e-6)
    np.testing.assert_allclose(x[0, 1], base[0, 1], rtol=1e-6)  # unseen
    # row 1: padding (ids 0 beyond len) must NOT count
    np.testing.assert_allclose(x[1, 0], base[1, 0], rtol=1e-6)
    np.testing.assert_allclose(x[1, 7], base[1, 7] - 0.75, rtol=1e-6)

    # repetition penalty scales seen tokens toward smaller probability
    x2 = np.asarray(sampling.apply_penalties(
        logits, out_ids, out_len, repetition_penalty=2.0))
    assert x2[0, 3] == (base[0, 3] / 2 if base[0, 3] > 0 else base[0, 3] * 2)
