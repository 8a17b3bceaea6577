"""swiglu_quant / swiglu_oai vs goldens (reference: test_swiglu_quant.py:7-57)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import activation

from .utils import assert_close


def _golden_swiglu(x, do_limit=False, limit=7.0):
    x = x.astype(np.float32)
    h = x.shape[-1] // 2
    x1, x2 = x[..., :h], x[..., h:]
    if do_limit:
        gate = np.minimum(x1 / (1 + np.exp(-x1)), limit)
        up = np.clip(x2, -limit, limit)
        return gate * up
    return x1 / (1 + np.exp(-x1)) * x2


@pytest.mark.parametrize("group_list_type", [0, 1])
@pytest.mark.parametrize("do_limit", [False, True])
def test_swiglu_quant_ref(rng, group_list_type, do_limit):
    s, h = 24, 64
    x = rng.standard_normal((s, h), dtype=np.float32) * 3
    counts = np.array([5, 0, 7, 4], dtype=np.int32)  # total 16 < 24 rows
    gl = np.cumsum(counts) if group_list_type == 0 else counts
    if group_list_type == 0:
        gl = np.concatenate([[0], gl]).astype(np.int32)  # cusum list indexed [NUM_EXPERTS]
    out, scale = activation.swiglu_quant_ref(
        jnp.array(x), jnp.array(gl), group_list_type, need_quant=True,
        do_limit=do_limit, limit=2.0,
    )
    total = 16
    golden = _golden_swiglu(x, do_limit, 2.0)
    g_scale = np.abs(golden[:total]).max(-1) / 127.0
    assert_close(scale[:total], g_scale, rtol=1e-3, atol=1e-5)
    deq = np.asarray(out[:total], np.float32) * np.asarray(scale[:total])[:, None]
    # quantization error is bounded by half a step (= scale/2) per element
    tol = np.maximum(g_scale * 0.51, 1e-6)[:, None]
    assert np.all(np.abs(deq - golden[:total]) <= tol)
    assert np.all(np.asarray(out[total:]) == 0)


def test_swiglu_quant_pallas_matches_ref(rng):
    s, h = 16, 128
    x = rng.standard_normal((s, h), dtype=np.float32) * 2
    gl = np.array([10, 6], dtype=np.int32)
    out_r, scale_r = activation.swiglu_quant_ref(jnp.array(x), jnp.array(gl), 1, True)
    total = jnp.array(16, jnp.int32)
    out_p, scale_p = activation._swiglu_quant_pallas(jnp.array(x), total, False, 7.0)
    assert_close(scale_p, scale_r, rtol=1e-5, atol=1e-7)
    assert np.abs(np.asarray(out_p, np.int32) - np.asarray(out_r, np.int32)).max() <= 1


def test_swiglu_no_quant(rng):
    s, h = 8, 32
    x = rng.standard_normal((s, h), dtype=np.float32)
    gl = np.array([8], dtype=np.int32)
    out, _ = activation.swiglu_quant_ref(jnp.array(x), jnp.array(gl), 1, need_quant=False)
    assert_close(out, _golden_swiglu(x))


def test_swiglu_oai(rng):
    s, h = 8, 64
    x = rng.standard_normal((s, h), dtype=np.float32) * 4
    out = activation.swiglu_oai(jnp.array(x), alpha=1.702, limit=7.0)
    gate = np.minimum(x[..., 0::2], 7.0)
    up = np.clip(x[..., 1::2], -7.0, 7.0)
    golden = (up + 1) * (gate / (1 + np.exp(-gate * 1.702)))
    assert_close(out, golden)
