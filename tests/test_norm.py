"""Norm family vs numpy goldens (reference tests: test_add_rmsnorm_bias.py,
test_rmsnorm_split.py, test_rmsnorm_without_weight.py, test_l1_norm.py,
test_scale_shift.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import norm

from .utils import assert_close


def _golden_rms(h, w, b, eps):
    h = h.astype(np.float32)
    var = (h * h).mean(axis=-1, keepdims=True)
    return h / np.sqrt(var + eps) * w + b


def test_add_rmsnorm_bias_unquantized(rng):
    n, d = 64, 512
    x = rng.standard_normal((n, d), dtype=np.float32)
    res = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal(d, dtype=np.float32)
    b = rng.standard_normal(d, dtype=np.float32) * 0.1
    out, h = norm.add_rmsnorm_bias(jnp.array(x), jnp.array(res), jnp.array(w), jnp.array(b), 1e-6)
    assert_close(h, x + res, name="residual")
    assert_close(out, _golden_rms(x + res, w, b, 1e-6), name="norm")


def test_add_rmsnorm_bias_quantized(rng):
    n, d = 32, 256
    x = rng.standard_normal((n, d), dtype=np.float32)
    res = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal(d, dtype=np.float32)
    b = np.zeros(d, dtype=np.float32)
    qs = np.full(d, 20.0, dtype=np.float32)
    qo = np.zeros(d, dtype=np.float32)
    out, h = norm.add_rmsnorm_bias(
        jnp.array(x), jnp.array(res), jnp.array(w), jnp.array(b), 1e-6,
        jnp.array(qs), jnp.array(qo),
    )
    assert out.dtype == jnp.int8
    golden = np.clip(np.round(_golden_rms(x + res, w, b, 1e-6) * qs + qo), -128, 127)
    # int8 rounding: allow off-by-one on ties
    assert np.abs(np.asarray(out, np.int32) - golden).max() <= 1


def test_add_rmsnorm_bias_quant_pallas_interpret(rng):
    """Force the Pallas kernel (interpret mode on CPU) and match the ref twin."""
    import sgl_kernel_npu_tpu.utils as U

    n, d = 16, 128
    x = rng.standard_normal((n, d), dtype=np.float32)
    res = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal(d, dtype=np.float32)
    b = rng.standard_normal(d, dtype=np.float32) * 0.1
    qs = np.full(d, 15.0, dtype=np.float32)
    qo = np.full(d, 1.0, dtype=np.float32)
    args = [jnp.array(a) for a in (x, res, w, b)]
    qargs = [jnp.array(a) for a in (qs, qo)]
    out_p, h_p = norm._add_rmsnorm_quant_pallas(*args, *qargs, 1e-6)
    out_r, h_r = norm.add_rmsnorm_bias_ref(*args, 1e-6, *qargs)
    assert_close(h_p, h_r)
    assert np.abs(np.asarray(out_p, np.int32) - np.asarray(out_r, np.int32)).max() <= 1


def test_rmsnorm_bias(rng):
    n, d = 16, 128
    x = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal(d, dtype=np.float32)
    b = rng.standard_normal(d, dtype=np.float32)
    out = norm.rmsnorm_bias(jnp.array(x), jnp.array(w), jnp.array(b), 1e-6)
    assert_close(out, _golden_rms(x, w, b, 1e-6))


def test_gemma_rmsnorm(rng):
    n, d = 8, 64
    x = rng.standard_normal((n, d), dtype=np.float32)
    res = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal(d, dtype=np.float32)
    out, h = norm.add_gemma_rms_norm(jnp.array(x), jnp.array(res), jnp.array(w), 1e-6)
    assert_close(out, _golden_rms(x + res, 1.0 + w, 0.0, 1e-6))


def test_rmsnorm_split_matches_fused(rng):
    b, l, c = 2, 8, 96
    x = rng.standard_normal((b, l, c), dtype=np.float32)
    w = rng.standard_normal(c, dtype=np.float32)
    var = norm.fused_variance(jnp.array(x))
    out = norm.fused_rsqrt_mul(jnp.array(x), var, jnp.array(w), 1e-6)
    assert_close(out, _golden_rms(x, w, 0.0, 1e-6), rtol=2e-2)


def test_rmsnorm_without_weight(rng):
    x = rng.standard_normal((4, 7, 33), dtype=np.float32)
    out = norm.rmsnorm_without_weight(jnp.array(x), 1e-6)
    assert_close(out, _golden_rms(x, 1.0, 0.0, 1e-6))


def test_l1_norm(rng):
    x = rng.standard_normal((5, 17), dtype=np.float32)
    out = norm.l1_norm(jnp.array(x))
    assert_close(out, x / np.abs(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("shift_kind", ["scalar", "hidden", "full"])
def test_fused_scale_shift(rng, shift_kind):
    b, t, d = 2, 4, 32
    x = rng.standard_normal((b, t, d), dtype=np.float32)
    scale = rng.standard_normal(d, dtype=np.float32)
    shift = {
        "scalar": rng.standard_normal(1, dtype=np.float32),
        "hidden": rng.standard_normal(d, dtype=np.float32),
        "full": rng.standard_normal((b, t, d), dtype=np.float32),
    }[shift_kind]
    out = norm.fused_scale_shift(jnp.array(x), jnp.array(scale), jnp.array(shift), 2.0)
    assert_close(out, x * (scale * 2.0) + shift.reshape(shift.shape if shift_kind == "full" else -1))
