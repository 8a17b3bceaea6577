"""Norm-family ops: fused residual-add + RMSNorm (+bias, +INT8 quant), gemma
variant, RMSNorm split (variance / rsqrt-mul), no-weight RMSNorm, L1 norm,
scale-shift.

Reference parity (python/sgl_kernel_npu/sgl_kernel_npu/norm/):
  add_rmsnorm_bias.py:9-148   -> add_rmsnorm_bias / add_gemma_rms_norm
  rmsnorm_bias.py:9-120       -> rmsnorm_bias
  rmsnorm_split.py:34-163     -> fused_variance / fused_rsqrt_mul
  rmsnorm_without_weight.py   -> rmsnorm_without_weight
  l1_norm.py:8-39             -> l1_norm
  scale_shift.py:19-183       -> fused_scale_shift

TPU design note: these are bandwidth-bound elementwise+reduction chains; under
jit XLA fuses each of them into a single VPU pass, which is already
speed-of-light (one HBM read + one write). We therefore ship the jnp forms as
the primary implementation and a Pallas kernel only for the
residual-add+norm+quant fusion, where producing TWO outputs (int8 normed +
bf16 residual sum) in one pass is the win the reference's Triton kernel gets.
All quant formulas match the reference exactly:
  q = saturate_int8(normed * quant_scale + quant_offset)   (per-column vectors)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import interpret_mode, use_pallas


def _rms(h32: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(h32 * h32, axis=-1, keepdims=True)
    return h32 * jax.lax.rsqrt(var + eps)


def _quant_static(y32: jax.Array, quant_scale, quant_offset) -> jax.Array:
    q = y32 * quant_scale.astype(jnp.float32) + quant_offset.astype(jnp.float32)
    return jnp.clip(jnp.round(q), -128, 127).astype(jnp.int8)


# ---------------------------------------------------------------- add_rmsnorm


def add_rmsnorm_bias_ref(x, residual, weight, bias, eps, quant_scale=None, quant_offset=None):
    """Returns (normed_or_int8, x+residual). Matches add_rmsnorm_bias_kernel:
    the residual sum is stored in the INPUT dtype, the norm is computed in f32."""
    h = x + residual
    y32 = _rms(h.astype(jnp.float32), eps)
    y32 = y32 * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    if quant_scale is not None:
        return _quant_static(y32, quant_scale, quant_offset), h
    return y32.astype(x.dtype), h


def _add_rmsnorm_quant_kernel(x_ref, res_ref, w_ref, b_ref, qs_ref, qo_ref, out_ref, h_ref, *, eps):
    h = x_ref[...] + res_ref[...]
    h_ref[...] = h
    h32 = h.astype(jnp.float32)
    var = jnp.mean(h32 * h32, axis=-1, keepdims=True)
    y = h32 * jax.lax.rsqrt(var + eps)
    y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    q = y * qs_ref[...].astype(jnp.float32) + qo_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.clip(jnp.round(q), -128, 127).astype(jnp.int8)


def _add_rmsnorm_quant_pallas(x, residual, weight, bias, quant_scale, quant_offset, eps):
    n, d = x.shape
    block_n = min(n, 256)
    kern = partial(_add_rmsnorm_quant_kernel, eps=eps)
    grid = (pl.cdiv(n, block_n),)
    out, h = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, d), x.dtype),
        ],
        interpret=interpret_mode(),
    )(x, residual, weight, bias, quant_scale, quant_offset)
    return out, h


def add_rmsnorm_bias(x, residual, weight, bias, eps, quant_scale=None, quant_offset=None):
    if quant_scale is not None and use_pallas() and x.ndim == 2:
        return _add_rmsnorm_quant_pallas(x, residual, weight, bias, quant_scale, quant_offset, eps)
    return add_rmsnorm_bias_ref(x, residual, weight, bias, eps, quant_scale, quant_offset)


def add_gemma_rms_norm(x, residual, weight, eps):
    """Gemma-style: scale by (1 + weight); returns (normed, x+residual).
    Ref: add_rmsnorm_bias.py:151-231."""
    h = x + residual
    y32 = _rms(h.astype(jnp.float32), eps)
    y32 = y32 * (1.0 + weight.astype(jnp.float32))
    return y32.astype(x.dtype), h


def rmsnorm_bias(x, weight, bias, eps, quant_scale=None, quant_offset=None):
    """RMSNorm + bias (+optional static INT8 quant). Ref: rmsnorm_bias.py:79-120."""
    y32 = _rms(x.astype(jnp.float32), eps)
    y32 = y32 * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    if quant_scale is not None:
        return _quant_static(y32, quant_scale, quant_offset)
    return y32.astype(x.dtype)


# ------------------------------------------------------------- rmsnorm pieces


def fused_variance(x):
    """Per-token mean-of-squares, output [..., 1] in input dtype.
    Ref: rmsnorm_split.py:125-163 (the split-out variance stage)."""
    x32 = x.astype(jnp.float32)
    return jnp.mean(x32 * x32, axis=-1, keepdims=True).astype(x.dtype)


def fused_rsqrt_mul(x, variance, weight, eps=1e-6):
    """x * rsqrt(var+eps) * weight. Ref: rmsnorm_split.py:34-92."""
    y = x.astype(jnp.float32) * jax.lax.rsqrt(variance.astype(jnp.float32) + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def rmsnorm_without_weight(x, eps):
    """Ref: rmsnorm_without_weight.py:31-75."""
    return _rms(x.astype(jnp.float32), eps).astype(x.dtype)


def l1_norm(x):
    """Row L1 normalization, fp32 out. Ref: l1_norm.py:8-39."""
    x32 = x.astype(jnp.float32)
    return x32 / jnp.sum(jnp.abs(x32), axis=-1, keepdims=True)


def fused_scale_shift(x, scale, shift, scale_constant: float = 1.0):
    """out = x * (scale * scale_constant) + shift, with scale broadcast of size
    1 or hidden, shift of size 1, hidden, or full. Ref: scale_shift.py:129-183."""
    x32 = x.astype(jnp.float32)
    s = scale.reshape(-1).astype(jnp.float32) * scale_constant
    sh = shift.astype(jnp.float32)
    if sh.size == x.size:
        sh = sh.reshape(x.shape)
    else:
        sh = sh.reshape(-1)
    return (x32 * s + sh).astype(x.dtype)
