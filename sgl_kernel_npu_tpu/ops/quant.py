"""Quantization primitives: per-token / per-tensor INT8, block FP8.

These are the TPU-native equivalents of the in-kernel quant routines the
reference embeds in its dispatch/compute kernels:
  - per-token dynamic INT8 absmax quant (csrc/deepep/ops/op_kernel/
    cam_moe_dispatch_normal.h:62-65 QuantInit/QuantProcess/ReduceMaxInplace)
  - FP8/FP4 block quant (csrc/deepep/ops/op_kernel/quantize_functions.h:62-380)
  - per-tensor asymmetric / per-token symmetric modes of mla_preprocess
    (csrc/mla_preprocess/README.md quant modes)

On TPU these are mostly XLA-fused elementwise reductions; standalone Pallas
versions exist for when they must fuse into a bigger pipeline (dispatch,
swiglu_quant).  All functions are jittable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
FP8_E4M3_MAX = 448.0


def per_token_quant_int8(x: jax.Array, eps: float = 1e-7) -> tuple:
    """Symmetric per-token (row) dynamic INT8 quantization.

    x: [..., D] float -> (q: int8 same shape, scale: [..., 1] float32) with
    x ≈ q * scale.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, eps) / INT8_MAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -INT8_MAX - 1, INT8_MAX)
    return q.astype(jnp.int8), scale


def per_tensor_quant_int8_asymm(x: jax.Array, scale: jax.Array, offset: jax.Array) -> jax.Array:
    """Static per-tensor asymmetric INT8 quantization (mla_preprocess quant mode 0):
    q = round(x / scale + offset)."""
    q = jnp.round(x.astype(jnp.float32) / scale + offset)
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def dequant_int8(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def per_block_quant_fp8(x: jax.Array, block: int = 128, eps: float = 1e-7) -> tuple:
    """Block-wise FP8-E4M3 quantization over the last dim (ref:
    quantize_functions.h per-128-block scales; also the catlass softfp8 layout).

    x: [..., D] with D % block == 0 -> (q: float8_e4m3fn, scales: [..., D/block] f32)
    """
    *lead, d = x.shape
    assert d % block == 0, f"D={d} not divisible by block={block}"
    xb = x.astype(jnp.float32).reshape(*lead, d // block, block)
    absmax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, eps) / FP8_E4M3_MAX
    q = (xb / scale).astype(jnp.float8_e4m3fn)
    return q.reshape(*lead, d), jnp.squeeze(scale, -1)


def dequant_fp8_block(q: jax.Array, scales: jax.Array, block: int = 128, dtype=jnp.bfloat16) -> jax.Array:
    *lead, d = q.shape
    xb = q.astype(jnp.float32).reshape(*lead, d // block, block)
    out = xb * scales[..., None]
    return out.reshape(*lead, d).astype(dtype)
