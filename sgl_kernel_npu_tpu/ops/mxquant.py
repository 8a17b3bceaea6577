"""MX-format block quantization (MXFP8 / MXFP4) for EP comm payloads.

Reference parity: the low-latency dispatch quant modes NONE/INT8/MXFP8/MXFP4/
per-token-FP8 (csrc/deepep/deep_ep.cpp:13-19) and the device block-quant
routines (csrc/deepep/ops/op_kernel/quantize_functions.h:62-380).

OCP MX spec semantics: values are grouped in blocks of 32 along the hidden
dim; each block shares one E8M0 scale (a pure power of two, stored as a
biased-127 uint8 exponent); elements are FP8-E4M3 (MXFP8) or FP4-E2M1
(MXFP4, two elements packed per uint8 for the wire).

TPU design: quantize/dequantize are pure VPU element-wise pipelines XLA fuses
into the surrounding dispatch/FFN ops; the wire payload is jnp.float8_e4m3fn
(1 B/elt) or packed uint8 (0.5 B/elt) + uint8 scales (1/32 B/elt), cutting
ICI bytes 2x/4x vs bf16 exactly like the reference's HCCS path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MX_BLOCK = 32
_E4M3_MAX = 448.0
_E2M1_MAX = 6.0
# FP4-E2M1 representable magnitudes
_E2M1_GRID = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], jnp.float32)


def _e8m0_scale(absmax, elt_max):
    """Per-block power-of-two scale: smallest 2^e with absmax/2^e <= elt_max.
    Returns (biased uint8 exponent, f32 scale)."""
    absmax = jnp.maximum(absmax, 1e-30)
    e = jnp.ceil(jnp.log2(absmax / elt_max))
    e = jnp.clip(e, -127, 127)
    return (e + 127).astype(jnp.uint8), jnp.exp2(e)


def _e8m0_decode(scale_u8):
    return jnp.exp2(scale_u8.astype(jnp.float32) - 127.0)


def quantize_mxfp8(x, block: int = MX_BLOCK):
    """x [..., H] (H % block == 0) -> (q [..., H] float8_e4m3fn,
    scales [..., H//block] uint8 E8M0)."""
    h = x.shape[-1]
    assert h % block == 0, f"hidden {h} not a multiple of MX block {block}"
    xb = x.astype(jnp.float32).reshape(*x.shape[:-1], h // block, block)
    absmax = jnp.max(jnp.abs(xb), axis=-1)
    s_u8, s = _e8m0_scale(absmax, _E4M3_MAX)
    q = (xb / s[..., None]).astype(jnp.float8_e4m3fn)
    return q.reshape(*x.shape[:-1], h), s_u8


def dequantize_mxfp8(q, scales_u8, block: int = MX_BLOCK,
                     out_dtype=jnp.bfloat16):
    h = q.shape[-1]
    qb = q.astype(jnp.float32).reshape(*q.shape[:-1], h // block, block)
    out = qb * _e8m0_decode(scales_u8)[..., None]
    return out.reshape(*q.shape[:-1], h).astype(out_dtype)


def _fp4_encode(x):
    """f32 -> 4-bit E2M1 code (sign<<3 | magnitude index), round-to-nearest."""
    sign = (x < 0).astype(jnp.uint8)
    mag = jnp.abs(x)
    # nearest grid point (ties toward the larger magnitude, matching RN-even
    # closely enough for comm payloads)
    dist = jnp.abs(mag[..., None] - _E2M1_GRID)
    idx = jnp.argmin(dist, axis=-1).astype(jnp.uint8)
    return sign << 3 | idx


def _fp4_decode(code):
    mag = _E2M1_GRID[(code & 7).astype(jnp.int32)]
    return jnp.where((code >> 3) > 0, -mag, mag)


def quantize_mxfp4(x, block: int = MX_BLOCK):
    """x [..., H] -> (packed uint8 [..., H//2] (lo nibble = even element),
    scales [..., H//block] uint8 E8M0)."""
    h = x.shape[-1]
    assert h % block == 0 and h % 2 == 0
    xb = x.astype(jnp.float32).reshape(*x.shape[:-1], h // block, block)
    absmax = jnp.max(jnp.abs(xb), axis=-1)
    s_u8, s = _e8m0_scale(absmax, _E2M1_MAX)
    codes = _fp4_encode(xb / s[..., None]).reshape(*x.shape[:-1], h)
    packed = codes[..., ::2] | (codes[..., 1::2] << 4)
    return packed, s_u8


def dequantize_mxfp4(packed, scales_u8, block: int = MX_BLOCK,
                     out_dtype=jnp.bfloat16):
    h = packed.shape[-1] * 2
    lo = _fp4_decode(packed & 15)
    hi = _fp4_decode(packed >> 4)
    codes = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], h)
    cb = codes.reshape(*packed.shape[:-1], h // block, block)
    out = cb * _e8m0_decode(scales_u8)[..., None]
    return out.reshape(*packed.shape[:-1], h).astype(out_dtype)
