"""Rotary position embedding helpers shared by the norm/attention fusions.

Reference parity: the RoPE math inside
  python/sgl_kernel_npu/sgl_kernel_npu/norm/fused_rope_qk_mqa.py:7-147 and
  norm/split_qkv_rmsnorm_rope.py (neox + interleaved styles), and the RopeConcat
  stage of csrc/mla_preprocess (op_kernel rope at mla_preprocess_kernel).

Two layouts:
  neox style      : first/second half pairs   (x1 = x[..., :d/2], x2 = x[..., d/2:])
  interleaved     : even/odd pairs            (GPT-J style)
cos_sin is a [T, rotary_dim] table holding [cos | sin] halves, matching the
reference's packed cos_sin_cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_cos_sin_cache(max_pos: int, rotary_dim: int, base: float = 10000.0, dtype=jnp.float32):
    """Packed [max_pos, rotary_dim] table: row = [cos(theta_0..), sin(theta_0..)]."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [T, rotary_dim/2]
    return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, is_neox_style: bool = True) -> jax.Array:
    """Rotate the last dim of x ([..., rotary_dim]) by (cos, sin) ([..., rotary_dim/2]).

    Computation in fp32, returned in input dtype.
    """
    x32 = x.astype(jnp.float32)
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    half = x.shape[-1] // 2
    if is_neox_style:
        x1, x2 = x32[..., :half], x32[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    else:
        x1, x2 = x32[..., 0::2], x32[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def fused_rope_qk_mqa(query, key, cos_sin, rotary_dim, is_neox_style=True):
    """Apply RoPE to [T, Hq*D] query and [T, D] MQA key in one pass.

    Ref: norm/fused_rope_qk_mqa.py:113-147 — query is reshaped to heads, the
    first rotary_dim of each head rotated; key is a single head.
    Returns (query, key) with rotation applied, original shapes preserved.
    """
    t = query.shape[0]
    head_dim = key.shape[-1]
    q = query.reshape(t, -1, head_dim)
    cos = cos_sin[..., : rotary_dim // 2]
    sin = cos_sin[..., rotary_dim // 2 : rotary_dim]
    q_rot = apply_rope(q[..., :rotary_dim], cos[:, None, :], sin[:, None, :], is_neox_style)
    k_rot = apply_rope(key[..., :rotary_dim], cos, sin, is_neox_style)
    q = jnp.concatenate([q_rot, q[..., rotary_dim:]], axis=-1) if rotary_dim < head_dim else q_rot
    k = jnp.concatenate([k_rot, key[..., rotary_dim:]], axis=-1) if rotary_dim < head_dim else k_rot
    return q.reshape(query.shape), k
