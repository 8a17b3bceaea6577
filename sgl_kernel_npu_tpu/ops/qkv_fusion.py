"""Fused QKV split + per-head RMSNorm + RoPE family.

Reference parity (python/sgl_kernel_npu/sgl_kernel_npu/norm/):
  split_qkv_rmsnorm_rope.py:9-440        -> split_qkv_rmsnorm_rope
  split_qkv_rmsnorm_rope.py:442-745      -> split_qkv_gemma (gated variant)
  split_qkv_rmsnorm_rope_pos_cache_half_npu.py -> split_qkv_rmsnorm_rope_pos_cache
  split_qkv_tp_rmsnorm_rope.py           -> split_qkv_tp_rmsnorm_rope
  fused_split_qk_norm.py:7-134           -> fused_split_qk_norm (MLA proj split)

These are single-pass VPU fusions; under jit XLA fuses the split + norm + rope
chain into one pass over the projection output, which is what the reference's
Triton mega-kernels achieve by hand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mla_preprocess import rotate_half_rope


def _head_rms(x, weight, bias, eps, head_dim):
    """Per-head RMSNorm over trailing groups of head_dim."""
    shape = x.shape
    xh = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // head_dim, head_dim)
    var = jnp.mean(xh * xh, axis=-1, keepdims=True)
    out = xh * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(shape)


def _rope_heads(x, sin, cos, head_dim, rope_dim, is_neox_style):
    """Apply RoPE to the first rope_dim dims of every head_dim group.

    sin/cos [B, rope_dim] full-size tables; neox -> rotate-half with the table
    as-is; non-neox -> interleaved expansion of the first half
    (split_qkv_rmsnorm_rope_kernel:66-105)."""
    b = x.shape[0]
    xh = x.astype(jnp.float32).reshape(b, -1, head_dim)
    rot = xh[..., :rope_dim]
    if is_neox_style:
        s, c = sin.astype(jnp.float32), cos.astype(jnp.float32)
        rot = rot * c[:, None] + jnp.concatenate(
            [-rot[..., rope_dim // 2:], rot[..., : rope_dim // 2]], -1
        ) * s[:, None]
    else:
        half = rope_dim // 2
        s = jnp.repeat(sin.astype(jnp.float32)[..., :half], 2, axis=-1)
        c = jnp.repeat(cos.astype(jnp.float32)[..., :half], 2, axis=-1)
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
        o1 = x1 * c[:, None, 0::2] - x2 * s[:, None, 0::2]
        o2 = x2 * c[:, None, 1::2] + x1 * s[:, None, 1::2]
        rot = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
    out = jnp.concatenate([rot, xh[..., rope_dim:]], axis=-1)
    return out.reshape(x.shape[0], -1)


def split_qkv_rmsnorm_rope(x, sin, cos, q_hidden_size, kv_hidden_size, head_dim,
                           eps=None, q_weight=None, k_weight=None,
                           q_bias=None, k_bias=None, is_neox_style=True):
    """x [B, qh + 2*kvh] -> (q [B, qh], k [B, kvh], v [B, kvh]) with optional
    per-head RMSNorm on q/k and RoPE on the first rope_dim of each head."""
    q = x[:, :q_hidden_size]
    k = x[:, q_hidden_size:q_hidden_size + kv_hidden_size]
    v = x[:, q_hidden_size + kv_hidden_size:]
    if eps is not None:
        q = _head_rms(q, q_weight, q_bias, eps, head_dim)
        k = _head_rms(k, k_weight, k_bias, eps, head_dim)
    rope_dim = sin.shape[-1]
    q = _rope_heads(q, sin, cos, head_dim, rope_dim, is_neox_style)
    k = _rope_heads(k, sin, cos, head_dim, rope_dim, is_neox_style)
    return q.astype(x.dtype), k.astype(x.dtype), v


def split_qkv_rmsnorm_rope_pos_cache(x, positions, cos_sin_cache,
                                     q_hidden_size, kv_hidden_size, head_dim,
                                     eps=None, q_weight=None, k_weight=None,
                                     q_bias=None, k_bias=None,
                                     is_neox_style=True):
    """Variant taking token positions + a packed [max_pos, rope_dim] cos|sin
    half-table cache (ref: split_qkv_rmsnorm_rope_pos_cache_half_npu.py)."""
    cs = cos_sin_cache[positions]
    half = cs.shape[-1] // 2
    cos_h, sin_h = cs[:, :half], cs[:, half:]
    cos = jnp.concatenate([cos_h, cos_h], -1)
    sin = jnp.concatenate([sin_h, sin_h], -1)
    return split_qkv_rmsnorm_rope(x, sin, cos, q_hidden_size, kv_hidden_size,
                                  head_dim, eps, q_weight, k_weight, q_bias,
                                  k_bias, is_neox_style)


def split_qkv_tp_rmsnorm_rope(x, sin, cos, num_q_heads, num_kv_heads, head_dim,
                              tp_rank=0, tp_size=1, eps=None,
                              q_weight=None, k_weight=None, is_neox_style=True):
    """TP-aware split (ref: split_qkv_tp_rmsnorm_rope.py): x holds this rank's
    shard of the fused projection [B, (nq + 2*nkv)/tp * head_dim]."""
    qh = num_q_heads // tp_size * head_dim
    kvh = num_kv_heads // tp_size * head_dim
    return split_qkv_rmsnorm_rope(x, sin, cos, qh, kvh, head_dim, eps,
                                  q_weight, k_weight, None, None, is_neox_style)


def fused_split_qk_norm(x, q_norm_weight, kv_norm_weight, q_lora_rank,
                        kv_lora_rank, qk_rope_dim, eps=1e-6,
                        q_norm_bias=None, kv_norm_bias=None):
    """MLA projection split (ref: fused_split_qk_norm.py:92-134):
    x [B, qlr + kvlr + rope] -> (q_lora normed [B, qlr],
    k_nope normed [B, 1, kvlr], k_pe [B, 1, rope])."""
    q = x[:, :q_lora_rank]
    kn = x[:, q_lora_rank:q_lora_rank + kv_lora_rank]
    kp = x[:, q_lora_rank + kv_lora_rank:]
    q = _head_rms(q, q_norm_weight, q_norm_bias, eps, q_lora_rank).astype(x.dtype)
    kn = _head_rms(kn, kv_norm_weight, kv_norm_bias, eps, kv_lora_rank).astype(x.dtype)
    return q, kn[:, None, :], kp[:, None, :]


def split_qkvgate_gemma_rmsnorm_rope(x, sin, cos, q_hidden_size, kv_hidden_size,
                                     head_dim, rope_dim, eps, q_weight, k_weight):
    """Gemma-gated split (ref: split_qkvgate_gemma_rmsnorm_rope,
    split_qkv_rmsnorm_rope.py:442-745): x [B, 2*qh + 2*kvh] with the q section
    interleaved per head as [q head_dim | gate head_dim]; q and k get
    Gemma-style (1 + weight) per-head RMSNorm then rotate-half RoPE on the
    first rope_dim dims; gate and v pass through.

    Returns (q [B, qh], k [B, kvh], v [B, kvh], gate [B, qh])."""
    b = x.shape[0]
    nqh = q_hidden_size // head_dim
    qgate = x[:, : 2 * q_hidden_size].reshape(b, nqh, 2 * head_dim)
    q = qgate[..., :head_dim].reshape(b, q_hidden_size)
    gate = qgate[..., head_dim:].reshape(b, q_hidden_size)
    k = x[:, 2 * q_hidden_size: 2 * q_hidden_size + kv_hidden_size]
    v = x[:, 2 * q_hidden_size + kv_hidden_size:]

    q = _head_rms(q, 1.0 + q_weight.astype(jnp.float32), None, eps, head_dim)
    k = _head_rms(k, 1.0 + k_weight.astype(jnp.float32), None, eps, head_dim)
    q = _rope_heads(q, sin, cos, head_dim, rope_dim, is_neox_style=True)
    k = _rope_heads(k, sin, cos, head_dim, rope_dim, is_neox_style=True)
    return (q.astype(x.dtype), k.astype(x.dtype), v, gate.astype(x.dtype))
