"""Attention with sinks (gpt-oss style) — decode and prefill.

Reference parity: python/sgl_kernel_npu/sgl_kernel_npu/attention/sinks_attention.py
  attention_sinks_kernel/_triton (:8-137, paged decode)
  attention_sinks_prefill_kernel/_triton (:139-286, varlen causal prefill)

A per-query-head "sink" logit joins the softmax denominator (no value row),
damping attention mass; optional sliding window restricts the KV range to the
last `sliding_window_size` tokens (-1 = disabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def decode_attention_with_sinks(q, k_cache, v_cache, sinks, seq_lens,
                                block_table, sm_scale, page_size,
                                sliding_window_size: int = -1):
    """q [B, Hq, D]; caches head-major [Hkv, P, ps, D]; sinks [Hq].
    Returns [B, Hq, Dv]."""
    b, hq, dk = q.shape
    hkv = k_cache.shape[0]
    dv = v_cache.shape[-1]
    g = hq // hkv
    max_pages = block_table.shape[1]
    ps = page_size

    k = k_cache[:, block_table].transpose(1, 0, 2, 3, 4).reshape(b, hkv, -1, dk)
    v = v_cache[:, block_table].transpose(1, 0, 2, 3, 4).reshape(b, hkv, -1, dv)
    n = max_pages * ps

    qf = q.astype(jnp.float32).reshape(b, hkv, g, dk)
    logits = jnp.einsum("bhgd,bhnd->bhgn", qf, k.astype(jnp.float32)) * sm_scale
    pos = jnp.arange(n)[None, :]
    valid = pos < seq_lens[:, None]
    if sliding_window_size != -1:
        start = jnp.maximum(seq_lens - sliding_window_size, 0)
        valid = valid & (pos >= start[:, None])
    logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)

    sink = sinks.astype(jnp.float32).reshape(hkv, g)[None, :, :, None]  # [1,hkv,g,1]
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sink - m)
    out = jnp.einsum("bhgn,bhnd->bhgd", p / denom, v.astype(jnp.float32))
    return out.reshape(b, hq, dv).astype(q.dtype)


def prefill_attention_with_sinks(q, k, v, sinks, cu_seqlens, sm_scale,
                                 sliding_window_size: int = -1):
    """Varlen causal prefill with sinks. q [T, Hq, D]; k, v [T, Hkv, D];
    cu_seqlens [num_seqs+1]. Returns [T, Hq, Dv]."""
    t, hq, dk = q.shape
    hkv = k.shape[1]
    dv = v.shape[-1]
    g = hq // hkv

    seq_id = jnp.searchsorted(cu_seqlens[1:], jnp.arange(t), side="right")
    pos_in_seq = jnp.arange(t) - cu_seqlens[seq_id]

    qf = q.astype(jnp.float32).reshape(t, hkv, g, dk)
    kf = k.astype(jnp.float32)
    logits = jnp.einsum("thgd,nhd->thgn", qf, kf) * sm_scale

    same_seq = seq_id[:, None] == seq_id[None, :]
    causal = pos_in_seq[:, None] >= pos_in_seq[None, :]
    valid = same_seq & causal
    if sliding_window_size != -1:
        valid = valid & (pos_in_seq[None, :] > pos_in_seq[:, None] - sliding_window_size)
    logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)

    sink = sinks.astype(jnp.float32).reshape(hkv, g)[None, :, :, None]
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sink - m)
    out = jnp.einsum("thgn,nhd->thgd", p / denom, v.astype(jnp.float32))
    return out.reshape(t, hq, dv).astype(q.dtype)
