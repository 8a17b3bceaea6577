"""Prefill/training attention: laser (FlashAttention-class) + varlen causal.

Reference parity: csrc/attentions/ `la` — laser attention forward
(csrc/plugin/la.h:21-25, registered as torch.ops.attentions at
register_ops.cpp:21-34; FlashAttention-class fused softmax attention).

TPU design: the jnp reference is a masked-softmax attention XLA fuses well at
prefill sizes; the Pallas version is a classic flash kernel — online softmax
over KV tiles with fp32 running state — used when sequence lengths make the
materialized [T, T] score matrix HBM-bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, interpret_mode, use_pallas

_NEG_INF = -1e30


def laser_attention_ref(q, k, v, sm_scale, causal=True):
    """q [B, Hq, T, D]; k, v [B, Hkv, T, D]. Returns [B, Hq, T, Dv]."""
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, t, d)
    s = jnp.einsum("bhgtd,bhnd->bhgtn", qf, k.astype(jnp.float32)) * sm_scale
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgtn,bhnd->bhgtd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, t, -1).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref,
                  *, sm_scale, block_q, block_k, causal, kv_steps):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    run = (not causal) or (ki * block_k <= qi * block_q + block_q - 1)

    @pl.when(run)
    def _():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(rows >= cols, s, _NEG_INF)
        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, -1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[...] = m_cur

    @pl.when(ki == kv_steps - 1)
    def _():
        out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)).astype(out_ref.dtype)


def laser_attention_pallas(q, k, v, sm_scale, causal=True,
                           block_q=256, block_k=256):
    """Flash forward. q [BH, T, D] with k/v matching head count (pre-expanded
    GQA); one (batch*head) per grid row."""
    bh, t, d = q.shape
    dv = v.shape[-1]
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    kv_steps = cdiv(t, block_k)
    grid = (bh, cdiv(t, block_q), kv_steps)
    return pl.pallas_call(
        partial(_flash_kernel, sm_scale=sm_scale, block_q=block_q,
                block_k=block_k, causal=causal, kv_steps=kv_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(q, k, v)


def laser_attention(q, k, v, sm_scale, causal=True):
    """Dispatching wrapper: q [B, Hq, T, D], k/v [B, Hkv, T, D]."""
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    if use_pallas() and t >= 512:
        g = hq // hkv
        kx = jnp.repeat(k, g, axis=1).reshape(b * hq, t, d)
        vx = jnp.repeat(v, g, axis=1).reshape(b * hq, t, v.shape[-1])
        out = laser_attention_pallas(q.reshape(b * hq, t, d), kx, vx, sm_scale, causal)
        return out.reshape(b, hq, t, -1)
    return laser_attention_ref(q, k, v, sm_scale, causal)


def prefill_attention_varlen(q, k, v, cu_seqlens, sm_scale):
    """Varlen causal prefill over flat [T, H, D] tensors (the layout SGLang
    feeds): block-diagonal causal masking by sequence id."""
    t, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    seq_id = jnp.searchsorted(cu_seqlens[1:], jnp.arange(t), side="right")
    qf = q.astype(jnp.float32).reshape(t, hkv, g, d)
    s = jnp.einsum("thgd,nhd->thgn", qf, k.astype(jnp.float32)) * sm_scale
    valid = (seq_id[:, None] == seq_id[None, :]) & \
        (jnp.arange(t)[:, None] >= jnp.arange(t)[None, :])
    s = jnp.where(valid[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("thgn,nhd->thgd", p, v.astype(jnp.float32))
    return out.reshape(t, hq, -1).astype(q.dtype)
