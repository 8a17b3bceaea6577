"""Activation fusions: grouped-expert SwiGLU + per-token INT8 quant, and the
interleaved clamped "OAI" SwiGLU.

Reference parity (python/sgl_kernel_npu/sgl_kernel_npu/activation/):
  swiglu_quant.py:9-127  -> swiglu_quant  (gate = first half, up = second half;
                            optional clamp: gate=min(silu(x1),limit),
                            up=clip(x2,±limit); per-row absmax INT8,
                            round-half-away via floor(x+0.5), clip [-128,127];
                            rows beyond group_list total are zeroed here —
                            the reference leaves them undefined)
  swiglu_oai.py:8-104    -> swiglu_oai    (INTERLEAVED gate/up, clamped,
                            gate*(sigmoid(gate*alpha))*(up+1))

TPU note: swiglu_quant is the MoE-FFN epilogue; the Pallas version is written
so it can be inlined as the GMM1 epilogue of fused_deep_moe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import interpret_mode, use_pallas


def _total_rows_from_group_list(group_list, group_list_type: int):
    gl = group_list.astype(jnp.int32)
    return gl[-1] if group_list_type == 0 else jnp.sum(gl)


def _swiglu_core(x32, do_limit, limit):
    half = x32.shape[-1] // 2
    x1, x2 = x32[..., :half], x32[..., half:]
    if do_limit:
        gate = jnp.minimum(x1 * jax.nn.sigmoid(x1), limit)
        up = jnp.clip(x2, -limit, limit)
        return gate * up
    return x1 * jax.nn.sigmoid(x1) * x2


def swiglu_quant_ref(x, group_list, group_list_type=1, need_quant=True, do_limit=False, limit=7.0):
    """x: [S, H] -> (out [S, H/2] int8|dtype, scale [S] f32).

    Only the first total_rows (from group_list) are active; inactive rows are
    written as zeros (scale 0) for deterministic output.
    """
    s, h = x.shape
    x32 = x.astype(jnp.float32)
    out = _swiglu_core(x32, do_limit, limit)
    total = _total_rows_from_group_list(group_list, group_list_type)
    row_active = (jnp.arange(s) < total)[:, None]
    out = jnp.where(row_active, out, 0.0)
    if not need_quant:
        return out.astype(x.dtype), jnp.zeros((s,), jnp.float32)
    scale = jnp.max(jnp.abs(out), axis=-1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)[:, None]
    q = jnp.clip(jnp.floor(out / safe + 0.5), -128, 127).astype(jnp.int8)
    return q, scale


def _swiglu_quant_kernel(x_ref, total_ref, out_ref, scale_ref, *, do_limit, limit, block_n):
    i = pl.program_id(0)
    x32 = x_ref[...].astype(jnp.float32)
    out = _swiglu_core(x32, do_limit, limit)
    row_ids = i * block_n + jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    out = jnp.where(row_ids < total_ref[0], out, 0.0)
    absmax = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.floor(out / safe + 0.5), -128, 127)
    out_ref[...] = q.astype(jnp.int8)
    scale_ref[...] = scale[:, 0]


def _swiglu_quant_pallas(x, total_rows, do_limit, limit):
    s, h = x.shape
    block_n = min(s, 256)
    out, scale = pl.pallas_call(
        partial(_swiglu_quant_kernel, do_limit=do_limit, limit=limit, block_n=block_n),
        grid=(pl.cdiv(s, block_n),),
        in_specs=[
            pl.BlockSpec((block_n, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, h // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, h // 2), jnp.int8),
            jax.ShapeDtypeStruct((s,), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(x, total_rows.reshape(1).astype(jnp.int32))
    return out, scale


def swiglu_quant(x, group_list, group_list_type=1, need_quant=True, do_limit=False, limit=7.0):
    if need_quant and use_pallas():
        total = _total_rows_from_group_list(group_list, group_list_type)
        return _swiglu_quant_pallas(x, total, do_limit, limit)
    return swiglu_quant_ref(x, group_list, group_list_type, need_quant, do_limit, limit)


def swiglu_oai(hidden_states, alpha: float = 1.702, limit: float = 7.0):
    """Interleaved gate/up SwiGLU with clamp (gpt-oss style).

    Ref: activation/swiglu_oai.py:85-104 native path — gate = x[..., ::2]
    clamped above by limit, up = x[..., 1::2] clamped to ±limit,
    out = gate * sigmoid(gate * alpha) * (up + 1).
    """
    x32 = hidden_states.astype(jnp.float32)
    gate = jnp.minimum(x32[..., 0::2], limit)
    up = jnp.clip(x32[..., 1::2], -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return ((up + 1.0) * glu).astype(hidden_states.dtype)
