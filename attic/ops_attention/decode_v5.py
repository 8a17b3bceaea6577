"""Flash-decode v5: grid-pipelined paged attention.

v3 (decode_v3.py) gives each SEQUENCE one grid program that hand-DMAs its
pages with a 2-deep double buffer. At serving contexts (2-4 pages/seq) that
leaves the HBM pipe idle between programs: the first DMA of sequence b+1 only
starts after sequence b finishes, so the kernel is DMA-latency-bound
(~95 GB/s in-model, decode-step trace 2026-08-17) while the weight GEMMs
stream at ~600 GB/s.

v5 makes the PAGE FETCH part of the grid instead: grid = (batch, max_pages)
and the K/V page for step (b, p) is selected by the scalar-prefetched block
table inside the BlockSpec index_map — the same trick as the stacked-bank
GEMM (ops/matmul.py::quant_matmul_int8_stacked). Mosaic's automatic operand
pipelining then overlaps the DMA of grid step (b, p+1) with the compute of
(b, p) ACROSS sequence boundaries, so page traffic streams back-to-back.
Online-softmax state lives in VMEM scratch, initialized at p==0 and finalized
at the row's last page.

Deferred-write contract (see decode_v3.decode_gqa_pallas_v3_int8_defer): the
cache holds tokens 0..cached_lens[b]-1; the CURRENT token's k/v arrive as
bf16 operands and are folded in at finalization, so the cache is a read-only
operand and the model's layer scan never scatter-updates a pallas input.

Cost note: rows whose cached_len needs fewer than max_pages pages still fetch
the clamped page (masked out of the softmax) — at serving batch shapes the
block tables are近-uniform so the waste is bounded by one page per sequence.

Reference parity: csrc/attentions decode attention + the paged
`_paged_gqa_fwd_kernel` family (python/sgl_kernel_npu/attention/
decode_attention.py:234-451); redesigned for the TPU grid/pipeline model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode

_NEG_INF = -1e30


def _finalize(q_ref, knew_ref, vnew_ref, out_ref, acc_ref, m_ref, l_ref,
              *, sm_scale, hkv, g, dk, dv):
    """Fold the current token in from registers, normalize, write out.

    Batched over heads: per-head (G, D)-sized vector ops leave the (8, 128)
    lanes mostly idle and their fixed issue cost dominated the kernel
    (per-head loop measured 494 us/layer vs the 267 us DMA floor at
    bs64/ctx320 — variant A/B 2026-08-17)."""
    q3 = q_ref[0].astype(jnp.float32)                            # [hkv, G, D]
    kn = knew_ref[0].astype(jnp.float32).reshape(hkv, 1, dk)
    vn = vnew_ref[0].astype(jnp.float32).reshape(hkv, 1, dv)
    s = jax.lax.dot_general(
        q3, kn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale            # [hkv, G, 1]
    mh_prev = m_ref[...].reshape(hkv, g, 1)
    mh = jnp.maximum(mh_prev, s)
    alpha = jnp.exp(mh_prev - mh)
    pexp = jnp.exp(s - mh)
    l_new = l_ref[...].reshape(hkv, g, 1) * alpha + pexp
    o = jax.lax.dot_general(
        pexp, vn, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                       # [hkv, G, Dv]
    acc = acc_ref[...].reshape(hkv, g, dv) * alpha + o
    out_ref[0] = (acc / jnp.maximum(l_new, 1e-37)).reshape(
        hkv * g, dv).astype(out_ref.dtype)


def _page_update(q3, k3, v3, p, cached, acc_ref, m_ref, l_ref,
                 *, page_size, sm_scale, hkv, g, dv):
    """One page's batched-over-heads online-softmax update.

    q3 [hkv, G, D] f32; k3/v3 [hkv, ps, D] f32 (already descaled)."""
    col = p * page_size + jax.lax.broadcasted_iota(
        jnp.int32, (1, g, page_size), 2)
    valid = col < cached
    s = jax.lax.dot_general(
        q3, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale            # [hkv, G, ps]
    s = jnp.where(valid, s, _NEG_INF)
    mh_prev = m_ref[...].reshape(hkv, g, 1)
    mh = jnp.maximum(mh_prev, jnp.max(s, -1, keepdims=True))
    alpha = jnp.exp(mh_prev - mh)
    pexp = jnp.exp(s - mh)
    l_ref[...] = (l_ref[...].reshape(hkv, g, 1) * alpha
                  + jnp.sum(pexp, -1, keepdims=True)).reshape(hkv * g, 1)
    o = jax.lax.dot_general(
        pexp, v3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                       # [hkv, G, Dv]
    acc_ref[...] = (acc_ref[...].reshape(hkv, g, dv) * alpha + o
                    ).reshape(hkv * g, dv)
    m_ref[...] = mh.reshape(hkv * g, 1)


def _kernel_v5_int8(seq_lens_ref, bt_ref, q_ref, knew_ref, vnew_ref,
                    k_ref, v_ref, ks_ref, vs_ref, out_ref,
                    acc_ref, m_ref, l_ref,
                    *, page_size, sm_scale, hkv, g, max_pages):
    b = pl.program_id(0)
    p = pl.program_id(1)
    cached = seq_lens_ref[b]
    num_pages = pl.cdiv(cached, page_size)

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(p < num_pages)
    def _compute():
        dv = vnew_ref.shape[-1]
        q3 = q_ref[0].astype(jnp.float32)
        k3 = (k_ref[0].astype(jnp.float32)
              * ks_ref[0].astype(jnp.float32).reshape(hkv, page_size, 1))
        v3 = (v_ref[0].astype(jnp.float32)
              * vs_ref[0].astype(jnp.float32).reshape(hkv, page_size, 1))
        _page_update(q3, k3, v3, p, cached, acc_ref, m_ref, l_ref,
                     page_size=page_size, sm_scale=sm_scale, hkv=hkv, g=g,
                     dv=dv)

    @pl.when(p == max_pages - 1)
    def _last():
        _finalize(q_ref, knew_ref, vnew_ref, out_ref, acc_ref, m_ref, l_ref,
                  sm_scale=sm_scale, hkv=hkv, g=g,
                  dk=q_ref.shape[-1], dv=vnew_ref.shape[-1])


def decode_gqa_pallas_v5_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                    k_scales, v_scales, cached_lens,
                                    block_table, sm_scale, page_size):
    """Grid-pipelined INT8 deferred-write decode (module docstring).

    q [B, Hq, D]; k_new/v_new [B, Hkv, D] bf16; caches int8 page-major
    [P, Hkv, ps, D], scales f32 [P, Hkv, 1, ps]; cached_lens [B] (tokens in
    cache, EXCLUDING the current one); block_table [B, max_pages]."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)
    max_pages = block_table.shape[1]

    def page_map(bb, p, sl, bt):
        return (bt[bb, p], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, p, sl, bt: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, dk), lambda bb, p, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, dv), lambda bb, p, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, ps, dk), page_map),
            pl.BlockSpec((1, hkv, ps, dv), page_map),
            pl.BlockSpec((1, hkv, 1, ps), page_map),
            pl.BlockSpec((1, hkv, 1, ps), page_map),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, dv),
                               lambda bb, p, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v5_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * max_pages * ps * dk,
            bytes_accessed=b * max_pages * hkv * ps * (dk + dv + 8),
            transcendentals=b * hq * max_pages * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      q4, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales)
    return out.reshape(b, hq, dv)


def _kernel_v5(seq_lens_ref, bt_ref, q_ref, knew_ref, vnew_ref,
               k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref,
               *, page_size, sm_scale, hkv, g, max_pages):
    b = pl.program_id(0)
    p = pl.program_id(1)
    cached = seq_lens_ref[b]
    num_pages = pl.cdiv(cached, page_size)

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(p < num_pages)
    def _compute():
        dv = vnew_ref.shape[-1]
        q3 = q_ref[0].astype(jnp.float32)
        k3 = k_ref[0].astype(jnp.float32)
        v3 = v_ref[0].astype(jnp.float32)
        _page_update(q3, k3, v3, p, cached, acc_ref, m_ref, l_ref,
                     page_size=page_size, sm_scale=sm_scale, hkv=hkv, g=g,
                     dv=dv)

    @pl.when(p == max_pages - 1)
    def _last():
        _finalize(q_ref, knew_ref, vnew_ref, out_ref, acc_ref, m_ref, l_ref,
                  sm_scale=sm_scale, hkv=hkv, g=g,
                  dk=q_ref.shape[-1], dv=vnew_ref.shape[-1])


def decode_gqa_pallas_v5_defer(q, k_new, v_new, k_cache, v_cache, cached_lens,
                               block_table, sm_scale, page_size):
    """bf16 twin of decode_gqa_pallas_v5_int8_defer."""
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    q4 = q.reshape(b, hkv, g, dk)
    max_pages = block_table.shape[1]

    def page_map(bb, p, sl, bt):
        return (bt[bb, p], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec((1, hkv, g, dk), lambda bb, p, sl, bt: (bb, 0, 0, 0)),
            pl.BlockSpec((1, hkv, dk), lambda bb, p, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, dv), lambda bb, p, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, ps, dk), page_map),
            pl.BlockSpec((1, hkv, ps, dv), page_map),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, dv),
                               lambda bb, p, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv * g, dv), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
            pltpu.VMEM((hkv * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v5, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * max_pages * ps * dk,
            bytes_accessed=b * max_pages * hkv * ps * (dk + dv) * 2,
            transcendentals=b * hq * max_pages * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      q4, k_new.astype(q.dtype), v_new.astype(q.dtype), k_cache, v_cache)
    return out.reshape(b, hq, dv)
