"""Paged-KV decode attention: GQA and MLA.

Reference parity: python/sgl_kernel_npu/sgl_kernel_npu/attention/decode_attention.py
  _paged_mla_fwd_kernel (:5-163) / decode_mla (:166-231)
  _paged_gqa_fwd_kernel (:234-371) / decode_gqa (:373-451)
  (+ the high-performance GQA variant :454-740 — same math, different tiling)

API (functional JAX: output returned, not written into a buffer):
  decode_gqa(q, k_cache, v_cache, seq_lens, block_table, sm_scale, page_size)
    q        [B, Hq, Dk]
    k_cache  [Hkv, num_pages, page_size, Dk]   (head-major TPU-native layout:
    v_cache  [Hkv, num_pages, page_size, Dv]    a page tile is then a clean
    -> out   [B, Hq, Dv]                        (page_size, D) VMEM block)
  decode_mla(q, ckv_cache, krope_cache, seq_lens, block_table, sm_scale, page_size)
    q            [B, H, Lkv + Lrope]   (nope | rope split, DeepSeek: 512+64)
    ckv_cache    [num_pages, page_size, Lkv]    (MLA has a single KV head, so
    krope_cache  [num_pages, page_size, Lrope]   the head dim is dropped)
    -> out       [B, H, Lkv]

The reference keeps caches as [num_pages, page_size, Hkv, D]
(decode_attention.py:183-188); the head-major layout here is deliberate — on
TPU the trailing (sublane, lane) dims of every DMA'd block must tile to
(8k, 128) and a per-head page slice [page_size, D] does, while a
[page_size, 1, D] slice of the reference layout does not.

TPU design: the Pallas kernel is a flash-decode over one KV page per grid step
(page_size=128 -> a full lane tile). The block table and sequence lengths are
scalar-prefetched so the KV page DMA is indexed *by the block table itself*
(PrefetchScalarGridSpec index_map), i.e. the gather happens in the DMA engine,
not as a compute-side gather. Pages past a sequence's end clamp their index to
the last valid page — Pallas elides the duplicate DMA — and are skipped with
pl.when. Online-softmax state (m, l, acc) lives in VMEM scratch across the
page-grid steps; fp32 accumulation throughout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, interpret_mode, use_pallas

_NEG_INF = -1e30


# ------------------------------------------------------------------ references


def decode_gqa_ref(q, k_cache, v_cache, seq_lens, block_table, sm_scale, page_size=None):
    """Vectorized gather + masked softmax (XLA-fused). Golden twin of the
    reference's numpy golden (tests/python/sgl_kernel_npu/test_decode_attention.py:18-128)."""
    b, hq, dk = q.shape
    hkv, _, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    g = hq // hkv
    max_pages = block_table.shape[1]

    k = k_cache[:, block_table]  # [Hkv, B, P, ps, Dk]
    v = v_cache[:, block_table]
    k = k.transpose(1, 0, 2, 3, 4).reshape(b, hkv, max_pages * ps, dk)
    v = v.transpose(1, 0, 2, 3, 4).reshape(b, hkv, max_pages * ps, dv)

    qf = q.astype(jnp.float32).reshape(b, hkv, g, dk)
    logits = jnp.einsum("bhgd,bhnd->bhgn", qf, k.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(max_pages * ps)[None, :] < seq_lens[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgn,bhnd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, dv).astype(q.dtype)


def decode_mla_ref(q, ckv_cache, krope_cache, seq_lens, block_table, sm_scale, page_size=None):
    b, h, d = q.shape
    lkv = ckv_cache.shape[-1]
    lrope = krope_cache.shape[-1]
    assert d == lkv + lrope
    ps = ckv_cache.shape[1]
    max_pages = block_table.shape[1]

    ckv = ckv_cache[block_table].reshape(b, max_pages * ps, lkv).astype(jnp.float32)
    krope = krope_cache[block_table].reshape(b, max_pages * ps, lrope).astype(jnp.float32)

    qf = q.astype(jnp.float32)
    logits = jnp.einsum("bhd,bnd->bhn", qf[..., :lkv], ckv)
    logits += jnp.einsum("bhd,bnd->bhn", qf[..., lkv:], krope)
    logits *= sm_scale
    mask = jnp.arange(max_pages * ps)[None, :] < seq_lens[:, None]
    logits = jnp.where(mask[:, None, :], logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhn,bnd->bhd", p, ckv)
    return out.astype(q.dtype)


# -------------------------------------------------------------- pallas kernels


def _gqa_decode_kernel(
    seq_lens_ref, block_table_ref,  # scalar prefetch
    q_ref, k_ref, v_ref, out_ref,
    m_ref, l_ref, acc_ref,
    *, page_size, sm_scale, num_page_steps,
):
    b = pl.program_id(0)
    p = pl.program_id(2)
    seq_len = seq_lens_ref[b]
    num_pages_b = pl.cdiv(seq_len, page_size)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p < num_pages_b)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)            # [G, Dk]
        k = k_ref[0, 0].astype(jnp.float32)            # [ps, Dk]
        v = v_ref[0, 0].astype(jnp.float32)            # [ps, Dv]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale                                    # [G, ps]
        col = p * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        pexp = jnp.exp(s - m_cur)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            pexp, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_cur

    @pl.when(p == num_page_steps - 1)
    def _():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def decode_gqa_pallas(q, k_cache, v_cache, seq_lens, block_table, sm_scale, page_size):
    b, hq, dk = q.shape
    hkv, _, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]

    q4 = q.reshape(b, hkv, g, dk)

    def kv_index_map(bb, h, p, sl_ref, bt_ref):
        last = pl.cdiv(sl_ref[bb], page_size) - 1
        page = bt_ref[bb, jnp.minimum(p, last)]
        return (h, page, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, g, dk), lambda bb, h, p, sl, bt: (bb, h, 0, 0)),
            pl.BlockSpec((1, 1, page_size, dk), kv_index_map),
            pl.BlockSpec((1, 1, page_size, dv), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, 1, g, dv), lambda bb, h, p, sl, bt: (bb, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(
            _gqa_decode_kernel,
            page_size=page_size,
            sm_scale=sm_scale,
            num_page_steps=max_pages,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32), q4, k_cache, v_cache)
    return out.reshape(b, hq, dv)


def _mla_decode_kernel(
    seq_lens_ref, block_table_ref,
    q_ref, ckv_ref, krope_ref, out_ref,
    m_ref, l_ref, acc_ref,
    *, page_size, sm_scale, num_page_steps, lkv,
):
    b = pl.program_id(0)
    p = pl.program_id(1)
    seq_len = seq_lens_ref[b]
    num_pages_b = pl.cdiv(seq_len, page_size)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p < num_pages_b)
    def _():
        q = q_ref[0].astype(jnp.float32)                # [H, Lkv+Lrope]
        ckv = ckv_ref[0].astype(jnp.float32)            # [ps, Lkv]
        kr = krope_ref[0].astype(jnp.float32)           # [ps, Lrope]
        s = jax.lax.dot_general(
            q[:, :lkv], ckv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s += jax.lax.dot_general(
            q[:, lkv:], kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s *= sm_scale
        col = p * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        pexp = jnp.exp(s - m_cur)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            pexp, ckv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_cur

    @pl.when(p == num_page_steps - 1)
    def _():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
        out_ref[0] = out.astype(out_ref.dtype)


def decode_mla_pallas(q, ckv_cache, krope_cache, seq_lens, block_table, sm_scale, page_size):
    b, h, d = q.shape
    lkv = ckv_cache.shape[-1]
    lrope = krope_cache.shape[-1]
    ps = ckv_cache.shape[1]
    assert ps == page_size and d == lkv + lrope
    max_pages = block_table.shape[1]

    def kv_index_map(bb, p, sl_ref, bt_ref):
        last = pl.cdiv(sl_ref[bb], page_size) - 1
        page = bt_ref[bb, jnp.minimum(p, last)]
        return (page, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_pages),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda bb, p, sl, bt: (bb, 0, 0)),
            pl.BlockSpec((1, page_size, lkv), kv_index_map),
            pl.BlockSpec((1, page_size, lrope), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, h, lkv), lambda bb, p, sl, bt: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, lkv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(
            _mla_decode_kernel,
            page_size=page_size,
            sm_scale=sm_scale,
            num_page_steps=max_pages,
            lkv=lkv,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lkv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32), q, ckv_cache, krope_cache)
    return out


# ------------------------------------------------------------------ dispatchers


def decode_gqa(q, k_cache, v_cache, seq_lens, block_table, sm_scale, page_size):
    # Mosaic lane tiling wants the head dim to be a multiple of 128 (verified
    # on v5e: D=32 fails "slice along dim 3 must be aligned to tiling (128)");
    # sub-128 head dims take the XLA reference path.
    if use_pallas() and q.shape[-1] % 128 == 0 and v_cache.shape[-1] % 128 == 0:
        # v2 (in-kernel double-buffered page DMA, per-sequence trip counts)
        # measures ~18% faster than the grid-per-page v1 on v5e.
        from .decode_v2 import decode_gqa_pallas_v2

        return decode_gqa_pallas_v2(q, k_cache, v_cache, seq_lens, block_table,
                                    sm_scale, page_size)
    return decode_gqa_ref(q, k_cache, v_cache, seq_lens, block_table, sm_scale, page_size)


def decode_mla(q, ckv_cache, krope_cache, seq_lens, block_table, sm_scale, page_size):
    if use_pallas():
        return decode_mla_pallas(q, ckv_cache, krope_cache, seq_lens, block_table, sm_scale, page_size)
    return decode_mla_ref(q, ckv_cache, krope_cache, seq_lens, block_table, sm_scale, page_size)


# ------------------------------------------------------------- INT8 KV cache


def decode_gqa_int8kv_ref(q, k_cache, v_cache, k_scales, v_scales, seq_lens,
                          block_table, sm_scale, page_size=None):
    """INT8-KV decode: caches int8 [Hkv, P, ps, D], scales f32 [Hkv, P, 1, ps]
    (per token-head). Dequant happens at gather; math matches decode_gqa_ref."""
    kd = k_cache.astype(jnp.float32) * k_scales.transpose(0, 1, 3, 2)
    vd = v_cache.astype(jnp.float32) * v_scales.transpose(0, 1, 3, 2)
    return decode_gqa_ref(q, kd, vd, seq_lens, block_table, sm_scale, page_size)


def _gqa_int8kv_kernel(
    seq_lens_ref, block_table_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
    m_ref, l_ref, acc_ref,
    *, page_size, sm_scale, num_page_steps,
):
    b = pl.program_id(0)
    p = pl.program_id(2)
    seq_len = seq_lens_ref[b]
    num_pages_b = pl.cdiv(seq_len, page_size)

    @pl.when(p == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p < num_pages_b)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)                 # [G, Dk]
        ks = ks_ref[0, 0]                                   # [1, ps]
        vs = vs_ref[0, 0]
        k = k_ref[0, 0].astype(jnp.float32) * ks.reshape(page_size, 1)
        v = v_ref[0, 0].astype(jnp.float32) * vs.reshape(page_size, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        col = p * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        pexp = jnp.exp(s - m_cur)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            pexp, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_cur

    @pl.when(p == num_page_steps - 1)
    def _():
        out_ref[0, 0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)).astype(out_ref.dtype)


def decode_gqa_int8kv_pallas(q, k_cache, v_cache, k_scales, v_scales, seq_lens,
                             block_table, sm_scale, page_size):
    b, hq, dk = q.shape
    hkv, _, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]
    q4 = q.reshape(b, hkv, g, dk)

    def kv_index_map(bb, h, p, sl_ref, bt_ref):
        last = pl.cdiv(sl_ref[bb], page_size) - 1
        page = bt_ref[bb, jnp.minimum(p, last)]
        return (h, page, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, g, dk), lambda bb, h, p, sl, bt: (bb, h, 0, 0)),
            pl.BlockSpec((1, 1, page_size, dk), kv_index_map),
            pl.BlockSpec((1, 1, page_size, dv), kv_index_map),
            pl.BlockSpec((1, 1, 1, page_size), kv_index_map),
            pl.BlockSpec((1, 1, 1, page_size), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, 1, g, dv), lambda bb, h, p, sl, bt: (bb, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_gqa_int8kv_kernel, page_size=page_size, sm_scale=sm_scale,
                num_page_steps=max_pages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      q4, k_cache, v_cache, k_scales, v_scales)
    return out.reshape(b, hq, dv)


def decode_gqa_int8kv(q, k_cache, v_cache, k_scales, v_scales, seq_lens,
                      block_table, sm_scale, page_size):
    if use_pallas():
        return decode_gqa_int8kv_pallas(q, k_cache, v_cache, k_scales, v_scales,
                                        seq_lens, block_table, sm_scale, page_size)
    return decode_gqa_int8kv_ref(q, k_cache, v_cache, k_scales, v_scales,
                                 seq_lens, block_table, sm_scale, page_size)


def decode_mla_int8_ref(q_nope_q, q_pe, ckv_cache_q, krope_cache, q_nope_scale,
                        ctkv_scale, seq_lens, block_table, sm_scale, page_size=None):
    """MLA decode over the int8 latent cache (mla_preprocess cache_mode=2:
    q_nope per-head symmetric int8 with q_nope_scale [H] MULTIPLYING at quant;
    ctkv per-tensor int8 with scalar ctkv_scale DIVIDING at quant).

    q_nope_q [B, H, Lkv] int8; q_pe [B, H, Lrope] fp; ckv_cache_q
    [P, ps, Lkv] int8; krope_cache [P, ps, Lrope] fp.
    Dequant: q_nope = q_q / q_nope_scale[h]; ctkv = ckv_q * ctkv_scale, so
      qk_nope = (q_q . ckv_q) * ctkv_scale / q_nope_scale[h]
      out     = (p . ckv_q) * ctkv_scale
    (int8 x int8 -> int32 on the MXU; fp epilogue.)
    """
    b, h, lkv = q_nope_q.shape
    ps = ckv_cache_q.shape[1]
    max_pages = block_table.shape[1]
    cs = jnp.asarray(ctkv_scale, jnp.float32).reshape(())

    ckv_q = ckv_cache_q[block_table].reshape(b, max_pages * ps, lkv)
    krope = krope_cache[block_table].reshape(b, max_pages * ps, -1).astype(jnp.float32)

    qk_n = jax.lax.dot_general(
        q_nope_q, ckv_q, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (cs / q_nope_scale.astype(jnp.float32))[None, :, None]
    qk_r = jnp.einsum("bhd,bnd->bhn", q_pe.astype(jnp.float32), krope)
    logits = (qk_n + qk_r) * sm_scale
    mask = jnp.arange(max_pages * ps)[None, :] < seq_lens[:, None]
    logits = jnp.where(mask[:, None, :], logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhn,bnd->bhd", p, ckv_q.astype(jnp.float32)) * cs
    return out
