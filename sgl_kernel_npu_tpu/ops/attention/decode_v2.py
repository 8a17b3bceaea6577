"""Flash-decode v2: manual double-buffered page DMA.

The v1 kernel (decode.py) lets the Pallas pipeline DMA one KV page per grid
step, with out-of-range steps clamped to a repeated index (copy elided, but
the grid still ticks max_pages times for every sequence). This version is the
reference's "high performance" tier analogue (decode_attention.py:454-740):

  * KV caches stay in HBM (memory_space ANY); the kernel issues its own
    per-page async copies indexed by the scalar-prefetched block table,
    double-buffered so page p+1 streams while page p computes;
  * the page loop is a fori_loop with the SEQUENCE'S OWN page count as the
    trip count — short sequences do less work AND less DMA (the v1 grid
    cannot);
  * grid is (batch, kv_heads): one program owns a whole sequence-head, so
    online-softmax state lives in registers/VMEM scratch without cross-step
    handoff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode

_NEG_INF = -1e30
NBUF = 2  # DMA pipeline depth (NBUF=4 measured no better on v5e)


def _kernel(seq_lens_ref, block_table_ref, q_ref, k_hbm, v_hbm, out_ref,
            k_buf, v_buf, acc_ref, sems, *, page_size, sm_scale, max_pages):
    b = pl.program_id(0)
    h = pl.program_id(1)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)

    def k_dma(slot, page_idx):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(
            k_hbm.at[h, page], k_buf.at[slot], sems.at[slot, 0])

    def v_dma(slot, page_idx):
        page = block_table_ref[b, page_idx]
        return pltpu.make_async_copy(
            v_hbm.at[h, page], v_buf.at[slot], sems.at[slot, 1])

    # warm-up: start the first NBUF-1 pages
    for w in range(NBUF - 1):
        @pl.when(w < num_pages)
        def _(w=w):
            k_dma(w, w).start()
            v_dma(w, w).start()

    q = q_ref[0, 0].astype(jnp.float32)          # [G, Dk]

    def body(p, carry):
        m_prev, l_prev = carry
        slot = jax.lax.rem(p, NBUF)
        nxt = jax.lax.rem(p + NBUF - 1, NBUF)

        @pl.when(p + NBUF - 1 < num_pages)
        def _():
            k_dma(nxt, p + NBUF - 1).start()
            v_dma(nxt, p + NBUF - 1).start()

        k_dma(slot, p).wait()
        v_dma(slot, p).wait()
        k = k_buf[slot].astype(jnp.float32)      # [ps, Dk]
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        col = p * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, s, _NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        pexp = jnp.exp(s - m_cur)
        l_cur = l_prev * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            pexp, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_cur, l_cur

    g = q.shape[0]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    m0 = jnp.full((g, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    m_f, l_f = jax.lax.fori_loop(0, num_pages, body, (m0, l0))
    out_ref[0, 0] = (acc_ref[...] / jnp.maximum(l_f, 1e-37)).astype(out_ref.dtype)


def decode_gqa_pallas_v2(q, k_cache, v_cache, seq_lens, block_table, sm_scale,
                         page_size):
    """q [B, Hq, Dk]; caches head-major [Hkv, P, ps, D]. Returns [B, Hq, Dv]."""
    b, hq, dk = q.shape
    hkv, _, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]
    q4 = q.reshape(b, hkv, g, dk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, dk), lambda bb, h, sl, bt: (bb, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, g, dv), lambda bb, h, sl, bt: (bb, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, page_size, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, page_size, dv), v_cache.dtype),
            pltpu.VMEM((g, dv), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, page_size=page_size, sm_scale=sm_scale,
                max_pages=max_pages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(seq_lens.astype(jnp.int32), block_table.astype(jnp.int32),
      q4, k_cache, v_cache)
    return out.reshape(b, hq, dv)
