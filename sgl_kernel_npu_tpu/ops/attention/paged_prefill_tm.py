"""Paged flash prefill over TOKEN-MAJOR pages + register chunk (defer-write).

The head-major prefill (paged_prefill.py) requires the chunk to be WRITTEN to
the cache before attending (write-then-attend), which on the token-major
layout would mean a serialized XLA scatter per layer. This kernel removes the
write from the attention contract instead:

  - the PREFIX (tokens 0..prefix_len-1) streams from the token-major INT8
    pages [L, P, ps*hkv, D] (+[L, P, 1, ps*hkv] f32 scales, row r = t*hkv+h,
    layer picked by a prefetched scalar — same cache as decode_v8/v9);
  - the CHUNK's k/v arrive as bf16 OPERANDS [T, hkv, D]. Reshaped to
    [T*hkv, D] they are ALREADY token-major — each ps-token block is handled
    by the same block-diagonal full-matrix dot as a cache page, with scale 1
    and a causal mask. The model quantizes + appends the chunk AFTER the
    layer scan (decode_v8.append_tm_int8_pallas), so the cache is read-only
    inside the scan — the same defer pattern that fixed decode.

Grid is (nq,) query tiles; each program walks cdiv(prefix_len, ps) page DMAs
(double-buffered ring) then the static chunk blocks under its causal
frontier. All heads are processed in one [bq*hq, ps*hkv] MXU dot with a
static block-diagonal mask (decode_v6's trick) — the token-major row order
makes per-head slicing unnecessary.

Reference parity: csrc/attentions `la` laser prefill + the chunked-prefill
attention of the decode package (SURVEY §2.1/§3.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import cdiv, interpret_mode

_NEG_INF = -1e30
NBUF = 2


def _kernel(bt_ref, plen_ref, li_ref, q_ref, ck_ref, cv_ref,
            k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
            kbuf, vbuf, ksbuf, vsbuf, acc_ref, m_ref, l_ref, sems,
            *, page_size, sm_scale, hkv, g, bq, t_chunk):
    ps = page_size
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = cv_ref.shape[-1]
    rows = ps * hkv
    qi = pl.program_id(0)
    prefix_len = plen_ref[0]
    valid_len = plen_ref[1]
    li = li_ref[0]
    n_prefix = pl.cdiv(prefix_len, ps)

    def dma4(slot, j, start):
        page = bt_ref[j]
        for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1),
                            (ks_hbm, ksbuf, 2), (vs_hbm, vsbuf, 3)):
            cp = pltpu.make_async_copy(hbm.at[li, page], buf.at[slot],
                                       sems.at[slot, i])
            cp.start() if start else cp.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    q2 = q_ref[0].astype(jnp.bfloat16).reshape(bq * hq, d)
    # row r_q = t*hq + h: query token (within chunk) and its kv head
    qtok = qi * bq + jax.lax.broadcasted_iota(
        jnp.int32, (bq * hq, 1), 0) // hq
    qh = (jax.lax.broadcasted_iota(jnp.int32, (bq * hq, 1), 0) % hq) // g
    kh = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) % hkv
    ktok = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) // hkv

    def flash_block(k2, v2, ksr, vsr, colmask):
        mask = (qh == kh) & colmask
        sc = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sc = jnp.where(mask, sc * ksr * sm_scale, _NEG_INF)
        m_prev = m_ref[...]
        mh = jnp.maximum(m_prev, jnp.max(sc, -1, keepdims=True))
        alpha = jnp.exp(m_prev - mh)
        pexp = jnp.exp(sc - mh)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
        o = jax.lax.dot_general((pexp * vsr).astype(jnp.bfloat16), v2,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + o
        m_ref[...] = mh

    # ---- prefix pages (int8, fully visible up to prefix_len) ----
    @pl.when(n_prefix > 0)
    def _pro():
        dma4(0, 0, True)

    def body(j, _):
        slot = jax.lax.rem(j, NBUF)

        @pl.when(j + 1 < n_prefix)
        def _issue():
            dma4(jax.lax.rem(j + 1, NBUF), j + 1, True)

        dma4(slot, j, False)
        k2 = kbuf[slot].astype(jnp.bfloat16)
        v2 = vbuf[slot].astype(jnp.bfloat16)
        ksr = ksbuf[slot].astype(jnp.float32)
        vsr = jnp.where(j * ps + ktok < prefix_len,
                        vsbuf[slot].astype(jnp.float32), 0.0)
        flash_block(k2, v2, ksr, vsr, j * ps + ktok < prefix_len)
        return 0

    jax.lax.fori_loop(0, n_prefix, body, 0)

    # ---- chunk blocks (bf16 operands, causal) ----
    for cb in range(cdiv(t_chunk, ps)):
        @pl.when(cb * ps <= qi * bq + bq - 1)   # block under causal frontier
        def _cb(cb=cb):
            lo = cb * rows
            k2 = ck_ref[pl.ds(lo, rows), :]
            v2 = cv_ref[pl.ds(lo, rows), :]
            col = cb * ps + ktok
            colmask = (col <= qtok) & (col < valid_len)
            one = jnp.ones((1, rows), jnp.float32)
            flash_block(k2, v2, one, jnp.where(colmask, 1.0, 0.0), colmask)

    out_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-37)
                  ).reshape(bq, hq, dv).astype(out_ref.dtype)


def paged_prefill_attention_tm(q, chunk_k, chunk_v, k_cache, v_cache,
                               k_scales, v_scales, block_table, prefix_len,
                               sm_scale, page_size, layer_idx=0,
                               valid_len=None, block_q: int = 16):
    """Defer-write chunk prefill over token-major pages (module docstring).

    q [T, Hq, D]; chunk_k/chunk_v [T, Hkv, D] bf16 (NOT yet in the cache);
    caches int8 [L, P, ps*Hkv, D] + scales [L, P, 1, ps*Hkv] (decode_v8
    layout); block_table [MP] per-layer page ids; prefix_len scalar;
    valid_len: tokens of the chunk that are real (default T). Returns
    [T, Hq, Dv]."""
    t, hq, dk = q.shape
    hkv = chunk_k.shape[1]
    _, _, rows, _ = k_cache.shape
    ps = rows // hkv
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv

    bq = min(block_q, t)
    nq = cdiv(t, bq)
    tpad = nq * bq
    if tpad != t:
        q = jnp.pad(q, ((0, tpad - t), (0, 0), (0, 0)))
    if valid_len is None:
        valid_len = t

    # token-major by free reshape; pad to whole ps-blocks (masked by
    # valid_len <= t in the kernel)
    tcb = cdiv(t, ps) * ps
    ck = chunk_k.astype(jnp.bfloat16).reshape(t * hkv, dk)
    cv = chunk_v.astype(jnp.bfloat16).reshape(t * hkv, dv)
    if tcb != t:
        ck = jnp.pad(ck, ((0, (tcb - t) * hkv), (0, 0)))
        cv = jnp.pad(cv, ((0, (tcb - t) * hkv), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec((1, bq, hq, dk), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((tcb * hkv, dk), lambda i, *_: (0, 0)),
            pl.BlockSpec((tcb * hkv, dv), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bq, hq, dv), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, rows, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, rows, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, 1, rows), k_scales.dtype),
            pltpu.VMEM((NBUF, 1, rows), v_scales.dtype),
            pltpu.VMEM((bq * hq, dv), jnp.float32),
            pltpu.VMEM((bq * hq, 1), jnp.float32),
            pltpu.VMEM((bq * hq, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, page_size=page_size, sm_scale=sm_scale, hkv=hkv,
                g=g, bq=bq, t_chunk=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, bq, hq, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(block_table.astype(jnp.int32),
      jnp.stack([jnp.asarray(prefix_len, jnp.int32).reshape(()),
                 jnp.asarray(valid_len, jnp.int32).reshape(())]),
      jnp.asarray(layer_idx, jnp.int32)[None],
      q.reshape(nq, bq, hq, dk), ck, cv,
      k_cache, v_cache, k_scales, v_scales)
    return out.reshape(tpad, hq, dv)[:t]
