"""Flash-decode v13: v11's head-major pages + GROUP-batched bodies +
live-only sub-chunk fetch.

Where the r5 llama trace pinned v11 (2026-08-21, bs128 ps512): 193.8 us/call
against a 169 us full-page fetch floor (87%) and a 121 us LIVE-token floor —
the two gaps being (a) 128 one-sequence fori bodies' scalar bookkeeping and
single-wait-group pipelining, and (b) fetching the dead tail of each 512-row
page (mean live ~72%). The standalone v12 sub-chunk experiment lost because
4x the DMA issues per page swamped the byte saving at one-sequence
granularity; v13 amortizes exactly that overhead by processing G sequences
per body step, MLA-v3 style:

  * per body: G sequences' pages stream as live-gated [hkv, SUB, D]
    sub-chunk DMAs into one ring slot (one wait point per group);
  * ONE batched QK dot [G*hkv, g, D] x [G*hkv, ps, D] -> [G*hkv, g, ps]
    and a [G*hq, ps]-lane online softmax — zero masked-lane waste, 1/G the
    iterations;
  * finalize folds each sequence's current token via the proven per-sequence
    _finalize_rows (G static calls).

Cache layout and call contract are decode_v11's (tm2: [L, P, hkv, ps, D]
int8 + [L, P, hkv, ps] f32 scales).

Reference parity: decode attention package
(python/sgl_kernel_npu/attention/decode_attention.py), SURVEY §3.5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode
from .decode_v6 import _finalize_rows

_NEG_INF = -1e30
GROUP = int(__import__("os").environ.get("SKT_V13_G", "4"))
NBUF = int(__import__("os").environ.get("SKT_V13_NBUF", "2"))
SUB = int(__import__("os").environ.get("SKT_V13_SUB", "128"))


def _kernel_v13_int8(seq_ref, bt_ref, li_ref, q_ref, kn_ref, vn_ref,
                     k_hbm, v_hbm, ks_hbm, vs_hbm, out_ref,
                     kbuf, vbuf, ksbuf, vsbuf, acc_ref, m_ref, l_ref, sems,
                     *, page_size, sm_scale, hkv, g, max_pages, batch, gsz,
                     nsub):
    ps = page_size
    sub = ps // nsub
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    nc = max_pages                      # one page per chunk
    ngroups = batch // gsz
    total = ngroups * nc

    def dma_group(slot, s, start):
        grp = s // nc
        c = s - grp * nc
        li = li_ref[0]
        for gg in range(gsz):
            b = grp * gsz + gg
            clen = seq_ref[b]
            page = bt_ref[b, c]
            # K/V data: live-gated sub-chunks (the bytes that matter);
            # scales: one whole-page DMA each — a [hkv, sub] f32 slice is a
            # 4 KB descriptor, so sub-chunking them COSTS more issue
            # overhead than the bytes it saves
            @pl.when(c * ps < clen)
            def _scales(gg=gg, page=page):
                for hbm, buf, i in ((ks_hbm, ksbuf, 2), (vs_hbm, vsbuf, 3)):
                    copy = pltpu.make_async_copy(
                        hbm.at[li, page], buf.at[slot, gg],
                        sems.at[slot, gg, 0, i])
                    copy.start() if start else copy.wait()
            for j in range(nsub):
                @pl.when(c * ps + j * sub < clen)
                def _one(j=j, gg=gg, page=page):
                    for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1)):
                        copy = pltpu.make_async_copy(
                            hbm.at[li, page, :, pl.ds(j * sub, sub), :],
                            buf.at[slot, gg, :, pl.ds(j * sub, sub), :],
                            sems.at[slot, gg, j, i])
                        copy.start() if start else copy.wait()

    for s0 in range(min(NBUF, total)):
        dma_group(s0 % NBUF, jnp.int32(s0), True)

    def clen_col(grp):
        # [gsz*hkv, 1, 1] per-row live lengths from SMEM scalars
        return jnp.concatenate(
            [jnp.full((hkv, 1, 1), seq_ref[grp * gsz + gg], jnp.int32)
             for gg in range(gsz)], 0)

    def body(s, _):
        grp = s // nc
        c = s - grp * nc
        slot = jax.lax.rem(s, NBUF)

        @pl.when(c == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        dma_group(slot, s, False)
        q4 = q_ref[pl.ds(grp * gsz, gsz)].astype(jnp.bfloat16).reshape(
            gsz * hkv, g, d)
        k4 = kbuf[slot].astype(jnp.bfloat16).reshape(gsz * hkv, ps, d)
        v4 = vbuf[slot].astype(jnp.bfloat16).reshape(gsz * hkv, ps, dv)
        ks4 = ksbuf[slot].astype(jnp.float32).reshape(gsz * hkv, 1, ps)
        vs4 = vsbuf[slot].astype(jnp.float32).reshape(gsz * hkv, 1, ps)
        col = c * ps + jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps), 2)
        live = col < clen_col(grp)                       # [gsz*hkv, 1, ps]
        vs4 = jnp.where(live, vs4, 0.0)                  # stale-VMEM guard
        sc = jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [gsz*hkv, g, ps]
        sc = jnp.where(live, sc * ks4 * sm_scale, _NEG_INF)
        m3 = m_ref[...].reshape(gsz * hkv, g, 1)
        l3 = l_ref[...].reshape(gsz * hkv, g, 1)
        a3 = acc_ref[...].reshape(gsz * hkv, g, dv)
        mh = jnp.maximum(m3, jnp.max(sc, -1, keepdims=True))
        alpha = jnp.exp(m3 - mh)
        pexp = jnp.exp(sc - mh)
        l3 = l3 * alpha + jnp.sum(pexp, -1, keepdims=True)
        o = jax.lax.dot_general(
            (pexp * vs4).astype(jnp.bfloat16), v4,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_ref[...] = (a3 * alpha + o).reshape(gsz * hq, dv)
        m_ref[...] = mh.reshape(gsz * hq, 1)
        l_ref[...] = l3.reshape(gsz * hq, 1)

        @pl.when(s + NBUF < total)
        def _issue():
            dma_group(slot, s + NBUF, True)

        @pl.when(c == nc - 1)
        def _fin():
            for gg in range(gsz):
                b = grp * gsz + gg
                q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
                kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
                vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
                _finalize_rows(
                    q2, kn2, vn2, out_ref, b,
                    acc_ref.at[pl.ds(gg * hq, hq)],
                    m_ref.at[pl.ds(gg * hq, hq)],
                    l_ref.at[pl.ds(gg * hq, hq)],
                    sm_scale=sm_scale, hkv=hkv, g=g, dv=dv)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v13_int8_defer(q, k_new, v_new, k_cache, v_cache,
                                     k_scales, v_scales, cached_lens,
                                     block_table, sm_scale, page_size,
                                     layer_idx=0, group=None):
    """Group-batched live-fetch tm2 decode (module docstring). Same contract
    as decode_v11.decode_gqa_pallas_v11_int8_defer."""
    from .decode_v11 import decode_gqa_pallas_v11_int8_defer

    b, hq, dk = q.shape
    _, _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]
    gsz = group or GROUP
    while b % gsz:
        gsz //= 2
    if gsz <= 1:
        return decode_gqa_pallas_v11_int8_defer(
            q, k_new, v_new, k_cache, v_cache, k_scales, v_scales,
            cached_lens, block_table, sm_scale, page_size,
            layer_idx=layer_idx)
    nsub = max(1, ps // SUB) if SUB and ps % SUB == 0 else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, hq, dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dv), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, hq, dv), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, gsz, hkv, ps, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, gsz, hkv, ps, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, gsz, hkv, ps), k_scales.dtype),
            pltpu.VMEM((NBUF, gsz, hkv, ps), v_scales.dtype),
            pltpu.VMEM((gsz * hq, dv), jnp.float32),
            pltpu.VMEM((gsz * hq, 1), jnp.float32),
            pltpu.VMEM((gsz * hq, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, gsz, nsub, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v13_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b, gsz=gsz,
                nsub=nsub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * max_pages * ps * dk,
            bytes_accessed=b * max_pages * hkv * ps * (dk + dv + 8),
            transcendentals=b * hq * max_pages * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      jnp.asarray(layer_idx, jnp.int32)[None],
      q, k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales)
    return out
