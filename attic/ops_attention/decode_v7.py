"""Flash-decode v7: two-tier KV — immutable int8 pages + bf16 token window.

Why v7 exists: v6 left one structural cost in the decode step — the XLA
scatter that appends each step's token to the paged cache prefers a
token-major layout, while the pallas kernels constrain their operands to the
default head-major page layout. XLA resolves the conflict by relayout-copying
the ENTIRE cache every step (4.9 ms/step at 8B/bs64 — fori-loop trace
2026-08-17). No placement of that scatter avoids the copy, because a
single-token update into [page, heads, slot, d] is 128-byte-strided by
construction.

v7 removes the mid-page scatter from the architecture instead:

  tier 1  paged int8 cache [P, hkv, ps, D] (+[P, hkv, 1, ps] scales) —
          WRITE-ONCE at W-token granularity: tokens only enter in aligned
          W-row bursts ("window flush"), an update window that is contiguous
          runs of W*D bytes per head, which XLA scatters in the default
          layout without any relayout pressure.
  tier 2  bf16 sidecar [L*S, W, hkv*D] token-major — the last (cached mod W)
          tokens of each sequence. The per-step append writes ONE contiguous
          [hkv*D] row per (layer, sequence): layout-neutral by construction.
          Sidecar rows are indexed by a persistent slot id so continuous
          batching can reorder requests between steps.

The attention kernel streams page DMAs exactly like v6 (flat (seq, page)
stream, depth-NBUF ring, full-matrix MXU dot with a static block-diagonal
mask) and adds one sidecar fetch + one MXU dot per sequence:
  s_side[hq, W] = q_blockdiag[hq, hkv*D] @ sidecar[W, hkv*D]^T
where q_blockdiag (head h's q occupying columns h*D..) is built by the
CALLER in XLA — the zero pattern makes the full contraction equal the
per-head dots, with no in-kernel mask or sublane reshuffle needed.

Accuracy note: the newest <=W tokens attend in exact bf16 (they are
quantized only once, at flush) — strictly better than quantize-then-read.

Reference parity: decode attention family
(python/sgl_kernel_npu/attention/decode_attention.py) + the NPU cache ops;
the two-tier write-once design is the TPU-native replacement for their
in-place single-token cache scatter (SURVEY §2.1 reshape-and-cache).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_mode

_NEG_INF = -1e30
NBUF = 8
WINDOW = 64     # sidecar depth / flush granularity (tokens)


def _kernel_v7_int8(seq_ref, bt_ref, srow_ref, q_ref, qbd_ref, kn_ref, vn_ref,
                    k_hbm, v_hbm, ks_hbm, vs_hbm, kside_hbm, vside_hbm,
                    out_ref,
                    kbuf, vbuf, ksbuf, vsbuf, sidek, sidev,
                    acc_ref, m_ref, l_ref, sems, side_sems,
                    *, page_size, sm_scale, hkv, g, max_pages, batch, window):
    ps = page_size
    hq = hkv * g
    d = q_ref.shape[-1]
    dv = vn_ref.shape[-1]
    hd = hkv * d
    total = batch * max_pages

    def flushed(b):
        return (seq_ref[b] // window) * window

    def valid_page(s):
        b = s // max_pages
        p = s - b * max_pages
        return p < pl.cdiv(flushed(b), ps)

    def dma4(slot, s, start):
        b = s // max_pages
        p = s - b * max_pages
        page = bt_ref[b, p]
        for hbm, buf, i in ((k_hbm, kbuf, 0), (v_hbm, vbuf, 1),
                            (ks_hbm, ksbuf, 2), (vs_hbm, vsbuf, 3)):
            cp = pltpu.make_async_copy(hbm.at[page], buf.at[slot],
                                       sems.at[slot, i])
            cp.start() if start else cp.wait()

    def side_dma(slot, b, start):
        row = srow_ref[b]
        for hbm, buf, i in ((kside_hbm, sidek, 0), (vside_hbm, sidev, 1)):
            cp = pltpu.make_async_copy(hbm.at[row], buf.at[slot],
                                       side_sems.at[slot, i])
            cp.start() if start else cp.wait()

    # prologue: ring fill + first sequences' sidecar rows
    for s0 in range(min(NBUF, total)):
        @pl.when(valid_page(jnp.int32(s0)))
        def _pro(s0=s0):
            dma4(s0 % NBUF, jnp.int32(s0), True)
    for b0 in range(min(2, batch)):
        side_dma(b0 % 2, jnp.int32(b0), True)

    def body(s, _):
        b = s // max_pages
        p = s - b * max_pages
        slot = jax.lax.rem(s, NBUF)
        fl = flushed(b)
        num_pages = pl.cdiv(fl, ps)

        @pl.when(p == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(p < num_pages)
        def _upd():
            dma4(slot, s, False)
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            k2 = kbuf[slot].astype(jnp.bfloat16).reshape(hkv * ps, d)
            v2 = vbuf[slot].astype(jnp.bfloat16).reshape(hkv * ps, d)
            ksr = ksbuf[slot].astype(jnp.float32).reshape(1, hkv * ps)
            vsr = vsbuf[slot].astype(jnp.float32).reshape(1, hkv * ps)
            col = p * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, hkv * ps), 1) % ps
            qh = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
            kh = jax.lax.broadcasted_iota(jnp.int32, (1, hkv * ps), 1) // ps
            blockmask = (qh == kh) & (col < fl)
            sc = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(blockmask, sc * ksr * sm_scale, _NEG_INF)
            mh_prev = m_ref[...]
            mh = jnp.maximum(mh_prev, jnp.max(sc, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(sc - mh)
            l_ref[...] = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
            o = jax.lax.dot_general((pexp * vsr).astype(jnp.bfloat16), v2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + o
            m_ref[...] = mh

        @pl.when((s + NBUF < total) & valid_page(s + NBUF))
        def _issue():
            dma4(slot, s + NBUF, True)

        @pl.when(p == max_pages - 1)
        def _fin():
            sslot = jax.lax.rem(b, 2)
            side_dma(sslot, b, False)

            # the prologue issued rows 0 and 1; refill the slot just drained
            @pl.when(b + 2 < batch)
            def _next_side():
                side_dma(sslot, b + 2, True)

            nside = seq_ref[b] - fl          # tokens in the sidecar
            qbd = qbd_ref[pl.ds(b, 1)].reshape(hq, hd)          # bf16
            ks2 = sidek[sslot]                                   # [W, hd]
            vs2 = sidev[sslot]
            scol = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
            sc = jax.lax.dot_general(qbd, ks2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(scol < nside, sc * sm_scale, _NEG_INF)
            mh_prev = m_ref[...]
            mh = jnp.maximum(mh_prev, jnp.max(sc, -1, keepdims=True))
            alpha = jnp.exp(mh_prev - mh)
            pexp = jnp.exp(sc - mh)
            l_mid = l_ref[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
            # o_side rows come back head-interleaved [W, hkv*Dv] -> the dot
            # against the block-diag structure of vside lands each head's
            # output in its own D-slice; sum the head slices via reshape
            o = jax.lax.dot_general(pexp.astype(jnp.bfloat16), vs2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # o is [hq, hkv*Dv]; row r (head hr) only needs its hr-slice
            o = o.reshape(hq, hkv, dv)
            qh2 = jax.lax.broadcasted_iota(jnp.int32, (hq, 1, 1), 0) // g
            kh2 = jax.lax.broadcasted_iota(jnp.int32, (1, hkv, 1), 1)
            o = jnp.sum(jnp.where(qh2 == kh2, o, 0.0), axis=1)
            acc_mid = acc_ref[...] * alpha + o

            # current token from registers (exact)
            q2 = q_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hq, d)
            kn2 = kn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, d)
            vn2 = vn_ref[pl.ds(b, 1)].astype(jnp.bfloat16).reshape(hkv, dv)
            sn = jax.lax.dot_general(q2, kn2, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * sm_scale
            qh3 = jax.lax.broadcasted_iota(jnp.int32, (hq, 1), 0) // g
            kh3 = jax.lax.broadcasted_iota(jnp.int32, (1, hkv), 1)
            sn = jnp.where(qh3 == kh3, sn, _NEG_INF)
            mh2 = jnp.maximum(mh, jnp.max(sn, -1, keepdims=True))
            alpha2 = jnp.exp(mh - mh2)
            pn = jnp.exp(sn - mh2)
            l_new = l_mid * alpha2 + jnp.sum(pn, -1, keepdims=True)
            on = jax.lax.dot_general(pn.astype(jnp.bfloat16), vn2,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc = acc_mid * alpha2 + on
            out_ref[pl.ds(b, 1)] = (acc / jnp.maximum(l_new, 1e-37)
                                    ).reshape(1, hq, dv).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def decode_gqa_pallas_v7_int8(q, q_blockdiag, k_new, v_new,
                              k_cache, v_cache, k_scales, v_scales,
                              k_side, v_side, side_rows, cached_lens,
                              block_table, sm_scale, page_size,
                              window=WINDOW):
    """Two-tier INT8 decode (module docstring).

    q [B, Hq, D]; q_blockdiag [B, Hq, Hkv*D] (head h's q in columns h*D..,
    zeros elsewhere — build with make_q_blockdiag); k_new/v_new [B, Hkv, D];
    paged caches int8 [P, Hkv, ps, D] + scales [P, Hkv, 1, ps]; sidecar
    [Srows, W, Hkv*D] bf16 with side_rows [B] selecting each sequence's row
    (callers fold the layer index in); cached_lens [B] EXCLUDING the current
    token; block_table [B, MP]. Tokens 0..flushed-1 (flushed = cached//W*W)
    read from pages, flushed..cached-1 from the sidecar, current from k_new.
    """
    b, hq, dk = q.shape
    _, hkv, ps, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert ps == page_size
    g = hq // hkv
    max_pages = block_table.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, hq, dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hq, hkv * dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dk), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((b, hkv, dv), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, hq, dv), lambda i, *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hkv, ps, dk), k_cache.dtype),
            pltpu.VMEM((NBUF, hkv, ps, dv), v_cache.dtype),
            pltpu.VMEM((NBUF, hkv, 1, ps), k_scales.dtype),
            pltpu.VMEM((NBUF, hkv, 1, ps), v_scales.dtype),
            pltpu.VMEM((2, window, hkv * dk), k_side.dtype),
            pltpu.VMEM((2, window, hkv * dv), v_side.dtype),
            pltpu.VMEM((hq, dv), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel_v7_int8, page_size=page_size, sm_scale=sm_scale,
                hkv=hkv, g=g, max_pages=max_pages, batch=b, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * max_pages * hkv * ps * dk,
            bytes_accessed=b * (max_pages * hkv * ps * (dk + dv + 8)
                                + window * hkv * (dk + dv) * 2),
            transcendentals=b * hq * max_pages * hkv * ps,
        ),
        interpret=interpret_mode(),
    )(jnp.maximum(cached_lens, 0).astype(jnp.int32),
      block_table.astype(jnp.int32),
      side_rows.astype(jnp.int32),
      q, q_blockdiag.astype(q.dtype),
      k_new.astype(q.dtype), v_new.astype(q.dtype),
      k_cache, v_cache, k_scales, v_scales, k_side, v_side)
    return out


def make_q_blockdiag(q, hkv):
    """[B, Hq, D] -> [B, Hq, Hkv*D] with head h's q in columns h*D..(h+1)*D.

    Built in XLA (one broadcast+mask+reshape per layer, ~4 MB at bs64) so the
    kernel's sidecar contraction needs no in-kernel mask or sublane reshuffle."""
    b, hq, d = q.shape
    g = hq // hkv
    qh = jnp.arange(hq)[:, None] // g                 # [Hq, 1]
    kh = jnp.arange(hkv)[None, :]                     # [1, Hkv]
    mask = (qh == kh).astype(q.dtype)                 # [Hq, Hkv]
    return (q[:, :, None, :] * mask[None, :, :, None]).reshape(b, hq, hkv * d)


def sidecar_append(k_side, v_side, k_new, v_new, side_rows, offs):
    """Append one token per sequence to the bf16 sidecar.

    k_side/v_side [Srows, W, Hkv*D]; k_new/v_new [R, Hkv, D] (R = L*B rows
    with side_rows [R] already layer-offset); offs [R] in [0, W). One
    contiguous [Hkv*D] row per entry — layout-neutral by construction."""
    r = k_new.shape[0]
    hd = k_new.shape[1] * k_new.shape[2]
    k_side = k_side.at[side_rows, offs].set(
        k_new.reshape(r, hd).astype(k_side.dtype), mode="drop")
    v_side = v_side.at[side_rows, offs].set(
        v_new.reshape(r, hd).astype(v_side.dtype), mode="drop")
    return k_side, v_side


def window_flush(k_cache, v_cache, k_scales, v_scales, k_side, v_side,
                 side_rows, pages, page_offs, do_flush, window=WINDOW):
    """Quantize each flushing sequence's sidecar window into the paged cache.

    side_rows [R]: sidecar row per (layer, seq) entry; pages [R]: target page;
    page_offs [R]: aligned start slot inside the page (multiple of W);
    do_flush [R] bool. The scatter's update window is [Hkv, W, D] — W*D-byte
    contiguous runs per head — which XLA handles in the default layout (the
    single-token variant's 128-byte runs are what forced whole-cache relayout
    copies; see module docstring)."""
    num_pages, hkv, ps, d = k_cache.shape
    win_k = k_side[side_rows].reshape(-1, window, hkv, d)     # [R, W, hkv, D]
    win_v = v_side[side_rows].reshape(-1, window, hkv, d)

    def q8(x):
        x = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-7) / 127.0
        qv = jnp.clip(jnp.round(x / scale), -128, 127)
        return qv.astype(jnp.int8), scale[..., 0]

    kq, ks = q8(win_k)       # kq [R, W, hkv, D], ks [R, W, hkv]
    vq, vs = q8(win_v)
    kq = kq.transpose(0, 2, 1, 3)                    # [R, hkv, W, D]
    vq = vq.transpose(0, 2, 1, 3)
    ks = ks.transpose(0, 2, 1)[:, :, None, :]        # [R, hkv, 1, W]
    vs = vs.transpose(0, 2, 1)[:, :, None, :]

    page = jnp.where(do_flush, pages, num_pages)     # OOB -> dropped
    k_cache = jax.lax.scatter(
        k_cache, jnp.stack([page, page_offs], -1), kq,
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 2)),
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    v_cache = jax.lax.scatter(
        v_cache, jnp.stack([page, page_offs], -1), vq,
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 2)),
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    k_scales = jax.lax.scatter(
        k_scales, jnp.stack([page, page_offs], -1), ks,
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 3)),
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    v_scales = jax.lax.scatter(
        v_scales, jnp.stack([page, page_offs], -1), vs,
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 3)),
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    return k_cache, v_cache, k_scales, v_scales
