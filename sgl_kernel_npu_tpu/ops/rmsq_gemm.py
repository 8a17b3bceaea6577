"""Fused RMSNorm(+affine) -> INT8 quant -> W8A8 GEMM -> dequant (one kernel).

This is the perf tier for mla_preprocess's two RMSNormQuant->GEMM stages.
The reference spends its largest kernel on exactly this fusion
(csrc/mla_preprocess/op_kernel/mla_preprocess_kernel.cpp:140-236): vector
cores run RMSNorm+quant while cube cores run the int8 GEMMs, handing tiles
over through L1. The TPU mapping is ONE Pallas kernel: the VPU computes the
normalized + quantized activation block as a prologue inside the same grid
step whose MXU dot consumes it, so the int8 activation never exists in HBM
and the dequant(+bias) epilogue rides the final K-step — zero intermediate
HBM round-trips between norm, quant, GEMM and dequant.

Layout contract: weights are [K, N] ("in, out" — NOTE: transposed from the
reference op's [out, in]) or pre-tiled stacked banks [L, NB, K, bn]
(ops/matmul.py::pretile_weight_bank) indexed by a traced layer id via the
scalar-prefetch channel — the same contiguous-DMA weight-stream treatment the
Llama decode uses. Models store the fused banks in this layout at init; the
unfused mla_preprocess composition keeps the reference's [out, in].

Quant-prologue cost note: the normalized int8 x block is computed ONCE per
(m-tile, k-tile) into a VMEM scratch on the first n-step and reused by the
remaining n-steps. Recomputing it per n-step would roughly double the
kernel's runtime at the mla shapes (VPU quant ~3 us per 256x7168 block vs
~4 us weight DMA per 7168x512 tile).

Numerics note: the reference clamps the quantized value in fp16 before
rounding (mla_preprocess quant_per_tensor; test_mla_preprocess.py:75-81).
quant_cast="fp16" reproduces that exactly (a VPU cast, zero extra cost);
the default "f32" rounds in f32 — a better quantizer, used by the Llama
W8A8 path whose checkpoints were calibrated without the fp16 clamp. Either
way, ANY fused-vs-unfused comparison can see rare +/-1-LSB flips on values
within a ulp of a rounding boundary (separately compiled float pipelines
may differ in FMA contraction), so parity tests must be quant-flip-aware:
bound the output error by a few flip-effects and require a high exact-match
fraction, never atol=1e-5 (root-caused 2026-08-20: 1 flip per ~4e5 elements
flipped only under the 8-virtual-device test env).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import cdiv, interpret_mode


def _rmsq_kernel(eid_ref, x_hbm, g_ref, b_ref, rs_ref, qs_ref, qo_ref,
                 os_ref, w_ref, ds_ref, *rest,
                 k_tiles, block_k, tiled, fp16_cast, has_bias):
    if has_bias:
        bias_ref, out_ref, acc_ref, xq_ref, xraw_ref, xsem = rest
    else:
        out_ref, acc_ref, xq_ref, xraw_ref, xsem = rest
        bias_ref = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _():
        # normalize + affine + quantize this x block once per (i, kk);
        # n-steps j>0 replay the cached int8 block from VMEM (recomputing per
        # n-step would ~double runtime at the mla shapes — see module doc).
        # x lives in ANY memory and is staged MANUALLY here: a blocked
        # (i, kk) input would be re-DMA'd on every (j, kk) grid step when
        # k_tiles > 1 (the index changes step-to-step), turning the w2-shape
        # call into ~200 MB of redundant activation traffic (bench regression
        # 6255 -> 5925 tok/s, 2026-08-20).
        bm = xraw_ref.shape[0]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * bm, bm), pl.ds(kk * block_k, block_k)],
            xraw_ref, xsem)
        cp.start()
        cp.wait()
        # NB divide by the scale (not multiply by a reciprocal): that is the
        # reference quantizer's formula (ops/quant.py) and a divide cannot be
        # FMA-contracted into a different rounding by the compiler.
        xn = (xraw_ref[...].astype(jnp.float32) * rs_ref[...] * g_ref[...]
              + b_ref[...])
        qv = xn / qs_ref[...] + qo_ref[...]
        if fp16_cast:
            # fp16 rounding WITHOUT an f16 cast: Mosaic on v5e rejects the
            # f32->f16 pack_subelements this position needs (verified
            # 2026-08-20). Round-to-nearest-even to fp16's 10-bit mantissa by
            # integer bit math on the f32 representation — exact for all
            # fp16-normal magnitudes; sub-normal/overflow inputs land outside
            # [-128.5, 127.5] or inside (-0.5, 0.5) where round+clip erase
            # the difference anyway.
            ri = jax.lax.bitcast_convert_type(qv, jnp.int32)
            ri = ri + 0xFFF + jnp.bitwise_and(jax.lax.shift_right_logical(
                ri, 13), 1)
            ri = jnp.bitwise_and(ri, jnp.int32(-8192))   # clear low 13 bits
            qv = jax.lax.bitcast_convert_type(ri, jnp.float32)
        q = jnp.clip(jnp.round(qv), -128, 127)
        xq_ref[kk] = q.astype(jnp.int8)

    xq = xq_ref[kk]
    w = w_ref[0, 0] if tiled else w_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @pl.when(kk == k_tiles - 1)
    def _():
        ds = (ds_ref[0, 0] if tiled else ds_ref[0]).astype(jnp.float32)
        acc = acc_ref[...]
        if has_bias:
            acc = acc + (bias_ref[0, 0] if tiled else bias_ref[0])
        out = acc.astype(jnp.float32) * ds * os_ref[...]
        out_ref[...] = out.astype(out_ref.dtype)


def _row_stats(x, gamma, beta, quant_scale, quant_offset, quant_mode,
               apply_norm, eps):
    """XLA-side per-row statistics: rstd (the only cross-K reduction RMSNorm
    needs), the quant divisor scale, the additive offset, and the epilogue
    per-row output scale. All outputs are [M, 1] / [1, 1] f32 — the bulk
    math stays in the kernel."""
    m = x.shape[0]
    x32 = x.astype(jnp.float32)
    if apply_norm:
        rstd = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    else:
        rstd = jnp.ones((m, 1), jnp.float32)
    if quant_mode == "per_tensor":
        qdiv = jnp.broadcast_to(
            quant_scale.astype(jnp.float32).reshape(()), (m, 1))
        qoff = quant_offset.astype(jnp.float32).reshape(1, 1)
        outsc = jnp.ones((m, 1), jnp.float32)
    else:  # per_token dynamic symmetric (ops/quant.py::per_token_quant_int8)
        normed = x32 * rstd * gamma.astype(jnp.float32)[None, :] \
            + beta.astype(jnp.float32)[None, :]
        amax = jnp.max(jnp.abs(normed), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-7) / 127.0
        qdiv = scale
        qoff = jnp.zeros((1, 1), jnp.float32)
        outsc = scale
    return rstd, qdiv, qoff, outsc


def rmsnorm_quant_gemm(x, gamma, beta, w, descale, bias=None,
                       quant_scale=None, quant_offset=None, li=None,
                       quant_mode: str = "per_tensor", apply_norm: bool = True,
                       eps: float = 1e-6, out_dtype=jnp.float32,
                       block_m: int = 256, block_n: int = 512,
                       quant_cast: str = "f32"):
    """out[M, N] = dequant((quant(rmsnorm(x) * gamma + beta) @ w) + bias).

    x [M, K] bf16/f32; gamma/beta [K] f32; w either [K, N] int8 or a
    pre-tiled stacked bank [L, NB, K, bn] int8 with `li` the (traced) layer
    index; descale [N] f32 (or [L, N]); bias [N] int32 (or [L, N]; None ok).
    quant_mode "per_tensor" uses quant_scale/quant_offset scalars (asymmetric
    static, the offset's GEMM contribution is folded into `bias` by the
    checkpoint exporter, exactly as the reference op expects); "per_token"
    computes dynamic symmetric row scales and multiplies them in the epilogue.
    apply_norm=False skips the RMSNorm (mla golden mode) but keeps the affine.
    quant_cast="fp16" clamps the pre-round value to fp16 first — the
    reference's quant_per_tensor semantics (see module doc).
    """
    assert quant_cast in ("f32", "fp16"), quant_cast
    m, k = x.shape
    tiled = w.ndim == 4
    has_bias = bias is not None   # bias-less callers skip the operand: a
    # zeros placeholder materialized a [L, 1, N] broadcast per call (~100
    # us/step in the 2026-08-20 MLA trace)
    if tiled:
        l, nb, _, bn = w.shape
        n = nb * bn
        assert w.shape[2] == k, (w.shape, k)
        descale = descale.reshape(l, 1, n)
        if has_bias:
            bias = bias.reshape(l, 1, n).astype(jnp.int32)
    else:
        assert w.shape[0] == k, (w.shape, k)
        n = w.shape[1]
        bn = min(block_n, n)
        descale = descale.reshape(1, n)
        if has_bias:
            bias = bias.reshape(1, n).astype(jnp.int32)
        li = jnp.int32(0)

    block_m = min(block_m, m)
    # whole-K blocks when they fit (fewer grid steps; the quantized block is
    # cached in scratch anyway) — else halve to the largest dividing tile
    # that keeps the double-buffered x block under ~1 MB of VMEM. (2 MB OOM'd
    # scoped vmem on the v5e at K=14336/bn=512: x 2x1.83 + w 2x3.67 + xq 1.83
    # = 17.5 MB > 16 — bench 2026-08-20.)
    block_k = k
    while block_m * block_k * x.dtype.itemsize > 1024 * 1024:
        assert block_k % 2 == 0, f"K={k} has no even split small enough"
        block_k //= 2
    # the 128-lane rule is a Mosaic compile constraint; interpret mode (CPU
    # tests at tiny dims, e.g. the MLA tiny config's q_lora 96) has none
    assert k % block_k == 0 and (block_k % 128 == 0 or interpret_mode()), \
        (k, block_k)
    k_tiles = k // block_k

    rstd, qdiv, qoff, outsc = _row_stats(
        x, gamma, beta, quant_scale, quant_offset, quant_mode, apply_norm, eps)

    grid = (cdiv(m, block_m), cdiv(n, bn), k_tiles)
    tile_map = jnp.full((cdiv(m, block_m),), li, jnp.int32)
    if tiled:
        w_spec = pl.BlockSpec((1, 1, block_k, bn),
                              lambda i, j, kk, eid: (eid[i], j, kk, 0))
        ds_spec = pl.BlockSpec((1, 1, bn), lambda i, j, kk, eid: (eid[i], 0, j))
    else:
        w_spec = pl.BlockSpec((block_k, bn), lambda i, j, kk, eid: (kk, j))
        ds_spec = pl.BlockSpec((1, bn), lambda i, j, kk, eid: (0, j))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),   # x: staged at j==0 only
        pl.BlockSpec((1, block_k), lambda i, j, kk, eid: (0, kk)),
        pl.BlockSpec((1, block_k), lambda i, j, kk, eid: (0, kk)),
        pl.BlockSpec((block_m, 1), lambda i, j, kk, eid: (i, 0)),
        pl.BlockSpec((block_m, 1), lambda i, j, kk, eid: (i, 0)),
        pl.BlockSpec((1, 1), lambda i, j, kk, eid: (0, 0)),
        pl.BlockSpec((block_m, 1), lambda i, j, kk, eid: (i, 0)),
        w_spec,
        ds_spec,
    ]
    operands = [gamma.astype(jnp.float32).reshape(1, k),
                beta.astype(jnp.float32).reshape(1, k), rstd, qdiv, qoff,
                outsc, w, descale.astype(jnp.float32)]
    if has_bias:
        in_specs.append(ds_spec)
        operands.append(bias)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, bn), lambda i, j, kk, eid: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.int32),
                        pltpu.VMEM((k_tiles, block_m, block_k), jnp.int8),
                        pltpu.VMEM((block_m, block_k), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    m_pad = cdiv(m, block_m) * block_m
    x_pad = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
    return pl.pallas_call(
        partial(_rmsq_kernel, k_tiles=k_tiles, block_k=block_k, tiled=tiled,
                fp16_cast=(quant_cast == "fp16"), has_bias=has_bias),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(tile_map, x_pad, *operands)


def rmsnorm_quant_gemm_ref(x, gamma, beta, w_kn, descale, bias=None,
                           quant_scale=None, quant_offset=None,
                           quant_mode: str = "per_tensor",
                           apply_norm: bool = True, eps: float = 1e-6,
                           out_dtype=jnp.float32, quant_cast: str = "f32"):
    """Unfused twin (same quant formula as the kernel) for parity tests."""
    rstd, qdiv, qoff, outsc = _row_stats(
        x, gamma, beta, quant_scale, quant_offset, quant_mode, apply_norm, eps)
    xn = (x.astype(jnp.float32) * rstd * gamma.astype(jnp.float32)[None, :]
          + beta.astype(jnp.float32)[None, :])
    qv = xn / qdiv + qoff
    if quant_cast == "fp16":
        qv = qv.astype(jnp.float16).astype(jnp.float32)
    q = jnp.clip(jnp.round(qv), -128, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_kn, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    if bias is not None:
        acc = acc + bias.astype(jnp.int32)[None, :]
    out = acc.astype(jnp.float32) * descale.astype(jnp.float32)[None, :] * outsc
    return out.astype(out_dtype)
