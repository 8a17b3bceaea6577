"""mla_preprocess — the end-to-end MLA pre-attention fusion (DeepSeek class).

Reference parity: csrc/mla_preprocess/ (README.md:1-58; host tiling
op_host/mla_preprocess.cpp:133-552; kernel op_kernel/mla_preprocess_kernel.cpp)
with golden math from tests/python/sgl_kernel_npu/test_mla_preprocess.py
(golden2_pytorch:404-503; rope/rms/quant helpers :54-131).

Pipeline (dims for DeepSeek-V3: hidden 7168, heads 16-128):
  RMSNormQuant(hidden; gamma0, beta0; qscale0, qoffset0)      -> int8
  GEMM wdqkv [hidden -> 2112] int8xint8 + bias0, dequant descale0
  split -> latent [576 = ctkv 512 | krope 64], cq [1536]
  RMSNorm(cq; gamma1) + beta1 -> RMSNormQuant(qscale1, qoffset1) -> int8
  GEMM wuq [1536 -> H*192] + bias1, dequant descale1
  split per head -> q_nope [H,128] | q_pe [H,64]
  RMSNorm(ctkv; gamma2)
  RoPE(q_pe, k_pe; cos, sin)            (rotate-half style, full 64-dim table)
  EinSum wuk: q_nope [H,128] x [H,128,512] -> q_nope' [H,512]
  (cache_mode int8: per-head symm quant of q_nope', per-tensor quant of ctkv)
  reshape_and_cache(ctkv, krope; slot_mapping)

cache modes (reference cache_mode 0/1/2/3):
  "full"        kv_cache [pages, page_size, 576]  (ctkv|krope combined)
  "krope_ctkv"  split caches [pages, page_size, 512] + [pages, page_size, 64]
  "int8_nzcache" split caches with int8 ctkv + per-head-quantized q_nope.
    The reference's NZ (fractal) layout is an Ascend data format; on TPU the
    compiler owns tiling, so "NZ" modes keep the same logical [pages, ps, D]
    layout — this is the idiomatic mapping, not a gap (SURVEY.md §7 hard pt 3).

quant modes: "per_tensor" asymmetric static (default; formula
q = round(clamp(x/scale + offset))) and "per_token" dynamic symmetric.

Note: the reference test's goldens skip the FIRST RMSNorm (they quantize the
raw hidden states; test_mla_preprocess.py:330-333) while the op document
includes it; `apply_norm0=False` reproduces the golden exactly, True applies
the documented pipeline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .kvcache import reshape_and_cache_mla
from .quant import per_token_quant_int8

K_NOPE, K_PE, Q_RMS, Q_NOPE_DIM, Q_PE_DIM, Q_NOPE_OUT = 512, 64, 1536, 128, 64, 512


class MlaPreprocessOut(NamedTuple):
    q_nope: jax.Array       # [N, H, 512] (int8 in int8 cache mode)
    q_pe: jax.Array         # [N, H, 64]
    kv_cache: jax.Array     # updated ctkv (or combined) cache
    krope_cache: Optional[jax.Array]
    q_scale: Optional[jax.Array]  # always None: per-token activation scales
    # are folded into the f32 dequant before RoPE/EinSum in this composition
    # (no downstream op needs them); field kept for the reference's
    # output-tuple arity (mla_preprocess/README.md output list).


def _rms(x32, gamma, eps=1e-6):
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return x32 * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)


def _quant_per_tensor(x32, scale, offset):
    q = x32 / scale.astype(jnp.float32) + offset.astype(jnp.float32)
    # reference clamps in fp16 then rounds (quant_per_tensor, test:75-81)
    return jnp.round(jnp.clip(q.astype(jnp.float16), -128, 127)).astype(jnp.int8)


def _gemm_dequant(a_int8, w_int8, descale, bias):
    acc = jax.lax.dot_general(
        a_int8, w_int8, (((1,), (1,)), ((), ())),  # w stored [out, in]
        preferred_element_type=jnp.int32,
    )
    if bias is not None:
        acc = acc + bias
    return acc.astype(jnp.float32) * descale.astype(jnp.float32)


def rotate_half_rope(x, cos, sin):
    """x [..., 64] with cos/sin [N, 64] broadcast over heads (test:54-65)."""
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., half:], x32[..., :half]], axis=-1)
    return x32 * cos.astype(jnp.float32) + rot * sin.astype(jnp.float32)


def mla_preprocess(
    hidden, gamma0, beta0, wdqkv, descale0,
    gamma1, beta1, wuq, descale1, gamma2,
    cos, sin, wuk, kv_cache, krope_cache, slot_mapping,
    quant_scale0, quant_offset0, bias0,
    quant_scale1, quant_offset1, bias1,
    ctkv_scale=None, q_nope_scale=None,
    cache_mode: str = "krope_ctkv", quant_mode: str = "per_tensor",
    apply_norm0: bool = True,
    wdqkv_kn=None, wuq_kn=None,
):
    """See module docstring. hidden [N, hidden]; wdqkv [2112, hidden] int8;
    wuq [H*192, 1536] int8; wuk [H, 128, 512]; caches [pages, page_size, D].

    wdqkv_kn / wuq_kn: optional PRE-TRANSPOSED [in, out] copies of the two
    GEMM weights. When given (and on the Pallas tier), each
    RMSNormQuant->GEMM stage runs as ONE fused kernel
    (ops/rmsq_gemm.py — the reference's vector/cube-overlapped core,
    mla_preprocess_kernel.cpp:140-236) with the reference's fp16-clamp
    rounding in per_tensor mode. Transpose once at weight-load time
    (models/deepseek_mla.py::fuse_mla_weights) — transposing per call would
    materialize the copy every step."""
    from ..utils import use_pallas

    n = hidden.shape[0]
    # dims derived from weights (DeepSeek-V3: kn 512, kp 64, q_nope 128)
    kn = gamma2.shape[0]
    kp = cos.shape[-1]
    qn = wuk.shape[1]
    fused_tier = wdqkv_kn is not None and wuq_kn is not None and use_pallas()
    cast = "fp16" if quant_mode == "per_tensor" else "f32"

    q_token_scale = None
    if fused_tier:
        from .rmsq_gemm import rmsnorm_quant_gemm
        # apply_norm0=False means NO norm and NO affine here (the unfused
        # path quantizes raw hidden); rmsq's apply_norm=False still applies
        # the affine, so neutralize it
        g0 = gamma0 if apply_norm0 else jnp.ones_like(gamma0)
        b0 = beta0 if apply_norm0 else jnp.zeros_like(beta0)
        fused = rmsnorm_quant_gemm(
            hidden, g0, b0, wdqkv_kn, descale0,
            None if quant_mode != "per_tensor" else bias0,
            quant_scale0, quant_offset0, quant_mode=quant_mode,
            apply_norm=apply_norm0, quant_cast=cast)
    else:
        h32 = hidden.astype(jnp.float32)
        if apply_norm0:
            h32 = _rms(h32, gamma0) + beta0.astype(jnp.float32)
        if quant_mode == "per_tensor":
            hq = _quant_per_tensor(h32, quant_scale0, quant_offset0)
            fused = _gemm_dequant(hq, wdqkv, descale0, bias0)
        else:  # per_token dynamic symmetric (no bias, ref quant_mode 1/3)
            hq, hs = per_token_quant_int8(h32)
            fused = _gemm_dequant(hq, wdqkv, descale0, None) * hs

    latent, cq = fused[:, : kn + kp], fused[:, kn + kp:]
    ctkv = latent[:, :kn]
    k_pe = latent[:, kn:]

    ctkv = _rms(ctkv, gamma2)

    if fused_tier:
        q_out = rmsnorm_quant_gemm(
            cq, gamma1, beta1, wuq_kn, descale1,
            None if quant_mode != "per_tensor" else bias1,
            quant_scale1, quant_offset1, quant_mode=quant_mode,
            quant_cast=cast)
    else:
        cq = _rms(cq, gamma1) + beta1.astype(jnp.float32)
        if quant_mode == "per_tensor":
            cqq = _quant_per_tensor(cq, quant_scale1, quant_offset1)
            q_out = _gemm_dequant(cqq, wuq, descale1, bias1)
        else:
            cqq, cqs = per_token_quant_int8(cq)
            q_out = _gemm_dequant(cqq, wuq, descale1, None) * cqs

    heads = q_out.shape[-1] // (qn + kp)
    q_out = q_out.reshape(n, heads, qn + kp)
    q_nope, q_pe = q_out[..., :qn], q_out[..., qn:]

    # EinSum wuk: [N, H, 128] x [H, 128, 512] -> [N, H, 512]
    q_nope = jnp.einsum(
        "nhd,hdk->nhk", q_nope, wuk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    q_pe = rotate_half_rope(q_pe, cos[:, None, :], sin[:, None, :])
    k_pe = rotate_half_rope(k_pe, cos, sin)

    dtype = hidden.dtype
    if cache_mode == "int8_nzcache":
        # per-head symmetric quant; the scale MULTIPLIES here
        # (quant_per_tensor_muls, test_mla_preprocess.py:84-90)
        qn8 = (q_nope * q_nope_scale.astype(jnp.float32)[None, :, None]).astype(jnp.float16)
        q_nope = jnp.round(jnp.clip(qn8, -128, 127)).astype(jnp.int8)
        ctkv_q = _quant_per_tensor(ctkv, ctkv_scale, jnp.zeros((), jnp.float32))
        kv_cache, krope_cache = reshape_and_cache_mla(
            ctkv_q, k_pe.astype(dtype), kv_cache, krope_cache, slot_mapping)
    elif cache_mode == "full":
        combined = jnp.concatenate([ctkv, k_pe], axis=-1).astype(dtype)
        pages, ps, d = kv_cache.shape
        page = jnp.where(slot_mapping >= 0, slot_mapping // ps, pages)
        off = jnp.where(slot_mapping >= 0, slot_mapping % ps, 0)
        kv_cache = kv_cache.at[page, off].set(combined, mode="drop")
        q_nope = jnp.concatenate(
            [q_nope, q_pe], axis=-1).astype(dtype)  # q packed [N, H, 576]
        q_pe = q_pe.astype(dtype)
        q_nope_packed = q_nope
        return MlaPreprocessOut(q_nope_packed, q_pe, kv_cache, None, q_token_scale)
    else:  # krope_ctkv
        q_nope = q_nope.astype(dtype)
        kv_cache, krope_cache = reshape_and_cache_mla(
            ctkv.astype(dtype), k_pe.astype(dtype), kv_cache, krope_cache,
            slot_mapping)

    return MlaPreprocessOut(
        q_nope, q_pe.astype(dtype), kv_cache, krope_cache, q_token_scale)
