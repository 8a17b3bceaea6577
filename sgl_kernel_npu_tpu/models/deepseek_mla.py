"""DeepSeek-V2/V3-class MLA decoder (BASELINE.json config 3:
"DeepSeek-V2-Lite MLA: mla_preprocess fusion + paged MLA decode with
speculative tree build/verify").

Wires the op layer end-to-end:
  ops.mla_preprocess (RMSNormQuant -> W8A8 GEMMs -> RoPE -> cache scatter)
  -> ops.attention.decode_mla (paged latent attention)
  -> W_UV/W_O projections -> W8A8 MoE-free FFN
Speculative decoding uses ops.speculative.build_tree_efficient /
verify_tree_greedy on top of the decode step (multi-token q per request).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mla_preprocess as mp
from ..ops.attention.decode import decode_mla
from ..ops.matmul import quant_matmul_int8_ref
from ..ops.quant import per_token_quant_int8
from ..utils import env, on_tpu, use_pallas


@dataclass(frozen=True)
class MlaConfig:
    vocab_size: int = 32768
    hidden_size: int = 2048
    num_layers: int = 4
    num_heads: int = 16
    kv_lora_rank: int = 512
    qk_rope_dim: int = 64
    qk_nope_dim: int = 128
    v_head_dim: int = 128
    q_lora_rank: int = 1536
    intermediate_size: int = 4096
    rms_eps: float = 1e-6
    page_size: int = 128
    max_position: int = 4096

    @property
    def mm1_out(self):
        return self.kv_lora_rank + self.qk_rope_dim + self.q_lora_rank


def tiny_config(**kw) -> MlaConfig:
    base = dict(vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
                kv_lora_rank=64, qk_rope_dim=16, qk_nope_dim=32, v_head_dim=32,
                q_lora_rank=96, intermediate_size=256, page_size=16,
                max_position=512)
    base.update(kw)
    return MlaConfig(**base)


def make_mla_cos_sin(cfg: MlaConfig, theta: float = 10000.0):
    """Neox-style cos/sin tables [max_position, qk_rope_dim] for the
    rotate_half RoPE used by mla_preprocess (ops/mla_preprocess.py:81-86)."""
    d = cfg.qk_rope_dim
    inv = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    t = np.arange(cfg.max_position, dtype=np.float64)[:, None] * inv[None, :]
    cos = np.cos(np.concatenate([t, t], -1))
    sin = np.sin(np.concatenate([t, t], -1))
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def init_params(cfg: MlaConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    l, h = cfg.num_layers, cfg.hidden_size
    heads = cfg.num_heads
    qdim = cfg.qk_nope_dim + cfg.qk_rope_dim

    def w8(*shape, scale=0.02):
        return {
            "q": jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8)),
            "descale": jnp.full(shape[-2] if len(shape) > 2 else (shape[0],),
                                scale / 127.0, jnp.float32),
        }

    def wq(out, inp):
        # [out, in] int8 + [out] descale (mla_preprocess convention)
        return {
            "q": jnp.asarray(rng.integers(-127, 128, (l, out, inp), dtype=np.int8)),
            "descale": jnp.full((l, out), 0.02 / 127.0, jnp.float32),
            "bias": jnp.zeros((l, out), jnp.int32),
        }

    layers = {
        "wdqkv": wq(cfg.mm1_out, h),
        "wuq": wq(heads * qdim, cfg.q_lora_rank),
        "wuk": jnp.asarray(rng.standard_normal(
            (l, heads, cfg.qk_nope_dim, cfg.kv_lora_rank)) * 0.05, jnp.float32),
        "wuv": jnp.asarray(rng.standard_normal(
            (l, heads, cfg.kv_lora_rank, cfg.v_head_dim)) * 0.05, jnp.float32),
        "wo": {
            "q": jnp.asarray(rng.integers(
                -127, 128, (l, heads * cfg.v_head_dim, h), dtype=np.int8)),
            "scale": jnp.full((l, h), 0.02 / 127.0, jnp.float32),
        },
        "w13": {
            "q": jnp.asarray(rng.integers(
                -127, 128, (l, h, 2 * cfg.intermediate_size), dtype=np.int8)),
            "scale": jnp.full((l, 2 * cfg.intermediate_size), 0.02 / 127.0, jnp.float32),
        },
        "w2": {
            "q": jnp.asarray(rng.integers(
                -127, 128, (l, cfg.intermediate_size, h), dtype=np.int8)),
            "scale": jnp.full((l, h), 0.02 / 127.0, jnp.float32),
        },
        "gamma0": jnp.ones((l, h), jnp.float32),
        "beta0": jnp.zeros((l, h), jnp.float32),
        "gamma1": jnp.ones((l, cfg.q_lora_rank), jnp.float32),
        "beta1": jnp.zeros((l, cfg.q_lora_rank), jnp.float32),
        "gamma2": jnp.ones((l, cfg.kv_lora_rank), jnp.float32),
        "post_norm": jnp.ones((l, h), jnp.bfloat16),
        "qscale0": jnp.full((l, 1), 0.05, jnp.float32),
        "qoffset0": jnp.zeros((l, 1), jnp.float32),
        "qscale1": jnp.full((l, 1), 0.05, jnp.float32),
        "qoffset1": jnp.zeros((l, 1), jnp.float32),
    }
    inv = 1.0 / (np.arange(1, cfg.qk_rope_dim // 2 + 1, dtype=np.float64))
    t = np.arange(cfg.max_position, dtype=np.float64)[:, None] * inv[None, :] * 0.01
    cos = np.cos(np.concatenate([t, t], -1))
    sin = np.sin(np.concatenate([t, t], -1))
    return {
        "embed": jnp.asarray(rng.standard_normal(
            (cfg.vocab_size, h)) * 0.02, jnp.bfloat16),
        "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": {
            "q": jnp.asarray(rng.integers(-127, 128, (h, cfg.vocab_size), dtype=np.int8)),
            "scale": jnp.full((cfg.vocab_size,), 0.02 / 127.0, jnp.float32),
        },
        "cos": jnp.asarray(cos, jnp.float32),
        "sin": jnp.asarray(sin, jnp.float32),
        "layers": layers,
    }


def init_kv_cache(cfg: MlaConfig, num_pages: int, dtype=jnp.bfloat16):
    ckv = jnp.zeros((cfg.num_layers, num_pages, cfg.page_size, cfg.kv_lora_rank), dtype)
    krope = jnp.zeros((cfg.num_layers, num_pages, cfg.page_size, cfg.qk_rope_dim), dtype)
    return ckv, krope


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def fuse_mla_weights(params):
    """Add [in, out]-transposed copies of wdqkv/wuq so mla_preprocess runs
    its two RMSNormQuant->GEMM stages as fused rmsq_gemm kernels (one-time
    load transform, like llama.pretile_big_weights). Returns params."""
    for name in ("wdqkv", "wuq"):
        bank = params["layers"][name]
        if "kn" not in bank:
            bank["kn"] = jnp.transpose(bank["q"], (0, 2, 1))
    return params


def _qmm(x, w):
    xq, xs = per_token_quant_int8(x)
    return quant_matmul_int8_ref(xq, w["q"], xs, w["scale"], out_dtype=x.dtype)


def combined_width(cfg: MlaConfig) -> int:
    """Latent row width of the combined cache: Lkv+Lrope zero-padded up to a
    lane-tile multiple — Mosaic rejects DMA slices whose minor dim is not
    128-aligned (chip probe 2026-08-20: 576 -> "must be aligned to tiling
    (128)"), so DeepSeek's 512|64 row stores as 640 with 64 zero lanes
    (+11% KV stream, the price of one-DMA-per-page fetches)."""
    return -(-(cfg.kv_lora_rank + cfg.qk_rope_dim) // 128) * 128


def init_kv_cache_combined(cfg: MlaConfig, num_pages: int, dtype=jnp.bfloat16,
                           quant: str = "bf16"):
    """COMBINED latent pages [L, P, ps, cpad] (ctkv | krope | zero pad) — the
    reference's cache_mode 0 "full" layout (csrc/mla_preprocess/README.md),
    chosen for the fast decode because one DMA then fetches a page's whole
    latent row set (ops/attention/decode_mla_v2.py; see combined_width).

    quant="int8": the reference's quantized-latent mode (cache_mode 2,
    int8_nzcache) mapped onto the combined layout — int8 rows with per-token
    dynamic scales [L, P, 1, ps] f32, halving the KV stream."""
    shape = (cfg.num_layers, num_pages, cfg.page_size, combined_width(cfg))
    if quant == "int8":
        return {"kv": jnp.zeros(shape, jnp.int8),
                "s": jnp.zeros((cfg.num_layers, num_pages, 1, cfg.page_size),
                               jnp.float32)}
    return jnp.zeros(shape, dtype)


_MLA_BIG = ("wdqkv", "wuq", "wo", "w13", "w2")


def _pad_cols(a, n_pad):
    """Zero-pad the last axis to n_pad."""
    if a.shape[-1] == n_pad:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n_pad - a.shape[-1])]
    return jnp.pad(a, pad)


def pretile_mla_weights(params, cfg: MlaConfig, block_n: int = None):
    """Build the fast-decode weight set (one-time load transform, the MLA twin
    of llama.pretile_big_weights):

      * the five big INT8 banks as pre-tiled [L, NB, K, bn] contiguous-DMA
        panels (ops/matmul.py::pretile_weight_bank), transposed to [K, N]
        where the checkpoint stores [out, in], with output dims zero-padded
        up to a bn multiple (wdqkv N 2112 -> 2560; w13/w2 pad the
        intermediate to a bn multiple; zero columns produce exact zeros, so
        sliced outputs are unchanged)
      * wuk/wuv as bf16 (they stream every step; f32 doubles their traffic)
      * lm_head as a 1-layer bank for the serving path (the greedy bench
        keeps the 2-D int8 copy: XLA fuses dot->argmax and never writes the
        [B, V] f32 logits)

    Stored under params["fast"]; originals are kept (they serve the prefill /
    verify paths and the parity tests — the MLA param set is ~2.6 GB, small
    enough to hold both on a 16 GB chip). Returns params."""
    from ..ops.matmul import pretile_weight_bank

    bn = block_n or env.env_int("SKT_GEMM_BN", 512)
    lay = params["layers"]
    f = cfg.intermediate_size
    f_pad = -(-f // min(bn, f)) * min(bn, f)

    def tile(kn):
        # pad N up to a panel multiple (small tiny-config dims become one
        # full-width panel) and pretile
        bn_i = min(bn, kn.shape[-1])
        n_pad = -(-kn.shape[-1] // bn_i) * bn_i
        return pretile_weight_bank(_pad_cols(kn, n_pad), bn_i), n_pad

    def tile_out_in(bank):
        # [L, out, in] int8 + [L, out] descale/bias -> padded tiled [K, N]
        q, n_pad = tile(jnp.transpose(bank["q"], (0, 2, 1)))
        out = {"q": q, "scale": _pad_cols(bank["descale"], n_pad)}
        if "bias" in bank:
            out["bias"] = _pad_cols(bank["bias"], n_pad)
        return out

    w13q = lay["w13"]["q"]                       # [L, h, 2f] int8
    w13s = lay["w13"]["scale"]
    w13_pad = jnp.concatenate(
        [_pad_cols(w13q[..., :f], f_pad), _pad_cols(w13q[..., f:], f_pad)], -1)
    w13s_pad = jnp.concatenate(
        [_pad_cols(w13s[..., :f], f_pad), _pad_cols(w13s[..., f:], f_pad)], -1)
    w2_pad = jnp.pad(lay["w2"]["q"], ((0, 0), (0, f_pad - f), (0, 0)))

    fast = {
        "wdqkv": tile_out_in(lay["wdqkv"]),
        "wuq": tile_out_in(lay["wuq"]),
        "wo": {"q": tile(lay["wo"]["q"])[0], "scale": lay["wo"]["scale"]},
        "w13": {"q": tile(w13_pad)[0], "scale": w13s_pad},
        "w2": {"q": tile(w2_pad)[0], "scale": lay["w2"]["scale"]},
        # beyond-bf16: both einsums store the CONTRACTED axis LAST so XLA's
        # batched dot consumes them directly — the natural [L,H,128,512] /
        # [L,H,512,128] layouts cost a per-layer slice+transpose+relayout
        # chain (~560 us/step in the 2026-08-20 MLA trace). Both layouts kept
        # (the pair is ~170 MB) so SKT_WUKV_T can A/B on chip.
        "wuk": lay["wuk"].astype(jnp.bfloat16),
        "wuv": lay["wuv"].astype(jnp.bfloat16),
        "wuk_t": jnp.transpose(lay["wuk"], (0, 1, 3, 2)).astype(jnp.bfloat16),
        "wuv_t": jnp.transpose(lay["wuv"], (0, 1, 3, 2)).astype(jnp.bfloat16),
    }
    params["fast"] = fast
    return params


def _qmm_l(x, bank, li):
    """Per-token INT8 quant + stacked tiled W8A8 GEMM at layer li."""
    from ..ops.matmul import quant_matmul_int8_stacked

    xq, xs = per_token_quant_int8(x)
    return quant_matmul_int8_stacked(xq, bank["q"], li, xs, bank["scale"],
                                     out_dtype=x.dtype)


def _nrq_l(x, norm_w, bank, li, eps, out_dtype=None):
    """Fused RMSNorm -> per-token INT8 quant -> stacked GEMM (llama._nrq_l).

    out_dtype=f32 for the w13 stage: its only consumer is the f32 SwiGLU, and
    a bf16 output forced XLA to materialize a separate [B, 2f] f32 convert
    pass (~690 us/step in the 2026-08-20 MLA trace)."""
    od = out_dtype or x.dtype
    if use_pallas() and x.shape[0] >= 8 and env.env_bool("SKT_FUSED_RMSQ", True):
        from ..ops.rmsq_gemm import rmsnorm_quant_gemm
        beta = jnp.zeros((x.shape[-1],), jnp.float32)
        return rmsnorm_quant_gemm(
            x, norm_w, beta, bank["q"], bank["scale"], None, li=li,
            quant_mode="per_token", eps=eps, out_dtype=od)
    from ..ops.matmul import quant_matmul_int8_stacked
    xn = _rms(x, norm_w, eps)
    xq, xs = per_token_quant_int8(xn)
    return quant_matmul_int8_stacked(xq, bank["q"], li, xs, bank["scale"],
                                     out_dtype=od)


def _rmsq_gemm_pt(x, gamma, beta, bank, li, qscale, qoffset, eps):
    """Per-tensor RMSNormQuant->GEMM stage on a tiled bank (the fused tier of
    mla_preprocess's two stages; falls back to the unfused reference math
    off-Pallas so tiny-config CPU tests exercise identical numerics)."""
    from ..ops.rmsq_gemm import rmsnorm_quant_gemm, rmsnorm_quant_gemm_ref

    if use_pallas() and x.shape[0] >= 8:
        return rmsnorm_quant_gemm(
            x, gamma, beta, bank["q"], bank["scale"], bank["bias"],
            qscale, qoffset, li=li, quant_mode="per_tensor", eps=eps,
            quant_cast="fp16")
    from ..ops.matmul import untile_weight_bank
    wl = jax.lax.dynamic_index_in_dim(bank["q"], li, 0, keepdims=True)
    w_kn = untile_weight_bank(wl)[0]
    ds = jax.lax.dynamic_index_in_dim(bank["scale"], li, 0, keepdims=False)
    bias = jax.lax.dynamic_index_in_dim(bank["bias"], li, 0, keepdims=False)
    return rmsnorm_quant_gemm_ref(
        x, gamma, beta, w_kn, ds, bias, qscale, qoffset,
        quant_mode="per_tensor", eps=eps, quant_cast="fp16")


def decode_step_c(params, cfg: MlaConfig, kv_cache,
                  input_ids, positions, seq_lens, block_table, slot_mapping):
    """Fast MLA decode over the COMBINED latent cache (the r5 perf path).

    The llama treatment applied to MLA (VERDICT r4 next-1): the five big INT8
    banks are closure-invariant pre-tiled panels indexed in-kernel by the
    layer id (never sliced by the scan), both mla_preprocess RMSNormQuant->
    GEMM stages run as single fused kernels, attention is the page-chunked
    combined-cache mega-stream (decode_mla_v2) with the cache READ-ONLY
    inside the layer scan, and all layers' new latent rows are appended once
    post-scan (Pallas aligned read-merge-write). Requires
    pretile_mla_weights(params, cfg) and an init_kv_cache_combined cache.

    Returns (logits [B, V], kv_cache)."""
    from ..ops.attention.decode_mla_v2 import (append_mla_pallas,
                                               append_mla_ref,
                                               decode_mla_pallas_v3_defer,
                                               decode_mla_v2_ref,
                                               decode_mla_v3_int8_ref,
                                               quant_latent_rows,
                                               scatter_latent_scales)

    b = input_ids.shape[0]
    heads = cfg.num_heads
    lkv, lrope = cfg.kv_lora_rank, cfg.qk_rope_dim
    qn, kp = cfg.qk_nope_dim, cfg.qk_rope_dim
    ps = cfg.page_size
    int8_kv = isinstance(kv_cache, dict)
    kv_arr = kv_cache["kv"] if int8_kv else kv_cache
    kv_s = kv_cache["s"] if int8_kv else None
    num_pages = kv_arr.shape[1]
    c_pad = kv_arr.shape[-1]
    sm_scale = 1.0 / ((qn + kp) ** 0.5)
    fast = params["fast"]
    f_pad = fast["w2"]["q"].shape[2]   # padded intermediate (static shape)

    x = params["embed"][input_ids]
    cos = params["cos"][positions]
    sin = params["sin"][positions]
    cached = seq_lens - 1

    small = {k: v for k, v in params["layers"].items() if k not in _MLA_BIG}

    def layer(carry, lp):
        x, li = carry
        # stage 1: RMSNormQuant -> wdqkv (fused; fp16-clamp per-tensor quant,
        # the reference's quant_per_tensor semantics)
        fused = _rmsq_gemm_pt(x, lp["gamma0"], lp["beta0"], fast["wdqkv"], li,
                              lp["qscale0"], lp["qoffset0"], cfg.rms_eps)
        latent = fused[:, : lkv + lrope]
        cq = fused[:, lkv + lrope: cfg.mm1_out]
        ctkv = _rms(latent[:, :lkv], lp["gamma2"], cfg.rms_eps)
        k_pe = latent[:, lkv:]

        # stage 2: RMSNormQuant -> wuq (fused)
        q_out = _rmsq_gemm_pt(cq, lp["gamma1"], lp["beta1"], fast["wuq"], li,
                              lp["qscale1"], lp["qoffset1"], cfg.rms_eps)
        q_out = q_out[:, : heads * (qn + kp)].reshape(b, heads, qn + kp)
        q_nope, q_pe = q_out[..., :qn], q_out[..., qn:]

        # EinSum wuk (bf16 weight stream): [B, H, 128] x [H, 512, 128] with
        # the contraction axis last on both sides (see pretile's wuk_t note).
        # bf16 x bf16 -> f32 is the MXU-native form; the CPU test backend
        # lacks that dot, so off-TPU the operands upcast to f32.
        ed = jnp.bfloat16 if on_tpu() else jnp.float32
        if wukv_t:
            q_nope = jnp.einsum("bhd,hkd->bhk", q_nope.astype(ed),
                                lp["wuk_t"].astype(ed),
                                preferred_element_type=jnp.float32)
        else:
            q_nope = jnp.einsum("bhd,hdk->bhk", q_nope.astype(ed),
                                lp["wuk"].astype(ed),
                                preferred_element_type=jnp.float32)

        q_pe = mp.rotate_half_rope(q_pe, cos[:, None, :], sin[:, None, :])
        k_pe = mp.rotate_half_rope(k_pe, cos, sin)
        # zero-pad latent rows and q to the lane-aligned combined width: the
        # padded score lanes contribute q_pad . kv_pad = 0 (combined_width)
        cpad = c_pad - (lkv + lrope)
        new_latent = jnp.concatenate([ctkv, k_pe], -1).astype(x.dtype)
        new_latent = jnp.pad(new_latent, ((0, 0), (0, cpad)))
        q = jnp.concatenate(
            [q_nope, q_pe.astype(jnp.float32)], -1).astype(x.dtype)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, cpad)))

        if use_pallas():
            att = decode_mla_pallas_v3_defer(
                q, new_latent, kv_arr, cached, block_table, sm_scale, ps,
                lkv, layer_idx=li, kv_scales=kv_s)
        elif int8_kv:
            att = decode_mla_v3_int8_ref(
                q, kv_arr, kv_s, new_latent, cached, block_table, sm_scale,
                ps, lkv, layer_idx=li)
        else:
            att = decode_mla_v2_ref(
                q, kv_arr, new_latent, cached, block_table, sm_scale, ps,
                lkv, layer_idx=li)

        if wukv_t:
            att = jnp.einsum("bhk,hdk->bhd", att.astype(ed),
                             lp["wuv_t"].astype(ed),
                             preferred_element_type=jnp.float32)
        else:
            att = jnp.einsum("bhk,hkd->bhd", att.astype(ed),
                             lp["wuv"].astype(ed),
                             preferred_element_type=jnp.float32)
        x = x + _qmm_l(att.reshape(b, -1).astype(x.dtype), fast["wo"], li)

        w13_od = (jnp.float32 if env.env_bool("SKT_W13_F32", True) else None)
        g32 = _nrq_l(x, lp["post_norm"], fast["w13"], li, cfg.rms_eps,
                     out_dtype=w13_od).astype(jnp.float32)
        act = (g32[:, :f_pad] * jax.nn.sigmoid(g32[:, :f_pad])
               * g32[:, f_pad:]).astype(x.dtype)
        x = x + _qmm_l(act, fast["w2"], li)
        return (x, li + 1), new_latent

    # default OFF: the contracted-axis-last layouts removed the ~460 us
    # relayout chain but made XLA's memory-space assignment emit a 113 MB
    # per-LAYER async copy of the wo bank (3.0 ms/step, trace3 vs trace2
    # 2026-08-20) — net 10.47k -> 9.91k tok/s. With the natural layouts the
    # relayout cost returns but the prefetch pathology vanishes: 11.69k.
    wukv_t = env.env_bool("SKT_WUKV_T", False)
    small_scan = dict(small)
    if wukv_t:
        small_scan["wuk_t"] = fast["wuk_t"]
        small_scan["wuv_t"] = fast["wuv_t"]
    else:
        small_scan["wuk"] = fast["wuk"]
        small_scan["wuv"] = fast["wuv"]
    (x, _), new_all = jax.lax.scan(layer, (x, jnp.int32(0)), small_scan)

    pages_b = jnp.where(slot_mapping >= 0, slot_mapping // ps, num_pages)
    offs_b = jnp.where(slot_mapping >= 0, slot_mapping % ps, 0)
    if int8_kv:
        new_q, new_s = quant_latent_rows(new_all)
        if use_pallas():
            kv_arr = append_mla_pallas(new_q, kv_arr, pages_b, offs_b)
        else:
            kv_arr = append_mla_ref(new_q, kv_arr, pages_b, offs_b)
        kv_s = scatter_latent_scales(kv_s, new_s, pages_b, offs_b)
        kv_cache = {"kv": kv_arr, "s": kv_s}
    elif use_pallas():
        kv_cache = append_mla_pallas(new_all, kv_cache, pages_b, offs_b)
    else:
        kv_cache = append_mla_ref(new_all, kv_cache, pages_b, offs_b)

    x = _rms(x, params["final_norm"], cfg.rms_eps)
    logits = _qmm(x, params["lm_head"]).astype(jnp.float32)
    return logits, kv_cache


def decode_step(params, cfg: MlaConfig, ckv_cache, krope_cache,
                input_ids, positions, seq_lens, block_table, slot_mapping):
    """One MLA decode step. Shapes as in llama.decode_step; caches
    [L, pages, page_size, D]. Returns (logits, ckv_cache, krope_cache)."""
    b = input_ids.shape[0]
    heads = cfg.num_heads
    sm_scale = 1.0 / ((cfg.qk_nope_dim + cfg.qk_rope_dim) ** 0.5)

    x = params["embed"][input_ids]
    cos = params["cos"][positions]
    sin = params["sin"][positions]

    def layer(carry, inputs):
        # stacked caches ride in the carry so XLA updates them in place
        # (xs->ys stacking re-materializes the full cache every layer; the
        # same change on the GQA model was worth ~10% end-to-end)
        x, ckv_all, kr_all, li = carry
        lp = inputs
        ckv_c = jax.lax.dynamic_index_in_dim(ckv_all, li, 0, keepdims=False)
        kr_c = jax.lax.dynamic_index_in_dim(kr_all, li, 0, keepdims=False)

        out = mp.mla_preprocess(
            x, lp["gamma0"], lp["beta0"],
            lp["wdqkv"]["q"], lp["wdqkv"]["descale"],
            lp["gamma1"], lp["beta1"],
            lp["wuq"]["q"], lp["wuq"]["descale"],
            lp["gamma2"], cos, sin, lp["wuk"],
            ckv_c, kr_c, slot_mapping,
            lp["qscale0"], lp["qoffset0"], lp["wdqkv"]["bias"],
            lp["qscale1"], lp["qoffset1"], lp["wuq"]["bias"],
            cache_mode="krope_ctkv",
            wdqkv_kn=lp["wdqkv"].get("kn"), wuq_kn=lp["wuq"].get("kn"),
        )
        q = jnp.concatenate(
            [out.q_nope.astype(jnp.float32), out.q_pe.astype(jnp.float32)], -1)
        att = decode_mla(q.astype(x.dtype), out.kv_cache, out.krope_cache,
                         seq_lens, block_table, sm_scale, cfg.page_size)
        # up-project latent attention output per head: [B, H, kv_lora] x wuv
        att = jnp.einsum("bhk,hkd->bhd", att.astype(jnp.float32), lp["wuv"])
        x = x + _qmm(att.reshape(b, -1).astype(x.dtype), lp["wo"])

        h2 = _rms(x, lp["post_norm"], cfg.rms_eps)
        ug = _qmm(h2, lp["w13"]).astype(jnp.float32)
        f = cfg.intermediate_size
        act = (ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]).astype(x.dtype)
        x = x + _qmm(act, lp["w2"])
        ckv_all = jax.lax.dynamic_update_slice_in_dim(
            ckv_all, out.kv_cache[None], li, 0)
        kr_all = jax.lax.dynamic_update_slice_in_dim(
            kr_all, out.krope_cache[None], li, 0)
        return (x, ckv_all, kr_all, li + 1), ()

    (x, ckv_cache, krope_cache, _), _ = jax.lax.scan(
        layer, (x, ckv_cache, krope_cache, jnp.int32(0)), params["layers"])

    x = _rms(x, params["final_norm"], cfg.rms_eps)
    logits = _qmm(x, params["lm_head"]).astype(jnp.float32)
    return logits, ckv_cache, krope_cache


def prefill_step(params, cfg: MlaConfig, ckv_cache, krope_cache,
                 input_ids, positions, slot_mapping):
    """Single-sequence MLA prefill: mla_preprocess on the whole chunk (the
    reference op serves prefill too, tokenNum <= 1024 — mla_preprocess
    README.md:53), then causal latent attention over the written cache.

    Returns (logits [T, V], ckv_cache, krope_cache)."""
    t = input_ids.shape[0]
    heads = cfg.num_heads
    sm_scale = 1.0 / ((cfg.qk_nope_dim + cfg.qk_rope_dim) ** 0.5)

    x = params["embed"][input_ids]
    cos = params["cos"][positions]
    sin = params["sin"][positions]
    causal = jnp.tril(jnp.ones((t, t), bool))

    def layer(carry, inputs):
        (x,) = carry
        lp, ckv_c, kr_c = inputs
        out = mp.mla_preprocess(
            x, lp["gamma0"], lp["beta0"],
            lp["wdqkv"]["q"], lp["wdqkv"]["descale"],
            lp["gamma1"], lp["beta1"], lp["wuq"]["q"], lp["wuq"]["descale"],
            lp["gamma2"], cos, sin, lp["wuk"],
            ckv_c, kr_c, slot_mapping,
            lp["qscale0"], lp["qoffset0"], lp["wdqkv"]["bias"],
            lp["qscale1"], lp["qoffset1"], lp["wuq"]["bias"],
            cache_mode="krope_ctkv",
            wdqkv_kn=lp["wdqkv"].get("kn"), wuq_kn=lp["wuq"].get("kn"),
        )
        # causal latent attention within the chunk (latents straight from the
        # fusion, no cache gather needed for single-sequence prefill)
        qn = out.q_nope.astype(jnp.float32)          # [T, H, Lkv]
        qp = out.q_pe.astype(jnp.float32)            # [T, H, Lrope]
        # gather this chunk's latents back from the cache slots
        ps = cfg.page_size
        page = slot_mapping // ps
        off = slot_mapping % ps
        ckv_rows = out.kv_cache[page, off].astype(jnp.float32)     # [T, Lkv]
        kr_rows = out.krope_cache[page, off].astype(jnp.float32)   # [T, Lrope]
        s = (jnp.einsum("thd,nd->thn", qn, ckv_rows)
             + jnp.einsum("thd,nd->thn", qp, kr_rows)) * sm_scale
        s = jnp.where(causal[:, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("thn,nd->thd", p, ckv_rows)
        att = jnp.einsum("bhk,hkd->bhd", att, lp["wuv"])
        x = x + _qmm(att.reshape(t, -1).astype(x.dtype), lp["wo"])

        h2 = _rms(x, lp["post_norm"], cfg.rms_eps)
        ug = _qmm(h2, lp["w13"]).astype(jnp.float32)
        f = cfg.intermediate_size
        act = (ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]).astype(x.dtype)
        x = x + _qmm(act, lp["w2"])
        return (x,), (out.kv_cache, out.krope_cache)

    (x,), (ckv_cache, krope_cache) = jax.lax.scan(
        layer, (x,), (params["layers"], ckv_cache, krope_cache))
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    logits = _qmm(x, params["lm_head"]).astype(jnp.float32)
    return logits, ckv_cache, krope_cache


def decode_verify_step(params, cfg: MlaConfig, ckv_cache, krope_cache,
                       input_ids, positions, tree_mask, seq_lens,
                       block_table, slot_mapping):
    """Multi-token MLA verification step (config-3 spec decode: the target
    model scores a whole draft tree in one pass; ops.speculative's
    build_tree_efficient supplies `tree_mask`, verify_tree_greedy consumes the
    argmax of the returned logits).

    input_ids/positions/slot_mapping [B, dt]; tree_mask [B, dt, dt] bool;
    seq_lens [B] prefix length EXCLUDING drafts; block_table [B, mp].
    Returns (logits [B, dt, V], ckv_cache, krope_cache).
    """
    b, dt = input_ids.shape
    n = b * dt
    heads = cfg.num_heads
    sm_scale = 1.0 / ((cfg.qk_nope_dim + cfg.qk_rope_dim) ** 0.5)
    ps = cfg.page_size
    mp_pages = block_table.shape[1]
    npos = mp_pages * ps

    x = params["embed"][input_ids].reshape(n, -1)
    cos = params["cos"][positions.reshape(-1)]
    sin = params["sin"][positions.reshape(-1)]
    slots = slot_mapping.reshape(-1)

    # position mask: gathered row p is visible to draft i of request b iff
    # p < seq_len (prefix) or p lands on draft j with tree_mask[b, i, j]
    nidx = jnp.arange(npos)
    off = nidx[None, :] - seq_lens[:, None]                   # [B, N]
    in_tree = (off >= 0) & (off < dt)
    tree_ok = jnp.take_along_axis(
        tree_mask, jnp.broadcast_to(jnp.clip(off, 0, dt - 1)[:, None, :],
                                    (b, dt, npos)), axis=2)
    allowed = (nidx[None, None, :] < seq_lens[:, None, None]) \
        | (in_tree[:, None, :] & tree_ok)                     # [B, dt, N]

    def layer(carry, inputs):
        x, ckv_all, kr_all, li = carry
        lp = inputs
        ckv_c = jax.lax.dynamic_index_in_dim(ckv_all, li, 0, keepdims=False)
        kr_c = jax.lax.dynamic_index_in_dim(kr_all, li, 0, keepdims=False)

        out = mp.mla_preprocess(
            x, lp["gamma0"], lp["beta0"],
            lp["wdqkv"]["q"], lp["wdqkv"]["descale"],
            lp["gamma1"], lp["beta1"], lp["wuq"]["q"], lp["wuq"]["descale"],
            lp["gamma2"], cos, sin, lp["wuk"],
            ckv_c, kr_c, slots,
            lp["qscale0"], lp["qoffset0"], lp["wdqkv"]["bias"],
            lp["qscale1"], lp["qoffset1"], lp["wuq"]["bias"],
            cache_mode="krope_ctkv",
            wdqkv_kn=lp["wdqkv"].get("kn"), wuq_kn=lp["wuq"].get("kn"),
        )
        # gather prefix + drafts straight from the updated cache (logical
        # position order — drafts sit at seq_len..seq_len+dt-1)
        ckv_rows = out.kv_cache[block_table].reshape(
            b, npos, -1).astype(jnp.float32)
        kr_rows = out.krope_cache[block_table].reshape(
            b, npos, -1).astype(jnp.float32)
        qn = out.q_nope.reshape(b, dt, heads, -1).astype(jnp.float32)
        qp = out.q_pe.reshape(b, dt, heads, -1).astype(jnp.float32)

        s = (jnp.einsum("bthk,bnk->bthn", qn, ckv_rows)
             + jnp.einsum("bthr,bnr->bthn", qp, kr_rows)) * sm_scale
        s = jnp.where(allowed[:, :, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bthn,bnk->bthk", p, ckv_rows)
        att = jnp.einsum("bthk,hkd->bthd", att, lp["wuv"])
        x2 = x + _qmm(att.reshape(n, -1).astype(x.dtype), lp["wo"])

        h2 = _rms(x2, lp["post_norm"], cfg.rms_eps)
        ug = _qmm(h2, lp["w13"]).astype(jnp.float32)
        f = cfg.intermediate_size
        act = (ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]).astype(x.dtype)
        x2 = x2 + _qmm(act, lp["w2"])

        ckv_all = jax.lax.dynamic_update_slice_in_dim(
            ckv_all, out.kv_cache[None], li, 0)
        kr_all = jax.lax.dynamic_update_slice_in_dim(
            kr_all, out.krope_cache[None], li, 0)
        return (x2, ckv_all, kr_all, li + 1), ()

    (x, ckv_cache, krope_cache, _), _ = jax.lax.scan(
        layer, (x, ckv_cache, krope_cache, jnp.int32(0)), params["layers"])
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    logits = _qmm(x, params["lm_head"]).astype(jnp.float32)
    return logits.reshape(b, dt, -1), ckv_cache, krope_cache
