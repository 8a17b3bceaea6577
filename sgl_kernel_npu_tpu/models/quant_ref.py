"""f32 reference twins + checkpoint-free quantization-Δ measurement.

BASELINE.json's north star requires accuracy "within the reference's stated Δ
at the same bit-width", but no HF checkpoints are reachable in this
environment (tests/test_accuracy_vs_hf.py importorskips). The honest
substitute (VERDICT r4 next-6): generate SMOOTH f32 weights, run a dense f32
reference forward, quantize the same weights to the engine's W8A8 format
(per-output-channel symmetric int8, plus per-tensor activation calibration
where the reference op contract is per-tensor), run the INT8 engine on the
same token stream, and report perplexity Δ and logits KL. The reference repo
ships no accuracy numbers at all (SURVEY §6) — these are the first in either
codebase; scripts/accuracy_delta.py writes ACCURACY.md and
tests/test_accuracy_delta.py gates the Δ.

Reference parity anchors: the W8A8 contract of mla_preprocess
(csrc/mla_preprocess: int8 GEMMs with per-tensor asymm activation quant) and
the INT8 dispatch/SwiGLU path (swiglu_quant.py, fused_deep_moe.h).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ llama


def llama_f32_params(cfg, seed=0):
    """Smooth random f32 weights in [out]-last layout matching
    models/llama.py's bank shapes."""
    rng = np.random.default_rng(seed)
    l, h = cfg.num_layers, cfg.hidden_size
    qs, kvs, f = cfg.q_size, cfg.kv_size, cfg.intermediate_size

    def w(*shape, s):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    return {
        "embed": w(cfg.vocab_size, h, s=0.02),
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": w(h, cfg.vocab_size, s=0.02),
        "layers": {
            "wqkv": w(l, h, qs + 2 * kvs, s=h ** -0.5),
            "wo": w(l, qs, h, s=qs ** -0.5),
            "w13": w(l, h, 2 * f, s=h ** -0.5),
            "w2": w(l, f, h, s=f ** -0.5),
            "input_norm": jnp.ones((l, h), jnp.float32),
            "post_norm": jnp.ones((l, h), jnp.float32),
        },
    }


def quantize_llama(p32, cfg):
    """f32 params -> the llama engine's int8 param pytree (per-output-channel
    symmetric weights; activations quantize per-token dynamically in-engine)."""
    from ..ops.rope import make_cos_sin_cache

    def q(w):
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8) / 127.0
        qw = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
        return {"q": qw, "scale": s}

    lay = p32["layers"]
    return {
        "embed": p32["embed"].astype(jnp.bfloat16),
        "final_norm": p32["final_norm"].astype(jnp.bfloat16),
        "lm_head": q(p32["lm_head"]),
        "layers": {
            "wqkv": q(lay["wqkv"]),
            "wo": q(lay["wo"]),
            "w13": q(lay["w13"]),
            "w2": q(lay["w2"]),
            "input_norm": lay["input_norm"].astype(jnp.bfloat16),
            "post_norm": lay["post_norm"].astype(jnp.bfloat16),
        },
        "cos_sin": make_cos_sin_cache(cfg.max_position, cfg.head_dim,
                                      cfg.rope_base),
    }


def llama_f32_forward(p32, cfg, ids):
    """Dense causal f32 forward, ids [T] -> logits [T, V]. The engine's
    golden: same math as models/llama.py's prefill with exact f32 weights."""
    from ..ops.rope import apply_rope, make_cos_sin_cache

    t = ids.shape[0]
    hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = hq // hkv
    sm = 1.0 / d ** 0.5
    cs = make_cos_sin_cache(cfg.max_position, d, cfg.rope_base)[
        jnp.arange(t)].astype(jnp.float32)
    cos, sin = cs[:, : d // 2], cs[:, d // 2:]
    causal = jnp.tril(jnp.ones((t, t), bool))

    def rms(x, w):
        v = jnp.mean(x * x, -1, keepdims=True)
        return x * jax.lax.rsqrt(v + cfg.rms_eps) * w

    x = p32["embed"][ids]
    lay = p32["layers"]
    for li in range(cfg.num_layers):
        h1 = rms(x, lay["input_norm"][li])
        qkv = h1 @ lay["wqkv"][li]
        q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], -1)
        q = apply_rope(q.reshape(t, hq, d), cos[:, None], sin[:, None])
        k = apply_rope(k.reshape(t, hkv, d), cos[:, None], sin[:, None])
        v = v.reshape(t, hkv, d)
        qh = q.reshape(t, hkv, g, d)
        s = jnp.einsum("thgd,nhd->hgtn", qh, k) * sm
        s = jnp.where(causal[None, None], s, -1e30)
        att = jnp.einsum("hgtn,nhd->thgd", jax.nn.softmax(s, -1), v)
        x = x + att.reshape(t, -1) @ lay["wo"][li]
        h2 = rms(x, lay["post_norm"][li])
        ug = h2 @ lay["w13"][li]
        f = cfg.intermediate_size
        x = x + (ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]) @ lay["w2"][li]
    return rms(x, p32["final_norm"]) @ p32["lm_head"]


# -------------------------------------------------------------------- mla


def mla_f32_params(cfg, seed=0):
    """Smooth f32 weights for the MLA pipeline in [out, in] layout (the
    mla_preprocess op convention, models/deepseek_mla.py)."""
    rng = np.random.default_rng(seed)
    l, h = cfg.num_layers, cfg.hidden_size
    heads = cfg.num_heads
    qdim = cfg.qk_nope_dim + cfg.qk_rope_dim

    def w(*shape, s):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    return {
        "embed": w(cfg.vocab_size, h, s=0.02),
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": w(h, cfg.vocab_size, s=0.02),
        "layers": {
            "wdqkv": w(l, cfg.mm1_out, h, s=h ** -0.5),
            "wuq": w(l, heads * qdim, cfg.q_lora_rank, s=cfg.q_lora_rank ** -0.5),
            "wuk": w(l, heads, cfg.qk_nope_dim, cfg.kv_lora_rank, s=0.06),
            "wuv": w(l, heads, cfg.kv_lora_rank, cfg.v_head_dim, s=0.04),
            "wo": w(l, heads * cfg.v_head_dim, h, s=(heads * cfg.v_head_dim) ** -0.5),
            "w13": w(l, h, 2 * cfg.intermediate_size, s=h ** -0.5),
            "w2": w(l, cfg.intermediate_size, h, s=cfg.intermediate_size ** -0.5),
        },
    }


def _mla_trig(cfg):
    from .deepseek_mla import make_mla_cos_sin
    return make_mla_cos_sin(cfg)


def mla_f32_forward(p32, cfg, ids):
    """Dense causal f32 MLA forward (the mla_preprocess pipeline with exact
    f32 GEMMs + full latent attention), ids [T] -> logits [T, V]."""
    from ..ops.mla_preprocess import rotate_half_rope

    t = ids.shape[0]
    heads = cfg.num_heads
    lkv, lrope = cfg.kv_lora_rank, cfg.qk_rope_dim
    qn = cfg.qk_nope_dim
    sm = 1.0 / ((qn + lrope) ** 0.5)
    cos, sin = _mla_trig(cfg)
    cos, sin = cos[jnp.arange(t)], sin[jnp.arange(t)]
    causal = jnp.tril(jnp.ones((t, t), bool))

    def rms(x, w=None):
        v = jnp.mean(x * x, -1, keepdims=True)
        n = x * jax.lax.rsqrt(v + cfg.rms_eps)
        return n if w is None else n * w

    x = p32["embed"][ids]
    lay = p32["layers"]
    for li in range(cfg.num_layers):
        fused = rms(x) @ lay["wdqkv"][li].T
        latent, cq = fused[:, :lkv + lrope], fused[:, lkv + lrope:]
        ctkv = rms(latent[:, :lkv])
        k_pe = rotate_half_rope(latent[:, lkv:], cos, sin)
        q_out = rms(cq) @ lay["wuq"][li].T
        q_out = q_out.reshape(t, heads, qn + lrope)
        q_nope = jnp.einsum("thd,hdk->thk", q_out[..., :qn], lay["wuk"][li])
        q_pe = rotate_half_rope(q_out[..., qn:], cos[:, None], sin[:, None])
        s = (jnp.einsum("thk,nk->thn", q_nope, ctkv)
             + jnp.einsum("thr,nr->thn", q_pe, k_pe)) * sm
        s = jnp.where(causal[:, None], s, -1e30)
        p = jax.nn.softmax(s, -1)
        att = jnp.einsum("thn,nk->thk", p, ctkv)
        att = jnp.einsum("thk,hkd->thd", att, lay["wuv"][li])
        x = x + att.reshape(t, -1) @ lay["wo"][li]
        h2 = rms(x)
        ug = h2 @ lay["w13"][li]
        f = cfg.intermediate_size
        x = x + (ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]) @ lay["w2"][li]
    return rms(x, p32["final_norm"]) @ p32["lm_head"]


def quantize_mla(p32, cfg, calib_ids):
    """f32 MLA params -> the engine's param pytree: per-output-channel int8
    weights + PER-TENSOR activation scales calibrated on `calib_ids` (the
    reference op's static asymmetric quant contract — a real checkpoint
    exporter calibrates exactly like this)."""
    from .deepseek_mla import make_mla_cos_sin

    lay = p32["layers"]
    l = cfg.num_layers

    def q_out_in(w):
        # [L, out, in]: per-out-channel scale over the `in` axis
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 127.0
        qw = jnp.clip(jnp.round(w / s[..., None]), -127, 127).astype(jnp.int8)
        return qw, s

    def q_in_out(w):
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8) / 127.0
        qw = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
        return qw, s

    # calibration: max |rms(x)| / |rms(cq)| per layer from the f32 forward
    t = calib_ids.shape[0]

    def rms(x, w=None):
        v = jnp.mean(x * x, -1, keepdims=True)
        n = x * jax.lax.rsqrt(v + cfg.rms_eps)
        return n if w is None else n * w

    from ..ops.mla_preprocess import rotate_half_rope
    cos, sin = make_mla_cos_sin(cfg)
    cos_t, sin_t = cos[jnp.arange(t)], sin[jnp.arange(t)]
    causal = jnp.tril(jnp.ones((t, t), bool))
    x = p32["embed"][calib_ids]
    a0, a1 = [], []
    lkv, lrope, qn = cfg.kv_lora_rank, cfg.qk_rope_dim, cfg.qk_nope_dim
    heads = cfg.num_heads
    sm = 1.0 / ((qn + lrope) ** 0.5)
    for li in range(l):
        h1 = rms(x)
        a0.append(jnp.max(jnp.abs(h1)))
        fused = h1 @ lay["wdqkv"][li].T
        latent, cq = fused[:, :lkv + lrope], fused[:, lkv + lrope:]
        cqn = rms(cq)
        a1.append(jnp.max(jnp.abs(cqn)))
        ctkv = rms(latent[:, :lkv])
        k_pe = rotate_half_rope(latent[:, lkv:], cos_t, sin_t)
        q_out = cqn @ lay["wuq"][li].T
        q_out = q_out.reshape(t, heads, qn + lrope)
        q_nope = jnp.einsum("thd,hdk->thk", q_out[..., :qn], lay["wuk"][li])
        q_pe = rotate_half_rope(q_out[..., qn:], cos_t[:, None], sin_t[:, None])
        s = (jnp.einsum("thk,nk->thn", q_nope, ctkv)
             + jnp.einsum("thr,nr->thn", q_pe, k_pe)) * sm
        s = jnp.where(causal[:, None], s, -1e30)
        att = jnp.einsum("thn,nk->thk", jax.nn.softmax(s, -1), ctkv)
        att = jnp.einsum("thk,hkd->thd", att, lay["wuv"][li])
        x = x + att.reshape(t, -1) @ lay["wo"][li]
        ug = rms(x) @ lay["w13"][li]
        f = cfg.intermediate_size
        x = x + (ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]) @ lay["w2"][li]

    wdq, wdq_s = q_out_in(lay["wdqkv"])
    wuq, wuq_s = q_out_in(lay["wuq"])
    wo, wo_s = q_in_out(lay["wo"])
    w13, w13_s = q_in_out(lay["w13"])
    w2, w2_s = q_in_out(lay["w2"])
    lm, lm_s = q_in_out(p32["lm_head"])
    h = cfg.hidden_size
    qscale0 = jnp.stack(a0).reshape(l, 1) / 127.0
    qscale1 = jnp.stack(a1).reshape(l, 1) / 127.0
    return {
        "embed": p32["embed"].astype(jnp.bfloat16),
        "final_norm": jnp.ones((h,), jnp.bfloat16),
        "lm_head": {"q": lm, "scale": lm_s},
        "cos": cos, "sin": sin,
        "layers": {
            # engine descale folds the static activation scale: the int8 GEMM
            # accumulates (x/qs) . (w/ws), so descale = qs * ws per channel
            "wdqkv": {"q": wdq, "descale": wdq_s * qscale0[:, :1],
                      "bias": jnp.zeros_like(wdq_s, jnp.int32)},
            "wuq": {"q": wuq, "descale": wuq_s * qscale1[:, :1],
                    "bias": jnp.zeros_like(wuq_s, jnp.int32)},
            "wuk": lay["wuk"], "wuv": lay["wuv"],
            "wo": {"q": wo, "scale": wo_s},
            "w13": {"q": w13, "scale": w13_s},
            "w2": {"q": w2, "scale": w2_s},
            "gamma0": jnp.ones((l, h), jnp.float32),
            "beta0": jnp.zeros((l, h), jnp.float32),
            "gamma1": jnp.ones((l, cfg.q_lora_rank), jnp.float32),
            "beta1": jnp.zeros((l, cfg.q_lora_rank), jnp.float32),
            "gamma2": jnp.ones((l, cfg.kv_lora_rank), jnp.float32),
            "post_norm": jnp.ones((l, h), jnp.bfloat16),
            "qscale0": qscale0, "qoffset0": jnp.zeros((l, 1), jnp.float32),
            "qscale1": qscale1, "qoffset1": jnp.zeros((l, 1), jnp.float32),
        },
    }


# ------------------------------------------------------------------ metrics


def delta_metrics(logits_ref, logits_q, targets):
    """Perplexity of both engines on `targets` + KL(ref || q) stats."""
    lr = jax.nn.log_softmax(jnp.asarray(logits_ref, jnp.float32), -1)
    lq = jax.nn.log_softmax(jnp.asarray(logits_q, jnp.float32), -1)
    t = targets.shape[0]
    nll_r = -lr[jnp.arange(t), targets].mean()
    nll_q = -lq[jnp.arange(t), targets].mean()
    kl = jnp.sum(jnp.exp(lr) * (lr - lq), -1)
    agree = jnp.mean((jnp.argmax(lr, -1) == jnp.argmax(lq, -1))
                     .astype(jnp.float32))
    return {
        "ppl_f32": float(jnp.exp(nll_r)),
        "ppl_int8": float(jnp.exp(nll_q)),
        "ppl_delta_pct": float((jnp.exp(nll_q) / jnp.exp(nll_r) - 1) * 100),
        "kl_mean": float(kl.mean()),
        "kl_max": float(kl.max()),
        "greedy_agreement": float(agree),
    }
