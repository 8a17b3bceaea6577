"""Qwen3-Next hybrid decoder (BASELINE.json config 5: "Qwen-Next hybrid SSM:
causal_conv1d + gated-delta-rule chunk kernels with multi-LoRA BGMV/SGMV
serving").

Architecture follows the public Qwen3-Next model family the reference
accelerates (reference kernels: python/sgl_kernel_npu/sgl_kernel_npu/fla/*,
csrc "mega_chunk_gdn"; HF `Qwen3NextForCausalLM` is the semantic golden —
tests/test_qwen_loader.py checks logits parity against it):

  layer i is a full-attention block iff (i+1) % full_attention_interval == 0,
  otherwise a linear-attention (gated-delta-net) block. Every layer is
  followed by a sparse-MoE MLP (top-k routed experts + a sigmoid-gated shared
  expert).

  GDN block: fused QKVZ/BA projection split (ops.gdn.fused_qkvzba_split_...)
    -> causal_conv1d (prefill) / conv update (decode)     (ops.mamba)
    -> gating + (chunk | recurrent) gated delta rule       (ops.gdn)
    -> per-head gated RMSNorm -> output projection
  Attention block: gated q projection ([q | gate] per head), per-head-dim
    zero-centered q/k RMSNorm, partial rotary (neox), paged GQA decode,
    `out * sigmoid(gate)` before o_proj.

Norm convention: HF Qwen3NextRMSNorm weights are ZERO-CENTERED
(out = rms(x) * (1 + w)). Params here store the effective weight (1 + w);
the HF loader (models/loader.py::load_qwen_next) does the +1 at load time.
The GDN block's gated norm (RMSNormGated) is NOT zero-centered.

Multi-LoRA adapters apply to the attention output projection via ops.lora.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gdn, lora, mamba
from ..ops.attention.decode import decode_gqa
from ..ops.kvcache import reshape_and_cache_gqa
from ..ops.rope import apply_rope, make_cos_sin_cache


@dataclass(frozen=True)
class QwenNextConfig:
    vocab_size: int = 1024
    hidden_size: int = 256
    num_layers: int = 4
    full_attention_interval: int = 4   # layer i full-attn iff (i+1) % this == 0
    # GDN (linear attention) block
    num_qk_heads: int = 4
    num_v_heads: int = 8
    head_qk_dim: int = 32
    head_v_dim: int = 32
    conv_width: int = 4
    chunk_size: int = 16
    # full attention block
    num_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 32
    partial_rotary_factor: float = 0.25
    rope_theta: float = 10000.0
    page_size: int = 16
    # sparse MoE MLP (per layer)
    num_experts: int = 4
    top_k: int = 2
    norm_topk_prob: bool = True
    moe_intermediate_size: int = 128
    shared_intermediate_size: int = 128
    rms_eps: float = 1e-6
    max_position: int = 1024
    # LoRA
    num_loras: int = 2
    lora_rank: int = 8

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    def is_full_attention(self, layer: int) -> bool:
        return (layer + 1) % self.full_attention_interval == 0

    @property
    def num_gdn_layers(self) -> int:
        return sum(not self.is_full_attention(i) for i in range(self.num_layers))

    @property
    def num_attn_layers(self) -> int:
        return self.num_layers - self.num_gdn_layers


def init_params(cfg: QwenNextConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    h = cfg.hidden_size
    r = cfg.num_v_heads // cfg.num_qk_heads
    qkvz_dim = cfg.num_qk_heads * (2 * cfg.head_qk_dim + 2 * r * cfg.head_v_dim)
    ba_dim = cfg.num_qk_heads * 2 * r
    conv_dim = cfg.num_qk_heads * 2 * cfg.head_qk_dim + cfg.num_v_heads * cfg.head_v_dim

    def w(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    ng, na, nl = cfg.num_gdn_layers, cfg.num_attn_layers, cfg.num_layers
    e, f, fs = cfg.num_experts, cfg.moe_intermediate_size, cfg.shared_intermediate_size
    params = {
        "embed": w(cfg.vocab_size, h, s=0.02),
        "final_norm": jnp.ones((h,), jnp.float32),   # effective (1 + w_hf)
        "lm_head": w(h, cfg.vocab_size, s=0.02),
        "cos_sin": make_cos_sin_cache(cfg.max_position, cfg.rotary_dim,
                                      base=cfg.rope_theta),
        "gdn": {
            "in_norm": jnp.ones((ng, h), jnp.float32),
            "wqkvz": w(ng, h, qkvz_dim),
            "wba": w(ng, h, ba_dim),
            "conv_w": w(ng, conv_dim, cfg.conv_width),
            "conv_b": jnp.zeros((ng, conv_dim), jnp.float32),
            "A_log": w(ng, cfg.num_v_heads, s=0.2),
            "dt_bias": w(ng, cfg.num_v_heads, s=0.2),
            # RMSNormGated weight, tiled per v-head (HF stores [head_v_dim])
            "out_norm_w": jnp.ones((ng, cfg.num_v_heads * cfg.head_v_dim), jnp.float32),
            "wo": w(ng, cfg.num_v_heads * cfg.head_v_dim, h),
        },
        "attn": {
            "in_norm": jnp.ones((na, h), jnp.float32),
            # per head: [d query | d gate]
            "wq": w(na, h, cfg.num_heads * cfg.head_dim * 2),
            "wk": w(na, h, cfg.num_kv_heads * cfg.head_dim),
            "wv": w(na, h, cfg.num_kv_heads * cfg.head_dim),
            "wo": w(na, cfg.num_heads * cfg.head_dim, h),
            "q_norm": jnp.ones((na, cfg.head_dim), jnp.float32),  # effective
            "k_norm": jnp.ones((na, cfg.head_dim), jnp.float32),  # effective
        },
        "moe": {
            "norm": jnp.ones((nl, h), jnp.float32),
            "router": w(nl, h, e),
            "w13": w(nl, e, h, 2 * f),          # [gate | up]
            "w2": w(nl, e, f, h),
            "shared_w13": w(nl, h, 2 * fs),
            "shared_w2": w(nl, fs, h),
            "shared_gate": w(nl, h, 1),
        },
        "lora": {  # BGMV adapters on the attention output projection
            "A": w(cfg.num_loras, cfg.lora_rank, cfg.num_heads * cfg.head_dim),
            "B": w(cfg.num_loras, h, cfg.lora_rank),
        },
    }
    return params


def init_state(cfg: QwenNextConfig, batch: int, num_pages: int,
               ssm_dtype=jnp.float32):
    ng, na = cfg.num_gdn_layers, cfg.num_attn_layers
    conv_dim = cfg.num_qk_heads * 2 * cfg.head_qk_dim + cfg.num_v_heads * cfg.head_v_dim
    return {
        "conv": jnp.zeros((ng, batch, conv_dim, cfg.conv_width - 1), jnp.float32),
        # bf16 SSM state is the quantized-engine default: the recurrent update
        # computes in f32 and casts back (ops/gdn/gating.py), and the state
        # pool read+write is the dominant GDN decode traffic (~1.2 GB/step f32
        # at the r3 dims — VERDICT r4 next-2)
        "ssm": jnp.zeros((ng, batch, cfg.num_v_heads, cfg.head_qk_dim,
                          cfg.head_v_dim), ssm_dtype),
        "k_cache": jnp.zeros((na, cfg.num_kv_heads, num_pages, cfg.page_size,
                              cfg.head_dim), jnp.bfloat16),
        "v_cache": jnp.zeros((na, cfg.num_kv_heads, num_pages, cfg.page_size,
                              cfg.head_dim), jnp.bfloat16),
    }


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, -1, keepdims=True)
    return x32 * jax.lax.rsqrt(var + eps) * w


def _moe_mlp(x, p, cfg: QwenNextConfig):
    """Sparse MoE block: softmax-top-k routed experts (sort + ragged_dot
    grouped GEMM, same pattern as ops.lora) + sigmoid-gated shared expert."""
    t, h = x.shape
    e, k, f = cfg.num_experts, cfg.top_k, cfg.moe_intermediate_size
    probs = jax.nn.softmax((x @ p["router"]).astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, k)
    if cfg.norm_topk_prob:
        topw = topw / jnp.sum(topw, -1, keepdims=True)

    flat_i = topi.reshape(-1)
    order = jnp.argsort(flat_i)
    xs = jnp.repeat(x, k, axis=0)[order]
    sizes = jnp.sum(jax.nn.one_hot(flat_i, e, dtype=jnp.int32), axis=0)
    h1 = jax.lax.ragged_dot(xs, p["w13"], sizes)
    act = jax.nn.silu(h1[:, :f]) * h1[:, f:]
    out_sorted = jax.lax.ragged_dot(act, p["w2"], sizes)
    ws = topw.reshape(-1)[order]
    routed = jnp.zeros((t * k, h), out_sorted.dtype).at[order].set(
        out_sorted * ws[:, None]).reshape(t, k, h).sum(1)

    ug = x @ p["shared_w13"]
    fs = cfg.shared_intermediate_size
    shared = (jax.nn.silu(ug[:, :fs]) * ug[:, fs:]) @ p["shared_w2"]
    shared = shared * jax.nn.sigmoid(x @ p["shared_gate"])
    return routed + shared


def _gdn_project(p, cfg: QwenNextConfig, h1):
    """Shared head of the GDN block: fused QKVZ/BA projection + split."""
    qkvz = h1 @ p["wqkvz"]
    ba = h1 @ p["wba"]
    return gdn.fused_qkvzba_split_reshape_cat(
        qkvz, ba, cfg.num_qk_heads, cfg.num_v_heads,
        cfg.head_qk_dim, cfg.head_v_dim)


def _attn_qkv(p, cfg: QwenNextConfig, h1, positions):
    """Gated q projection + per-head-dim q/k norms + partial rotary.

    h1 [T, H]; returns (q [T, nq, d], gate [T, nq*d], k [T, nkv, d], v)."""
    t = h1.shape[0]
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qg = (h1 @ p["wq"]).reshape(t, nq, 2 * d)
    q, gate = qg[..., :d], qg[..., d:].reshape(t, nq * d)
    k = (h1 @ p["wk"]).reshape(t, nkv, d)
    v = (h1 @ p["wv"]).reshape(t, nkv, d)
    q = _rms(q, p["q_norm"], cfg.rms_eps)
    k = _rms(k, p["k_norm"], cfg.rms_eps)
    rd = cfg.rotary_dim
    return q, gate, k, v, rd


def _apply_partial_rope(q, k, cos, sin, rd):
    q_rot = apply_rope(q[..., :rd], cos, sin)
    k_rot = apply_rope(k[..., :rd], cos, sin)
    q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
    k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
    return q, k


def decode_step(params, cfg: QwenNextConfig, state, input_ids, positions,
                seq_lens, block_table, slot_mapping, lora_indices=None):
    """Single-token decode across the hybrid stack. Returns (logits, state)."""
    b = input_ids.shape[0]
    hqk, hv = cfg.num_qk_heads, cfg.num_v_heads
    dqk, dv = cfg.head_qk_dim, cfg.head_v_dim
    x = params["embed"][input_ids]

    new_conv, new_ssm, new_kc, new_vc = [], [], [], []
    gi = ai = 0
    for li in range(cfg.num_layers):
        if not cfg.is_full_attention(li):  # GDN block
            p = jax.tree.map(lambda a: a[gi], params["gdn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps)
            mixed_qkv, z, bb, aa = _gdn_project(p, cfg, h1)
            qkv, conv = mamba.causal_conv1d_update(
                mixed_qkv, state["conv"][gi],
                p["conv_w"], p["conv_b"], activation="silu")
            q = qkv[:, : hqk * dqk].reshape(b, 1, hqk, dqk)
            k = qkv[:, hqk * dqk:2 * hqk * dqk].reshape(b, 1, hqk, dqk)
            v = qkv[:, 2 * hqk * dqk:].reshape(b, 1, hv, dv)
            o, ssm = gdn.fused_sigmoid_gating_delta_rule_update(
                p["A_log"], aa[:, None], p["dt_bias"], 1.0, 20.0,
                q, k, v, bb[:, None], state["ssm"][gi], jnp.arange(b),
                use_qk_l2norm_in_kernel=True)
            o = gdn.layernorm_gated(
                o.reshape(b, hv * dv), p["out_norm_w"], None,
                z.reshape(b, hv * dv), cfg.rms_eps, group_size=dv,
                is_rms_norm=True)
            x = x + o @ p["wo"]
            new_conv.append(conv)
            new_ssm.append(ssm)
            gi += 1
        else:  # full attention block
            p = jax.tree.map(lambda a: a[ai], params["attn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps)
            q, gate, k, v, rd = _attn_qkv(p, cfg, h1, positions)
            cs = params["cos_sin"][positions]
            cos, sin = cs[:, None, : rd // 2], cs[:, None, rd // 2:]
            q, k = _apply_partial_rope(q, k, cos, sin, rd)
            kc, vc = reshape_and_cache_gqa(
                k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                state["k_cache"][ai], state["v_cache"][ai], slot_mapping)
            att = decode_gqa(q.astype(jnp.bfloat16), kc, vc, seq_lens,
                             block_table, 1.0 / cfg.head_dim ** 0.5,
                             cfg.page_size)
            att = att.reshape(b, -1).astype(jnp.float32)
            att = att * jax.nn.sigmoid(gate)
            o = att @ p["wo"]
            if lora_indices is not None:
                shr = lora.bgmv_shrink(att, params["lora"]["A"], lora_indices)
                o = lora.bgmv_expand(shr, params["lora"]["B"], lora_indices,
                                     o, 0, cfg.hidden_size)
            x = x + o
            new_kc.append(kc)
            new_vc.append(vc)
            ai += 1

        mp_ = jax.tree.map(lambda a: a[li], params["moe"])
        h2 = _rms(x, mp_["norm"], cfg.rms_eps)
        x = x + _moe_mlp(h2, mp_, cfg)

    x = _rms(x, params["final_norm"], cfg.rms_eps)
    logits = x @ params["lm_head"]
    state = {
        "conv": (jnp.stack(new_conv) if new_conv else state["conv"]),
        "ssm": (jnp.stack(new_ssm) if new_ssm else state["ssm"]),
        "k_cache": (jnp.stack(new_kc) if new_kc else state["k_cache"]),
        "v_cache": (jnp.stack(new_vc) if new_vc else state["v_cache"]),
    }
    return logits, state


def forward_full(params, cfg: QwenNextConfig, input_ids):
    """Dense full-sequence forward (no paging): input_ids [B, T] -> logits
    [B, T, V]. Golden/parity path — the chunked GDN pipeline + dense causal
    attention, numerically matching HF `Qwen3NextForCausalLM` (fp32)."""
    b, t = input_ids.shape
    hqk, hv = cfg.num_qk_heads, cfg.num_v_heads
    dqk, dv = cfg.head_qk_dim, cfg.head_v_dim
    r = hv // hqk
    x = params["embed"][input_ids]          # [B, T, H]
    positions = jnp.arange(t)

    gi = ai = 0
    for li in range(cfg.num_layers):
        if not cfg.is_full_attention(li):
            p = jax.tree.map(lambda a: a[gi], params["gdn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps)
            flat = h1.reshape(b * t, -1)
            mixed_qkv, z, bb, aa = _gdn_project(p, cfg, flat)
            conv_in = mixed_qkv.reshape(b, t, -1).transpose(0, 2, 1)
            conv_out, _ = mamba.causal_conv1d_fn(
                conv_in, p["conv_w"], p["conv_b"], activation="silu")
            qkv = conv_out.transpose(0, 2, 1)
            q = qkv[..., : hqk * dqk].reshape(b, t, hqk, dqk)
            k = qkv[..., hqk * dqk:2 * hqk * dqk].reshape(b, t, hqk, dqk)
            v = qkv[..., 2 * hqk * dqk:].reshape(b, t, hv, dv)
            g, beta = gdn.fused_gdn_gating(
                p["A_log"], aa.reshape(b * t, hv), bb.reshape(b * t, hv),
                p["dt_bias"])
            g = g.reshape(b, t, hv)
            beta = beta.reshape(b, t, hv)
            q = jnp.repeat(q, r, axis=2)
            k = jnp.repeat(k, r, axis=2)
            o, _ = gdn.chunk_gated_delta_rule(
                q, k, v, g, beta, chunk_size=cfg.chunk_size,
                output_final_state=False, use_qk_l2norm_in_kernel=True)
            o = gdn.layernorm_gated(
                o.reshape(b * t, hv * dv), p["out_norm_w"], None,
                z.reshape(b * t, hv * dv), cfg.rms_eps, group_size=dv,
                is_rms_norm=True)
            x = x + (o @ p["wo"]).reshape(b, t, -1)
            gi += 1
        else:
            p = jax.tree.map(lambda a: a[ai], params["attn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps)
            nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            flat = h1.reshape(b * t, -1)
            q, gate, k, v, rd = _attn_qkv(p, cfg, flat, positions)
            q = q.reshape(b, t, nq, d)
            k = k.reshape(b, t, nkv, d)
            v = v.reshape(b, t, nkv, d)
            cs = params["cos_sin"][positions]
            cos = cs[None, :, None, : rd // 2]
            sin = cs[None, :, None, rd // 2:]
            q, k = _apply_partial_rope(q, k, cos, sin, rd)
            k = jnp.repeat(k, nq // nkv, axis=2)
            v = jnp.repeat(v, nq // nkv, axis=2)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) / d ** 0.5
            mask = jnp.tril(jnp.ones((t, t), bool))
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
            att = jnp.einsum("bhij,bjhd->bihd",
                             jax.nn.softmax(scores.astype(jnp.float32), -1), v)
            att = att.reshape(b, t, nq * d)
            att = att * jax.nn.sigmoid(gate.reshape(b, t, nq * d))
            x = x + att @ p["wo"]
            ai += 1

        mp_ = jax.tree.map(lambda a: a[li], params["moe"])
        h2 = _rms(x, mp_["norm"], cfg.rms_eps)
        x = x + _moe_mlp(h2.reshape(b * t, -1), mp_, cfg).reshape(b, t, -1)

    x = _rms(x, params["final_norm"], cfg.rms_eps)
    return x @ params["lm_head"]


# --------------------------------------------------------------------------
# W8A8 quantized engine (VERDICT r4 next-2: "quantize Qwen-Next end-to-end")
#
# The f32 paths above stay as the HF-parity goldens; the quantized engine
# mirrors the Llama W8A8 design: per-output-channel int8 weights in pre-tiled
# contiguous-DMA banks indexed in-kernel (quant_matmul_int8_stacked /
# grouped_matmul_int8_pallas with a static layer id riding the scalar-prefetch
# map — no XLA weight slices feed the kernels), per-token dynamic activation
# quant, experts through the megablox-style aligned grouped GEMM
# (the reference's W8A8 MoE core, fused_deep_moe.h GMM + swiglu_quant.py).
# --------------------------------------------------------------------------


def _quant_cols_np(rng, shape, s=0.05):
    """Direct int8 init in the FINAL bank layout (numpy host-side): at the r3
    dims the f32 expert set alone is ~19 GB — it can never exist on the chip,
    so the bench initializes quantized banks directly (real deployments
    quantize at load time via quantize_qwen_weights)."""
    q = jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))
    scale = jnp.full(shape[-1:], s / 127.0, jnp.float32)
    return q, scale


def _quantize_w(w):
    """f32 [..., K, N] -> per-output-channel symmetric int8 + scale [..., N]."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    return q, s


def _pretile(w_q, bn):
    """[L, K, N] -> [L, NB, K, bn'] (ops/matmul.py::pretile_weight_bank),
    with bn' the largest 128-stepped divisor of N at most bn (whole-N panel
    when none divides — small/odd banks)."""
    from ..ops.matmul import pretile_weight_bank
    n = w_q.shape[-1]
    cands = [c for c in range(min(bn, n), 0, -128) if n % c == 0]
    return pretile_weight_bank(w_q, cands[0] if cands else n)


def quantize_qwen_weights(params, cfg: QwenNextConfig, block_n: int = 512):
    """Quantize a loaded f32 param set into the fast W8A8 bank layout
    (params["fast"]), FREEING each f32 original as its int8 copy lands (the
    llama pretile_big_weights swap — holding both would OOM at real dims).
    The f32 router/conv/norm/gating/lora params stay. Returns params."""
    bn = block_n
    fast = {}

    def swap(tree, key, build):
        w = tree[key]
        q, s = build(w)
        jax.block_until_ready(q)
        if isinstance(w, jax.Array):
            w.delete()
        tree[key] = None
        return {"q": q, "scale": s}

    def bank(w):
        q, s = _quantize_w(w)
        return _pretile(q, bn), s

    g, a, m = params["gdn"], params["attn"], params["moe"]
    fast["gdn_wqkvz"] = swap(g, "wqkvz", bank)
    fast["gdn_wo"] = swap(g, "wo", bank)
    fast["attn_wq"] = swap(a, "wq", bank)
    fast["attn_wk"] = swap(a, "wk", bank)
    fast["attn_wv"] = swap(a, "wv", bank)
    fast["attn_wo"] = swap(a, "wo", bank)
    fast["shared_w13"] = swap(m, "shared_w13", bank)
    fast["shared_w2"] = swap(m, "shared_w2", bank)

    def expert_bank(w):
        # [nl, e, K, N] -> flat [nl*e, ...] so the grouped kernel selects
        # (layer, expert) purely through its eid map (eid + li*e) — the
        # whole-bank operand never gets sliced by XLA
        nl, e = w.shape[:2]
        q, s = _quantize_w(w.reshape((nl * e,) + w.shape[2:]))
        return _pretile(q, bn), s

    fast["experts_w13"] = swap(m, "w13", expert_bank)
    fast["experts_w2"] = swap(m, "w2", expert_bank)
    fast["lm_head"] = swap(params, "lm_head",
                           lambda w: bank(w[None]))
    params["fast"] = fast
    return params


def init_params_q(cfg: QwenNextConfig, seed: int = 0):
    """Random-weight init straight into the quantized fast layout (bench /
    smoke path; see _quant_cols_np for why f32-then-quantize is impossible at
    the r3 dims)."""
    rng = np.random.default_rng(seed)
    h = cfg.hidden_size
    r = cfg.num_v_heads // cfg.num_qk_heads
    qkvz_dim = cfg.num_qk_heads * (2 * cfg.head_qk_dim + 2 * r * cfg.head_v_dim)
    ba_dim = cfg.num_qk_heads * 2 * r
    conv_dim = cfg.num_qk_heads * 2 * cfg.head_qk_dim + cfg.num_v_heads * cfg.head_v_dim
    ng, na, nl = cfg.num_gdn_layers, cfg.num_attn_layers, cfg.num_layers
    e, f, fs = cfg.num_experts, cfg.moe_intermediate_size, cfg.shared_intermediate_size
    bn = 512

    def w(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    def bank_np(l, k, n, s=0.05, bn_max=None):
        cands = [c for c in range(min(bn_max or bn, n), 0, -128) if n % c == 0]
        bn_i = cands[0] if cands else n
        q = jnp.asarray(rng.integers(-127, 128, (l, n // bn_i, k, bn_i),
                                     dtype=np.int8))
        return {"q": q, "scale": jnp.full((l, n), s / 127.0, jnp.float32)}

    params = {
        "embed": jnp.asarray(rng.standard_normal((cfg.vocab_size, h)) * 0.02,
                             jnp.bfloat16),
        "final_norm": jnp.ones((h,), jnp.float32),
        "cos_sin": make_cos_sin_cache(cfg.max_position, cfg.rotary_dim,
                                      base=cfg.rope_theta),
        "gdn": {
            "in_norm": jnp.ones((ng, h), jnp.float32),
            "wba": w(ng, h, ba_dim),
            "conv_w": w(ng, conv_dim, cfg.conv_width),
            "conv_b": jnp.zeros((ng, conv_dim), jnp.float32),
            "A_log": w(ng, cfg.num_v_heads, s=0.2),
            "dt_bias": w(ng, cfg.num_v_heads, s=0.2),
            "out_norm_w": jnp.ones((ng, cfg.num_v_heads * cfg.head_v_dim),
                                   jnp.float32),
        },
        "attn": {
            "in_norm": jnp.ones((na, h), jnp.float32),
            "q_norm": jnp.ones((na, cfg.head_dim), jnp.float32),
            "k_norm": jnp.ones((na, cfg.head_dim), jnp.float32),
        },
        "moe": {
            "norm": jnp.ones((nl, h), jnp.float32),
            "router": w(nl, h, e),
            "shared_gate": w(nl, h, 1),
        },
        "lora": {
            "A": w(max(cfg.num_loras, 1), cfg.lora_rank,
                   cfg.num_heads * cfg.head_dim),
            "B": w(max(cfg.num_loras, 1), h, cfg.lora_rank),
        },
        "fast": {
            "gdn_wqkvz": bank_np(ng, h, qkvz_dim),
            "gdn_wo": bank_np(ng, cfg.num_v_heads * cfg.head_v_dim, h),
            "attn_wq": bank_np(na, h, cfg.num_heads * cfg.head_dim * 2),
            "attn_wk": bank_np(na, h, cfg.num_kv_heads * cfg.head_dim),
            "attn_wv": bank_np(na, h, cfg.num_kv_heads * cfg.head_dim),
            "attn_wo": bank_np(na, cfg.num_heads * cfg.head_dim, h),
            "shared_w13": bank_np(nl, h, 2 * fs),
            "shared_w2": bank_np(nl, fs, h),
            # 1024-wide expert panels: halves the grouped-GMM grid steps
            # (per-iteration overhead was ~half the GMM time, trace
            # 2026-08-21)
            "experts_w13": bank_np(nl * e, h, 2 * f, bn_max=1024),
            "experts_w2": bank_np(nl * e, f, h, bn_max=1024),
            "lm_head": bank_np(1, h, cfg.vocab_size, s=0.02),
        },
    }
    return params


def _qmm_st(x, bank, li):
    """Per-token INT8 quant + stacked tiled W8A8 GEMM at (static) layer li."""
    from ..ops.matmul import quant_matmul_int8_stacked
    from ..ops.quant import per_token_quant_int8

    xq, xs = per_token_quant_int8(x)
    return quant_matmul_int8_stacked(xq, bank["q"], jnp.int32(li), xs,
                                     bank["scale"], out_dtype=x.dtype)


def _moe_mlp_q(x, params, cfg: QwenNextConfig, li: int):
    """Quantized sparse-MoE block: router (f32) -> aligned expert compaction
    -> grouped W8A8 GMM1 -> SwiGLU -> requant -> GMM2 -> weighted scatter,
    plus the int8 shared expert. The (layer, expert) pair selects weights
    through the grouped kernel's eid map (eid + li*e) — the flat
    [nl*e, NB, K, bn] bank is never sliced.

    Ref: the GMM-SwiGLU-GMM core of aclnnFusedDeepMoe
    (csrc/deepep/ops/op_kernel/fused_deep_moe.h:59-95) + swiglu_quant.py."""
    from ..ops.matmul import (grouped_matmul_int8_pallas,
                              grouped_matmul_int8_ref, untile_weight_bank)
    from ..ops.quant import per_token_quant_int8
    from ..utils import use_pallas

    fast = params["fast"]
    t, h = x.shape
    e, k, f = cfg.num_experts, cfg.top_k, cfg.moe_intermediate_size
    router = params["moe"]["router"][li]
    probs = jax.nn.softmax((x.astype(jnp.float32) @ router), axis=-1)
    topw, topi = jax.lax.top_k(probs, k)
    if cfg.norm_topk_prob:
        topw = topw / jnp.sum(topw, -1, keepdims=True)

    flat_i = topi.reshape(-1)
    order = jnp.argsort(flat_i)
    group_list = jnp.sum(jax.nn.one_hot(flat_i, e, dtype=jnp.int32), axis=0)
    xq, xs = per_token_quant_int8(x)

    cap = t * k
    if use_pallas():
        # m-tile 32: int8's native (32, 128) tile, and the padded row count
        # drops ~3.3x vs tile=128 (every [cap_pad, *] elementwise pass pays
        # the padding inflation — qwen trace 2026-08-21)
        tile = int(os.environ.get("SKT_QWEN_TILE", "32"))
        tight_off = jnp.cumsum(group_list) - group_list
        al_sizes = ((group_list + tile - 1) // tile) * tile
        incl = jnp.cumsum(al_sizes)
        al_off = incl - al_sizes
        cap_pad = ((cap + tile - 1) // tile + e) * tile        # static
        j = jnp.arange(cap_pad, dtype=jnp.int32)
        # compare-sum instead of jnp.searchsorted: the searchsorted lowering
        # ran at ~1 ms per s32[17664] call on the v5e (18.9 ms/step total,
        # trace 2026-08-21); #(incl <= j) is a [cap_pad, e] VPU pass
        eix = jnp.clip(jnp.sum((incl[None, :] <= j[:, None]).astype(jnp.int32),
                               axis=1), 0, e - 1)
        idx = j - al_off[eix]
        ok = idx < group_list[eix]
        pos = jnp.clip(tight_off[eix] + idx, 0, cap - 1)
        src = order[pos]                                       # flat slot
        tok = src // k
        xg = jnp.where(ok[:, None], xq[tok], 0)
        xsg = jnp.where(ok[:, None], xs[tok], 0.0)
        jt = jnp.arange(cap_pad // tile, dtype=jnp.int32) * tile
        eid = jnp.clip(jnp.sum((incl[None, :] <= jt[:, None]).astype(
            jnp.int32), axis=1), 0, e - 1) + li * e
        ug = grouped_matmul_int8_pallas(
            xg, fast["experts_w13"]["q"], xsg,
            fast["experts_w13"]["scale"], eid, block_m=tile, block_k=1024)
        g32 = ug.astype(jnp.float32)
        act = g32[:, :f] * jax.nn.sigmoid(g32[:, :f]) * g32[:, f:]
        actq, acts = per_token_quant_int8(act)
        acts = jnp.where(ok[:, None], acts, 0.0)
        y = grouped_matmul_int8_pallas(
            actq, fast["experts_w2"]["q"], acts,
            fast["experts_w2"]["scale"], eid, block_m=tile, block_k=1024)
        # inverse-gather combine: scatter only ROW INDICES (tiny s32), then
        # gather the value rows — the [cap+1, H] f32 row scatter this
        # replaces cost 7.5 ms/step (XLA row-scatter serialization)
        flat_idx = jnp.where(ok, src, cap)
        inv = jnp.zeros((cap + 1,), jnp.int32).at[flat_idx].set(
            j, mode="drop")[:cap]
        rows = y[inv].astype(jnp.float32)                      # [cap, H]
        routed = (rows * topw.reshape(-1)[:, None]).reshape(t, k, h).sum(1)
    else:
        # reference tier: tight sort + ragged grouped GEMM on the un-tiled
        # per-layer expert slice (tests / CPU)
        tok_sorted = order // k
        xg = xq[tok_sorted]
        xsg = xs[tok_sorted]
        w13 = untile_weight_bank(fast["experts_w13"]["q"][li * e:(li + 1) * e])
        w13s = fast["experts_w13"]["scale"][li * e:(li + 1) * e]
        w2 = untile_weight_bank(fast["experts_w2"]["q"][li * e:(li + 1) * e])
        w2s = fast["experts_w2"]["scale"][li * e:(li + 1) * e]
        ug = grouped_matmul_int8_ref(xg, w13, xsg, w13s, group_list)
        g32 = ug.astype(jnp.float32)
        act = g32[:, :f] * jax.nn.sigmoid(g32[:, :f]) * g32[:, f:]
        actq, acts = per_token_quant_int8(act)
        y = grouped_matmul_int8_ref(actq, w2, acts, w2s, group_list)
        ws = topw.reshape(-1)[order]
        routed = jnp.zeros((cap, h), jnp.float32).at[order].set(
            y.astype(jnp.float32) * ws[:, None]).reshape(t, k, h).sum(1)

    fs = cfg.shared_intermediate_size
    ug_s = _qmm_st(x, fast["shared_w13"], li).astype(jnp.float32)
    act_s = (ug_s[:, :fs] * jax.nn.sigmoid(ug_s[:, :fs])
             * ug_s[:, fs:]).astype(x.dtype)
    shared = _qmm_st(act_s, fast["shared_w2"], li).astype(jnp.float32)
    shared = shared * jax.nn.sigmoid(
        x.astype(jnp.float32) @ params["moe"]["shared_gate"][li])
    return (routed + shared).astype(x.dtype)


def decode_step_q(params, cfg: QwenNextConfig, state, input_ids, positions,
                  seq_lens, block_table, slot_mapping, lora_indices=None):
    """Quantized hybrid decode step (params from init_params_q or
    quantize_qwen_weights). Same contract as decode_step."""
    b = input_ids.shape[0]
    hqk, hv = cfg.num_qk_heads, cfg.num_v_heads
    dqk, dv = cfg.head_qk_dim, cfg.head_v_dim
    fast = params["fast"]
    x = params["embed"][input_ids].astype(jnp.bfloat16)

    # ONE flat SSM pool threads through all GDN layers (rows gi*B..gi*B+B-1)
    # so the Pallas recurrent step updates it in place via aliasing — the
    # per-layer slice+stack of the f32 path would copy the whole pool per
    # layer
    ng = cfg.num_gdn_layers
    ssm_shape = state["ssm"].shape
    ssm_pool = state["ssm"].reshape((ssm_shape[0] * ssm_shape[1],)
                                    + ssm_shape[2:])
    new_conv, new_kc, new_vc = [], [], []
    gi = ai = 0
    for li in range(cfg.num_layers):
        if not cfg.is_full_attention(li):  # GDN block
            p = jax.tree.map(lambda a: a[gi], params["gdn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps).astype(jnp.bfloat16)
            qkvz = _qmm_st(h1, fast["gdn_wqkvz"], gi)
            ba = h1.astype(jnp.float32) @ p["wba"]
            mixed_qkv, z, bb, aa = gdn.fused_qkvzba_split_reshape_cat(
                qkvz.astype(jnp.float32), ba, hqk, hv, dqk, dv)
            qkv, conv = mamba.causal_conv1d_update(
                mixed_qkv, state["conv"][gi],
                p["conv_w"], p["conv_b"], activation="silu")
            q = qkv[:, : hqk * dqk].reshape(b, 1, hqk, dqk)
            k = qkv[:, hqk * dqk:2 * hqk * dqk].reshape(b, 1, hqk, dqk)
            v = qkv[:, 2 * hqk * dqk:].reshape(b, 1, hv, dv)
            from ..utils import use_pallas
            gdn_step = (gdn.fused_sigmoid_gating_delta_rule_update_pallas
                        if use_pallas() and b >= 2
                        else gdn.fused_sigmoid_gating_delta_rule_update)
            o, ssm_pool = gdn_step(
                p["A_log"], aa[:, None], p["dt_bias"], 1.0, 20.0,
                q, k, v, bb[:, None], ssm_pool,
                gi * b + jnp.arange(b, dtype=jnp.int32),
                use_qk_l2norm_in_kernel=True)
            o = gdn.layernorm_gated(
                o.reshape(b, hv * dv), p["out_norm_w"], None,
                z.reshape(b, hv * dv), cfg.rms_eps, group_size=dv,
                is_rms_norm=True)
            x = x + _qmm_st(o.astype(jnp.bfloat16), fast["gdn_wo"], gi)
            new_conv.append(conv)
            gi += 1
        else:  # full attention block
            p = jax.tree.map(lambda a: a[ai], params["attn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps).astype(jnp.bfloat16)
            nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            qg = _qmm_st(h1, fast["attn_wq"], ai).reshape(b, nq, 2 * d)
            q, gate = qg[..., :d], qg[..., d:].reshape(b, nq * d)
            k = _qmm_st(h1, fast["attn_wk"], ai).reshape(b, nkv, d)
            v = _qmm_st(h1, fast["attn_wv"], ai).reshape(b, nkv, d)
            q = _rms(q, p["q_norm"], cfg.rms_eps)
            k = _rms(k, p["k_norm"], cfg.rms_eps)
            rd = cfg.rotary_dim
            cs = params["cos_sin"][positions]
            cos, sin = cs[:, None, : rd // 2], cs[:, None, rd // 2:]
            q, k = _apply_partial_rope(q, k, cos, sin, rd)
            kc, vc = reshape_and_cache_gqa(
                k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                state["k_cache"][ai], state["v_cache"][ai], slot_mapping)
            att = decode_gqa(q.astype(jnp.bfloat16), kc, vc, seq_lens,
                             block_table, 1.0 / cfg.head_dim ** 0.5,
                             cfg.page_size)
            att = att.reshape(b, -1).astype(jnp.float32)
            att = (att * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(
                jnp.bfloat16)
            o = _qmm_st(att, fast["attn_wo"], ai)
            if lora_indices is not None:
                shr = lora.bgmv_shrink(att.astype(jnp.float32),
                                       params["lora"]["A"], lora_indices)
                o = lora.bgmv_expand(shr, params["lora"]["B"], lora_indices,
                                     o.astype(jnp.float32), 0,
                                     cfg.hidden_size).astype(jnp.bfloat16)
            x = x + o
            new_kc.append(kc)
            new_vc.append(vc)
            ai += 1

        h2 = _rms(x, params["moe"]["norm"][li], cfg.rms_eps).astype(
            jnp.bfloat16)
        x = x + _moe_mlp_q(h2, params, cfg, li)

    x = _rms(x, params["final_norm"], cfg.rms_eps).astype(jnp.bfloat16)
    logits = _qmm_st(x, fast["lm_head"], 0).astype(jnp.float32)
    state = {
        "conv": (jnp.stack(new_conv) if new_conv else state["conv"]),
        "ssm": ssm_pool.reshape(ssm_shape),
        "k_cache": (jnp.stack(new_kc) if new_kc else state["k_cache"]),
        "v_cache": (jnp.stack(new_vc) if new_vc else state["v_cache"]),
    }
    return logits, state


def prefill_gdn_layer(params, cfg: QwenNextConfig, x_seq, gi: int = 0):
    """Prefill path of one GDN block over [B, T, H] — exercises the chunked
    pipeline (causal_conv1d_fn + chunk_gated_delta_rule)."""
    b, t, h = x_seq.shape
    r = cfg.num_v_heads // cfg.num_qk_heads
    hqk, hv, dqk, dv = cfg.num_qk_heads, cfg.num_v_heads, cfg.head_qk_dim, cfg.head_v_dim
    p = jax.tree.map(lambda a: a[gi], params["gdn"])

    h1 = _rms(x_seq, p["in_norm"], cfg.rms_eps)
    flat = h1.reshape(b * t, h)
    mixed_qkv, z, bb, aa = _gdn_project(p, cfg, flat)

    conv_in = mixed_qkv.reshape(b, t, -1).transpose(0, 2, 1)  # [B, dim, T]
    conv_out, _ = mamba.causal_conv1d_fn(conv_in, p["conv_w"], p["conv_b"],
                                         activation="silu")
    qkv = conv_out.transpose(0, 2, 1)                          # [B, T, dim]
    q = qkv[..., : hqk * dqk].reshape(b, t, hqk, dqk)
    k = qkv[..., hqk * dqk:2 * hqk * dqk].reshape(b, t, hqk, dqk)
    v = qkv[..., 2 * hqk * dqk:].reshape(b, t, hv, dv)

    g, beta = gdn.fused_gdn_gating(p["A_log"], aa.reshape(b * t, hv),
                                   bb.reshape(b * t, hv), p["dt_bias"])
    g = g.reshape(b, t, hv)
    beta = beta.reshape(b, t, hv)
    q = jnp.repeat(q, r, axis=2)
    k = jnp.repeat(k, r, axis=2)
    o, final_state = gdn.chunk_gated_delta_rule(
        q, k, v, g, beta, chunk_size=cfg.chunk_size, output_final_state=True,
        use_qk_l2norm_in_kernel=True)
    o = gdn.layernorm_gated(
        o.reshape(b * t, hv * dv), p["out_norm_w"], None,
        z.reshape(b * t, hv * dv), cfg.rms_eps, group_size=dv, is_rms_norm=True)
    return (x_seq + (o @ p["wo"]).reshape(b, t, h)), final_state
