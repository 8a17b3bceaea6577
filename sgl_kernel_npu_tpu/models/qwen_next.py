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


def init_state(cfg: QwenNextConfig, batch: int, num_pages: int):
    ng, na = cfg.num_gdn_layers, cfg.num_attn_layers
    conv_dim = cfg.num_qk_heads * 2 * cfg.head_qk_dim + cfg.num_v_heads * cfg.head_v_dim
    return {
        "conv": jnp.zeros((ng, batch, conv_dim, cfg.conv_width - 1), jnp.float32),
        "ssm": jnp.zeros((ng, batch, cfg.num_v_heads, cfg.head_qk_dim,
                          cfg.head_v_dim), jnp.float32),
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
