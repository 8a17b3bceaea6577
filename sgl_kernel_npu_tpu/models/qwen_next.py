"""Qwen-Next-class hybrid SSM decoder (BASELINE.json config 5: "Qwen-Next
hybrid SSM: causal_conv1d + gated-delta-rule chunk kernels with multi-LoRA
BGMV/SGMV serving").

Layer pattern: alternating linear-attention (GDN) blocks and full-attention
blocks. The GDN block is the Qwen3-Next pipeline the reference accelerates:
  fused QKVZ/BA projection split (ops.gdn.fused_qkvzba_split_reshape_cat)
  -> causal_conv1d (prefill) / conv update (decode)   (ops.mamba)
  -> fused_gdn_gating -> chunk_gated_delta_rule (prefill)
     / fused_sigmoid_gating_delta_rule_update (decode) (ops.gdn)
  -> layernorm_gated -> output projection
Multi-LoRA adapters apply to the projections via ops.lora BGMV.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

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
    num_layers: int = 4            # alternating [gdn, attn, gdn, attn]
    # GDN block
    num_qk_heads: int = 4
    num_v_heads: int = 8
    head_qk_dim: int = 32
    head_v_dim: int = 32
    conv_width: int = 4
    chunk_size: int = 16
    # attention block
    num_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 32
    page_size: int = 16
    intermediate_size: int = 512
    rms_eps: float = 1e-6
    max_position: int = 1024
    # LoRA
    num_loras: int = 2
    lora_rank: int = 8


def init_params(cfg: QwenNextConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    h = cfg.hidden_size
    r = cfg.num_v_heads // cfg.num_qk_heads
    qkvz_dim = cfg.num_qk_heads * (2 * cfg.head_qk_dim + 2 * r * cfg.head_v_dim)
    ba_dim = cfg.num_qk_heads * 2 * r
    conv_dim = cfg.num_qk_heads * 2 * cfg.head_qk_dim + cfg.num_v_heads * cfg.head_v_dim

    def w(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    n_gdn = (cfg.num_layers + 1) // 2
    n_att = cfg.num_layers // 2
    params = {
        "embed": w(cfg.vocab_size, h, s=0.02),
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": w(h, cfg.vocab_size, s=0.02),
        "cos_sin": make_cos_sin_cache(cfg.max_position, cfg.head_dim),
        "gdn": {
            "in_norm": jnp.ones((n_gdn, h), jnp.float32),
            "wqkvz": w(n_gdn, h, qkvz_dim),
            "wba": w(n_gdn, h, ba_dim),
            "conv_w": w(n_gdn, conv_dim, cfg.conv_width),
            "conv_b": jnp.zeros((n_gdn, conv_dim), jnp.float32),
            "A_log": w(n_gdn, cfg.num_v_heads, s=0.2),
            "dt_bias": w(n_gdn, cfg.num_v_heads, s=0.2),
            "out_norm_w": jnp.ones((n_gdn, cfg.num_v_heads * cfg.head_v_dim), jnp.float32),
            "wo": w(n_gdn, cfg.num_v_heads * cfg.head_v_dim, h),
        },
        "attn": {
            "in_norm": jnp.ones((n_att, h), jnp.float32),
            "wqkv": w(n_att, h, (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim),
            "wo": w(n_att, cfg.num_heads * cfg.head_dim, h),
        },
        "mlp": {
            "norm": jnp.ones((cfg.num_layers, h), jnp.float32),
            "w13": w(cfg.num_layers, h, 2 * cfg.intermediate_size),
            "w2": w(cfg.num_layers, cfg.intermediate_size, h),
        },
        "lora": {  # BGMV adapters on the attention output projection
            "A": w(cfg.num_loras, cfg.lora_rank, cfg.num_heads * cfg.head_dim),
            "B": w(cfg.num_loras, h, cfg.lora_rank),
        },
    }
    return params


def init_state(cfg: QwenNextConfig, batch: int, num_pages: int):
    n_gdn = (cfg.num_layers + 1) // 2
    n_att = cfg.num_layers // 2
    conv_dim = cfg.num_qk_heads * 2 * cfg.head_qk_dim + cfg.num_v_heads * cfg.head_v_dim
    return {
        "conv": jnp.zeros((n_gdn, batch, conv_dim, cfg.conv_width - 1), jnp.float32),
        "ssm": jnp.zeros((n_gdn, batch, cfg.num_v_heads, cfg.head_qk_dim,
                          cfg.head_v_dim), jnp.float32),
        "k_cache": jnp.zeros((n_att, cfg.num_kv_heads, num_pages, cfg.page_size,
                              cfg.head_dim), jnp.bfloat16),
        "v_cache": jnp.zeros((n_att, cfg.num_kv_heads, num_pages, cfg.page_size,
                              cfg.head_dim), jnp.bfloat16),
    }


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, -1, keepdims=True)
    return x32 * jax.lax.rsqrt(var + eps) * w


def _mlp(x, w13, w2, f):
    ug = x @ w13
    act = ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]
    return act @ w2


def decode_step(params, cfg: QwenNextConfig, state, input_ids, positions,
                seq_lens, block_table, slot_mapping, lora_indices=None):
    """Single-token decode across the hybrid stack. Returns (logits, state)."""
    b = input_ids.shape[0]
    r = cfg.num_v_heads // cfg.num_qk_heads
    hqk, hv = cfg.num_qk_heads, cfg.num_v_heads
    dqk, dv = cfg.head_qk_dim, cfg.head_v_dim
    x = params["embed"][input_ids]

    new_conv, new_ssm, new_kc, new_vc = [], [], [], []
    gi = ai = 0
    for li in range(cfg.num_layers):
        if li % 2 == 0:  # GDN block
            p = jax.tree.map(lambda a: a[gi], params["gdn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps)
            qkvz = h1 @ p["wqkvz"]
            ba = h1 @ p["wba"]
            mixed_qkv, z, bb, aa = gdn.fused_qkvzba_split_reshape_cat(
                qkvz, ba, hqk, hv, dqk, dv)
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
        else:  # attention block
            p = jax.tree.map(lambda a: a[ai], params["attn"])
            h1 = _rms(x, p["in_norm"], cfg.rms_eps)
            qkv = h1 @ p["wqkv"]
            nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            q = qkv[:, : nq * d].reshape(b, nq, d)
            k = qkv[:, nq * d:(nq + nkv) * d].reshape(b, nkv, d)
            v = qkv[:, (nq + nkv) * d:].reshape(b, nkv, d)
            cs = params["cos_sin"][positions]
            cos, sin = cs[:, : d // 2], cs[:, d // 2:]
            q = apply_rope(q, cos[:, None], sin[:, None])
            k = apply_rope(k, cos[:, None], sin[:, None])
            kc, vc = reshape_and_cache_gqa(
                k.astype(jnp.bfloat16)[:, :, :], v.astype(jnp.bfloat16),
                state["k_cache"][ai], state["v_cache"][ai], slot_mapping)
            att = decode_gqa(q.astype(jnp.bfloat16), kc, vc, seq_lens,
                             block_table, 1.0 / d ** 0.5, cfg.page_size)
            att = att.reshape(b, nq * d).astype(jnp.float32)
            o = att @ p["wo"]
            if lora_indices is not None:
                shr = lora.bgmv_shrink(att, params["lora"]["A"], lora_indices)
                o = lora.bgmv_expand(shr, params["lora"]["B"], lora_indices,
                                     o, 0, cfg.hidden_size)
            x = x + o
            new_kc.append(kc)
            new_vc.append(vc)
            ai += 1

        mp_ = jax.tree.map(lambda a: a[li], params["mlp"])
        h2 = _rms(x, mp_["norm"], cfg.rms_eps)
        x = x + _mlp(h2, mp_["w13"], mp_["w2"], cfg.intermediate_size)

    x = _rms(x, params["final_norm"], cfg.rms_eps)
    logits = x @ params["lm_head"]
    state = {
        "conv": jnp.stack(new_conv), "ssm": jnp.stack(new_ssm),
        "k_cache": jnp.stack(new_kc), "v_cache": jnp.stack(new_vc),
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
    mixed_qkv, z, bb, aa = gdn.fused_qkvzba_split_reshape_cat(
        flat @ p["wqkvz"], flat @ p["wba"], hqk, hv, dqk, dv)

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
