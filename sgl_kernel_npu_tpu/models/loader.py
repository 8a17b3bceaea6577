"""HF checkpoint loading + post-training W8A8 quantization.

The reference consumes weights already quantized by SGLang's loaders; this
module is the standalone equivalent for this framework: read a HuggingFace
Llama-family checkpoint (config.json + *.safetensors), fuse the projections
into this package's layouts (wqkv fused, w13 gate|up fused), and quantize to
INT8 with per-output-channel absmax scales.

Pure numpy/safetensors — no torch needed on the load path.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig
from ..ops.rope import make_cos_sin_cache


def quantize_per_channel(w: np.ndarray):
    """w [in, out] fp -> (int8 [in, out], scale [out] f32), symmetric absmax."""
    absmax = np.abs(w).max(axis=0)
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def config_from_hf(path: str) -> LlamaConfig:
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim",
                        hf["hidden_size"] // hf["num_attention_heads"]),
        intermediate_size=hf["intermediate_size"],
        rope_base=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-5),
        max_position=min(hf.get("max_position_embeddings", 8192), 32768),
    )


def _load_all_tensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    out = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            out.update(load_file(os.path.join(path, fn)))
    return out


def load_llama_w8a8(path: str):
    """Returns (cfg, params) matching models.llama's param pytree."""
    cfg = config_from_hf(path)
    t = _load_all_tensors(path)
    l, h = cfg.num_layers, cfg.hidden_size

    def get(name):
        return t[name].astype(np.float32)

    wqkv_q, wqkv_s = [], []
    wo_q, wo_s = [], []
    w13_q, w13_s = [], []
    w2_q, w2_s = [], []
    in_norm, post_norm = [], []
    for i in range(l):
        pre = f"model.layers.{i}."
        # HF stores [out, in]; our layout is [in, out]
        wq = get(pre + "self_attn.q_proj.weight").T
        wk = get(pre + "self_attn.k_proj.weight").T
        wv = get(pre + "self_attn.v_proj.weight").T
        q8, s = quantize_per_channel(np.concatenate([wq, wk, wv], axis=1))
        wqkv_q.append(q8)
        wqkv_s.append(s)
        q8, s = quantize_per_channel(get(pre + "self_attn.o_proj.weight").T)
        wo_q.append(q8)
        wo_s.append(s)
        wg = get(pre + "mlp.gate_proj.weight").T
        wu = get(pre + "mlp.up_proj.weight").T
        q8, s = quantize_per_channel(np.concatenate([wg, wu], axis=1))
        w13_q.append(q8)
        w13_s.append(s)
        q8, s = quantize_per_channel(get(pre + "mlp.down_proj.weight").T)
        w2_q.append(q8)
        w2_s.append(s)
        in_norm.append(get(pre + "input_layernorm.weight"))
        post_norm.append(get(pre + "post_attention_layernorm.weight"))

    embed = get("model.embed_tokens.weight")
    lm = t.get("lm_head.weight")
    lm = embed if lm is None else lm.astype(np.float32)  # tied embeddings
    lm_q, lm_s = quantize_per_channel(lm.T)

    params = {
        "embed": jnp.asarray(embed, jnp.bfloat16),
        "final_norm": jnp.asarray(get("model.norm.weight"), jnp.bfloat16),
        "lm_head": {"q": jnp.asarray(lm_q), "scale": jnp.asarray(lm_s)},
        "cos_sin": make_cos_sin_cache(cfg.max_position, cfg.head_dim, cfg.rope_base),
        "layers": {
            "wqkv": {"q": jnp.asarray(np.stack(wqkv_q)),
                     "scale": jnp.asarray(np.stack(wqkv_s))},
            "wo": {"q": jnp.asarray(np.stack(wo_q)),
                   "scale": jnp.asarray(np.stack(wo_s))},
            "w13": {"q": jnp.asarray(np.stack(w13_q)),
                    "scale": jnp.asarray(np.stack(w13_s))},
            "w2": {"q": jnp.asarray(np.stack(w2_q)),
                   "scale": jnp.asarray(np.stack(w2_s))},
            "input_norm": jnp.asarray(np.stack(in_norm), jnp.bfloat16),
            "post_norm": jnp.asarray(np.stack(post_norm), jnp.bfloat16),
        },
    }
    return cfg, params


# ------------------------------------------------------ DeepSeek-V2/V3 (MLA)


def config_mla_from_hf(path: str):
    """MlaConfig from a DeepSeek-V2/V3-family HF config.json."""
    from .deepseek_mla import MlaConfig

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    return MlaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        kv_lora_rank=hf["kv_lora_rank"],
        qk_rope_dim=hf["qk_rope_head_dim"],
        qk_nope_dim=hf["qk_nope_head_dim"],
        v_head_dim=hf["v_head_dim"],
        q_lora_rank=hf["q_lora_rank"],
        intermediate_size=hf["intermediate_size"],
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        max_position=min(hf.get("max_position_embeddings", 4096), 32768),
    )


def load_deepseek_mla_w8a8(path: str):
    """HF DeepSeek-V2/V3 checkpoint -> models.deepseek_mla param pytree.

    Weight mapping into the mla_preprocess fused layout
    (ops/mla_preprocess.py:117: wdqkv output order [ctkv | krope | q_lora]):
      wdqkv = rowstack(kv_a_proj_with_mqa, q_a_proj), quantized per out row
      wuq   = q_b_proj (per-head [nope | rope] column order matches HF)
      wuk   = kv_b_proj K-half   [H, nope, kv_lora]
      wuv   = kv_b_proj V-half^T [H, kv_lora, v_dim]
      gamma0/1/2 = input_layernorm / q_a_layernorm / kv_a_layernorm
    Static per-tensor activation quant scales (qscale0/1) are set from a
    calibration-free heuristic; use quant_mode="per_token" on the decode step
    for calibration-free serving.
    """
    from .deepseek_mla import make_mla_cos_sin

    cfg = config_mla_from_hf(path)
    t = _load_all_tensors(path)
    l = cfg.num_layers
    heads = cfg.num_heads

    def get(name):
        return t[name].astype(np.float32)

    def quant_rows(w):  # w [out, in] -> int8 [out, in] + descale [out]
        q8, s = quantize_per_channel(w.T)
        return q8.T, s

    L = {k: [] for k in ("wdqkv_q", "wdqkv_s", "wuq_q", "wuq_s", "wuk", "wuv",
                         "wo_q", "wo_s", "w13_q", "w13_s", "w2_q", "w2_s",
                         "g0", "g1", "g2", "post")}
    for i in range(l):
        pre = f"model.layers.{i}."
        wdqkv = np.concatenate([
            get(pre + "self_attn.kv_a_proj_with_mqa.weight"),
            get(pre + "self_attn.q_a_proj.weight"),
        ], axis=0)
        q8, s = quant_rows(wdqkv)
        L["wdqkv_q"].append(q8)
        L["wdqkv_s"].append(s)
        q8, s = quant_rows(get(pre + "self_attn.q_b_proj.weight"))
        L["wuq_q"].append(q8)
        L["wuq_s"].append(s)
        kv_b = get(pre + "self_attn.kv_b_proj.weight").reshape(
            heads, cfg.qk_nope_dim + cfg.v_head_dim, cfg.kv_lora_rank)
        L["wuk"].append(kv_b[:, : cfg.qk_nope_dim, :])
        L["wuv"].append(kv_b[:, cfg.qk_nope_dim:, :].transpose(0, 2, 1))
        q8, s = quantize_per_channel(get(pre + "self_attn.o_proj.weight").T)
        L["wo_q"].append(q8)
        L["wo_s"].append(s)
        wg = get(pre + "mlp.gate_proj.weight").T
        wu = get(pre + "mlp.up_proj.weight").T
        q8, s = quantize_per_channel(np.concatenate([wg, wu], axis=1))
        L["w13_q"].append(q8)
        L["w13_s"].append(s)
        q8, s = quantize_per_channel(get(pre + "mlp.down_proj.weight").T)
        L["w2_q"].append(q8)
        L["w2_s"].append(s)
        L["g0"].append(get(pre + "input_layernorm.weight"))
        L["g1"].append(get(pre + "self_attn.q_a_layernorm.weight"))
        L["g2"].append(get(pre + "self_attn.kv_a_layernorm.weight"))
        L["post"].append(get(pre + "post_attention_layernorm.weight"))

    st = lambda k: jnp.asarray(np.stack(L[k]))
    embed = get("model.embed_tokens.weight")
    lm = t.get("lm_head.weight")
    lm = embed if lm is None else lm.astype(np.float32)
    lm_q, lm_s = quantize_per_channel(lm.T)
    cos, sin = make_mla_cos_sin(cfg)

    layers = {
        "wdqkv": {"q": st("wdqkv_q"), "descale": st("wdqkv_s"),
                  "bias": jnp.zeros((l, cfg.mm1_out), jnp.int32)},
        "wuq": {"q": st("wuq_q"), "descale": st("wuq_s"),
                "bias": jnp.zeros(
                    (l, heads * (cfg.qk_nope_dim + cfg.qk_rope_dim)),
                    jnp.int32)},
        "wuk": st("wuk"), "wuv": st("wuv"),
        "wo": {"q": st("wo_q"), "scale": st("wo_s")},
        "w13": {"q": st("w13_q"), "scale": st("w13_s")},
        "w2": {"q": st("w2_q"), "scale": st("w2_s")},
        "gamma0": st("g0"), "beta0": jnp.zeros((l, cfg.hidden_size), jnp.float32),
        "gamma1": st("g1"),
        "beta1": jnp.zeros((l, cfg.q_lora_rank), jnp.float32),
        "gamma2": st("g2"),
        "post_norm": st("post").astype(jnp.bfloat16),
        # calibration-free heuristic (per_tensor mode only)
        "qscale0": jnp.full((l, 1), 0.05, jnp.float32),
        "qoffset0": jnp.zeros((l, 1), jnp.float32),
        "qscale1": jnp.full((l, 1), 0.05, jnp.float32),
        "qoffset1": jnp.zeros((l, 1), jnp.float32),
    }
    params = {
        "embed": jnp.asarray(embed, jnp.bfloat16),
        "final_norm": jnp.asarray(get("model.norm.weight"), jnp.bfloat16),
        "lm_head": {"q": jnp.asarray(lm_q), "scale": jnp.asarray(lm_s)},
        "cos": cos, "sin": sin,
        "layers": layers,
    }
    return cfg, params


# ------------------------------------------------ DeepSeek-V3 MoE expert bank


def load_moe_expert_bank(path: str, num_layers: int, num_experts: int):
    """HF DeepSeek-MoE expert weights -> the [L, E, ...] int8 bank consumed by
    models.moe / parallel.fused_moe (w13 gate|up concatenated, w2 down), plus
    router weights and shared-expert FFN.

    HF names per layer i, expert e:
      model.layers.{i}.mlp.experts.{e}.{gate_proj,up_proj,down_proj}.weight
      model.layers.{i}.mlp.gate.weight            (router [E, H])
      model.layers.{i}.mlp.shared_experts.{gate_proj,up_proj,down_proj}.weight
    Returns dict(w13={q,scale}, w2={q,scale}, router, shared_w13, shared_w2).
    """
    t = _load_all_tensors(path)

    def get(name):
        return t[name].astype(np.float32)

    w13_q, w13_s, w2_q, w2_s, router, sh13, sh2 = [], [], [], [], [], [], []
    for i in range(num_layers):
        pre = f"model.layers.{i}.mlp."
        lq13, ls13, lq2, ls2 = [], [], [], []
        for e in range(num_experts):
            ep = f"{pre}experts.{e}."
            w13 = np.concatenate([get(ep + "gate_proj.weight").T,
                                  get(ep + "up_proj.weight").T], axis=1)
            q8, s = quantize_per_channel(w13)
            lq13.append(q8)
            ls13.append(s)
            q8, s = quantize_per_channel(get(ep + "down_proj.weight").T)
            lq2.append(q8)
            ls2.append(s)
        w13_q.append(np.stack(lq13))
        w13_s.append(np.stack(ls13))
        w2_q.append(np.stack(lq2))
        w2_s.append(np.stack(ls2))
        router.append(get(pre + "gate.weight").T)           # [H, E]
        sh13.append(np.concatenate(
            [get(pre + "shared_experts.gate_proj.weight").T,
             get(pre + "shared_experts.up_proj.weight").T], axis=1))
        sh2.append(get(pre + "shared_experts.down_proj.weight").T)

    return {
        "w13": {"q": jnp.asarray(np.stack(w13_q)),
                "scale": jnp.asarray(np.stack(w13_s))},
        "w2": {"q": jnp.asarray(np.stack(w2_q)),
               "scale": jnp.asarray(np.stack(w2_s))},
        "router": jnp.asarray(np.stack(router)),
        "shared_w13": jnp.asarray(np.stack(sh13)),
        "shared_w2": jnp.asarray(np.stack(sh2)),
    }


# --------------------------------------------------------------- Qwen3-Next


def config_qwen_next_from_hf(path: str):
    """config.json of a HF `Qwen3NextForCausalLM` -> QwenNextConfig.

    `full_attention_interval` is derived from `layer_types` (the public
    checkpoints use a 3:1 linear:full pattern, i.e. interval 4)."""
    from .qwen_next import QwenNextConfig

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    lt = hf.get("layer_types")
    if lt and "full_attention" in lt:
        interval = lt.index("full_attention") + 1
    else:
        interval = hf.get("full_attention_interval", 4)
    return QwenNextConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        full_attention_interval=interval,
        num_qk_heads=hf["linear_num_key_heads"],
        num_v_heads=hf["linear_num_value_heads"],
        head_qk_dim=hf["linear_key_head_dim"],
        head_v_dim=hf["linear_value_head_dim"],
        conv_width=hf["linear_conv_kernel_dim"],
        chunk_size=64,
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf["num_key_value_heads"],
        head_dim=hf.get("head_dim",
                        hf["hidden_size"] // hf["num_attention_heads"]),
        partial_rotary_factor=hf.get("partial_rotary_factor", 0.25),
        rope_theta=hf.get("rope_theta", 10000.0),
        num_experts=hf["num_experts"],
        top_k=hf["num_experts_per_tok"],
        norm_topk_prob=hf.get("norm_topk_prob", True),
        moe_intermediate_size=hf["moe_intermediate_size"],
        shared_intermediate_size=hf["shared_expert_intermediate_size"],
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        max_position=min(hf.get("max_position_embeddings", 8192), 32768),
    )


def load_qwen_next(path: str):
    """HF Qwen3-Next checkpoint -> (cfg, params) for models.qwen_next (fp32).

    Norm handling: HF `Qwen3NextRMSNorm` weights are zero-centered
    (out = rms(x) * (1 + w)) — input/post layernorms, q/k norms and the final
    norm get +1 here so the model code can use plain RMS. The GDN block's
    RMSNormGated weight ([head_v_dim], NOT zero-centered) is tiled across
    v-heads to the package's [num_v_heads * head_v_dim] layout."""
    from .qwen_next import init_params

    cfg = config_qwen_next_from_hf(path)
    t = _load_all_tensors(path)

    def get(name):
        return t[name].astype(np.float32)

    g, a = [], []  # per-type accumulators: list of dicts
    moe = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        if not cfg.is_full_attention(i):
            la = pre + "linear_attn."
            g.append({
                "in_norm": get(pre + "input_layernorm.weight") + 1.0,
                "wqkvz": get(la + "in_proj_qkvz.weight").T,
                "wba": get(la + "in_proj_ba.weight").T,
                "conv_w": get(la + "conv1d.weight")[:, 0, :],
                "conv_b": (get(la + "conv1d.bias")
                           if la + "conv1d.bias" in t else
                           np.zeros(t[la + "conv1d.weight"].shape[0],
                                    np.float32)),
                "A_log": get(la + "A_log"),
                "dt_bias": get(la + "dt_bias"),
                "out_norm_w": np.tile(get(la + "norm.weight"),
                                      cfg.num_v_heads),
                "wo": get(la + "out_proj.weight").T,
            })
        else:
            sa = pre + "self_attn."
            a.append({
                "in_norm": get(pre + "input_layernorm.weight") + 1.0,
                "wq": get(sa + "q_proj.weight").T,
                "wk": get(sa + "k_proj.weight").T,
                "wv": get(sa + "v_proj.weight").T,
                "wo": get(sa + "o_proj.weight").T,
                "q_norm": get(sa + "q_norm.weight") + 1.0,
                "k_norm": get(sa + "k_norm.weight") + 1.0,
            })
        mp = pre + "mlp."
        w13 = np.stack([np.concatenate(
            [get(f"{mp}experts.{e}.gate_proj.weight").T,
             get(f"{mp}experts.{e}.up_proj.weight").T], axis=1)
            for e in range(cfg.num_experts)])
        w2 = np.stack([get(f"{mp}experts.{e}.down_proj.weight").T
                       for e in range(cfg.num_experts)])
        moe.append({
            "norm": get(pre + "post_attention_layernorm.weight") + 1.0,
            "router": get(mp + "gate.weight").T,
            "w13": w13,
            "w2": w2,
            "shared_w13": np.concatenate(
                [get(mp + "shared_expert.gate_proj.weight").T,
                 get(mp + "shared_expert.up_proj.weight").T], axis=1),
            "shared_w2": get(mp + "shared_expert.down_proj.weight").T,
            "shared_gate": get(mp + "shared_expert_gate.weight").T,
        })

    def stack(dicts):
        return {k: jnp.asarray(np.stack([d[k] for d in dicts]))
                for k in dicts[0]} if dicts else {}

    embed = get("model.embed_tokens.weight")
    lm_head = (get("lm_head.weight").T if "lm_head.weight" in t
               else embed.T.copy())
    params = init_params(cfg, seed=0)  # template for cos_sin / lora shapes
    params.update({
        "embed": jnp.asarray(embed),
        "final_norm": jnp.asarray(get("model.norm.weight") + 1.0),
        "lm_head": jnp.asarray(lm_head),
        "gdn": stack(g),
        "attn": stack(a),
        "moe": stack(moe),
    })
    return cfg, params
