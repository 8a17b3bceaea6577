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
