"""DeepSeek-V3-class decoder: MLA attention + EP-routed MoE FFN.

The full BASELINE.json config-4 model family: per layer
  mla_preprocess fusion -> paged MLA decode -> W_UV/W_O   (ops.mla_preprocess,
                                                           ops.attention.decode)
  router top-k -> fused_deep_moe over the EP mesh axis    (parallel.fused_moe)
  + shared-expert FFN merged via mul_add                  (ops.moe_helpers)
Runs inside one shard_map over "ep" (DP attention: each rank owns its
requests' KV/latent caches; expert weights sharded on the expert dim).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import mla_preprocess as mp
from ..ops.attention.decode import decode_mla_ref
from ..ops.moe_helpers import mul_add
from ..parallel import fused_moe
from ..parallel.strategy import get_low_latency_strategy
from .deepseek_mla import _qmm, _rms


@dataclass(frozen=True)
class DeepSeekV3Config:
    vocab_size: int = 1024
    hidden_size: int = 256
    num_layers: int = 2
    num_heads: int = 4
    kv_lora_rank: int = 64
    qk_rope_dim: int = 16
    qk_nope_dim: int = 32
    v_head_dim: int = 32
    q_lora_rank: int = 96
    num_experts: int = 16
    top_k: int = 4
    moe_intermediate: int = 64
    shared_intermediate: int = 64
    routed_scaling_factor: float = 1.0
    rms_eps: float = 1e-6
    page_size: int = 16
    max_position: int = 1024

    @property
    def mm1_out(self):
        return self.kv_lora_rank + self.qk_rope_dim + self.q_lora_rank


def init_params(cfg: DeepSeekV3Config, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    l, h, heads = cfg.num_layers, cfg.hidden_size, cfg.num_heads
    qdim = cfg.qk_nope_dim + cfg.qk_rope_dim
    e, f = cfg.num_experts, cfg.moe_intermediate

    def w(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    def wq(out, inp):
        return {
            "q": jnp.asarray(rng.integers(-127, 128, (l, out, inp), dtype=np.int8)),
            "descale": jnp.full((l, out), 0.02 / 127.0, jnp.float32),
            "bias": jnp.zeros((l, out), jnp.int32),
        }

    inv = 1.0 / np.arange(1, cfg.qk_rope_dim // 2 + 1, dtype=np.float64)
    t = np.arange(cfg.max_position, dtype=np.float64)[:, None] * inv[None] * 0.01
    return {
        "embed": w(cfg.vocab_size, h, s=0.02),
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": w(h, cfg.vocab_size, s=0.02),
        "cos": jnp.asarray(np.cos(np.concatenate([t, t], -1)), jnp.float32),
        "sin": jnp.asarray(np.sin(np.concatenate([t, t], -1)), jnp.float32),
        "layers": {
            "wdqkv": wq(cfg.mm1_out, h),
            "wuq": wq(heads * qdim, cfg.q_lora_rank),
            "wuk": w(l, heads, cfg.qk_nope_dim, cfg.kv_lora_rank),
            "wuv": w(l, heads, cfg.kv_lora_rank, cfg.v_head_dim),
            "wo": {
                "q": jnp.asarray(rng.integers(-127, 128,
                                              (l, heads * cfg.v_head_dim, h),
                                              dtype=np.int8)),
                "scale": jnp.full((l, h), 0.02 / 127.0, jnp.float32),
            },
            "gamma0": jnp.ones((l, h), jnp.float32),
            "beta0": jnp.zeros((l, h), jnp.float32),
            "gamma1": jnp.ones((l, cfg.q_lora_rank), jnp.float32),
            "beta1": jnp.zeros((l, cfg.q_lora_rank), jnp.float32),
            "gamma2": jnp.ones((l, cfg.kv_lora_rank), jnp.float32),
            "post_norm": jnp.ones((l, h), jnp.float32),
            "qscale0": jnp.full((l, 1), 0.05, jnp.float32),
            "qoffset0": jnp.zeros((l, 1), jnp.float32),
            "qscale1": jnp.full((l, 1), 0.05, jnp.float32),
            "qoffset1": jnp.zeros((l, 1), jnp.float32),
            "router": w(l, h, e, s=0.5),
            "w13": {
                "q": jnp.asarray(rng.integers(-127, 128, (l, e, h, 2 * f),
                                              dtype=np.int8)),
                "scale": jnp.full((l, e, 2 * f), 0.05 / 127.0, jnp.float32),
            },
            "w2": {
                "q": jnp.asarray(rng.integers(-127, 128, (l, e, f, h),
                                              dtype=np.int8)),
                "scale": jnp.full((l, e, h), 0.05 / 127.0, jnp.float32),
            },
            "shared_w13": w(l, h, 2 * cfg.shared_intermediate),
            "shared_w2": w(l, cfg.shared_intermediate, h),
        },
    }


def init_kv_cache(cfg: DeepSeekV3Config, num_pages: int):
    ckv = jnp.zeros((cfg.num_layers, num_pages, cfg.page_size, cfg.kv_lora_rank),
                    jnp.float32)
    krope = jnp.zeros((cfg.num_layers, num_pages, cfg.page_size, cfg.qk_rope_dim),
                      jnp.float32)
    return ckv, krope


def decode_step_shard(params, cfg: DeepSeekV3Config, ckv_cache, krope_cache,
                      input_ids, positions, seq_lens, block_table, slot_mapping,
                      *, axis_name, num_ranks, strategy, max_tokens):
    b = input_ids.shape[0]
    sm_scale = 1.0 / ((cfg.qk_nope_dim + cfg.qk_rope_dim) ** 0.5)
    x = params["embed"][input_ids]
    cos = params["cos"][positions]
    sin = params["sin"][positions]

    new_ckv, new_kr = [], []
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        out = mp.mla_preprocess(
            x, lp["gamma0"], lp["beta0"],
            lp["wdqkv"]["q"], lp["wdqkv"]["descale"],
            lp["gamma1"], lp["beta1"], lp["wuq"]["q"], lp["wuq"]["descale"],
            lp["gamma2"], cos, sin, lp["wuk"],
            ckv_cache[li], krope_cache[li], slot_mapping,
            lp["qscale0"], lp["qoffset0"], lp["wdqkv"]["bias"],
            lp["qscale1"], lp["qoffset1"], lp["wuq"]["bias"],
            cache_mode="krope_ctkv",
        )
        q = jnp.concatenate([out.q_nope.astype(jnp.float32),
                             out.q_pe.astype(jnp.float32)], -1)
        att = decode_mla_ref(q, out.kv_cache, out.krope_cache, seq_lens,
                             block_table, sm_scale, cfg.page_size)
        att = jnp.einsum("bhk,hkd->bhd", att.astype(jnp.float32), lp["wuv"])
        x = x + _qmm(att.reshape(b, -1), lp["wo"])
        new_ckv.append(out.kv_cache)
        new_kr.append(out.krope_cache)

        h2 = _rms(x, lp["post_norm"], cfg.rms_eps)
        logits_r = h2 @ lp["router"]
        topk_w, topk_i = jax.lax.top_k(jax.nn.softmax(logits_r, -1), cfg.top_k)
        topk_w = topk_w / jnp.sum(topk_w, -1, keepdims=True)
        routed = fused_moe.fused_deep_moe_shard(
            h2.astype(jnp.bfloat16), topk_i.astype(jnp.int32),
            topk_w * cfg.routed_scaling_factor,
            lp["w13"]["q"], lp["w13"]["scale"], lp["w2"]["q"], lp["w2"]["scale"],
            strategy=strategy, axis_name=axis_name,
            num_experts=cfg.num_experts, num_ranks=num_ranks,
            num_max_dispatch_tokens_per_rank=max_tokens,
        ).astype(jnp.float32)
        fs = cfg.shared_intermediate
        ug = h2 @ lp["shared_w13"]
        shared = (ug[:, :fs] * jax.nn.sigmoid(ug[:, :fs]) * ug[:, fs:]) @ lp["shared_w2"]
        x = x + mul_add(routed, shared, 1.0)

    x = _rms(x, params["final_norm"], cfg.rms_eps)
    return x @ params["lm_head"], jnp.stack(new_ckv), jnp.stack(new_kr)


def make_decode_step(mesh: Mesh, cfg: DeepSeekV3Config, max_tokens: int,
                     axis_name: str = "ep",
                     low_latency_strategy: str = "default"):
    num_ranks = mesh.shape[axis_name]
    strategy = get_low_latency_strategy(low_latency_strategy)
    ep = P(axis_name)

    lp = {
        "wdqkv": {"q": P(), "descale": P(), "bias": P()},
        "wuq": {"q": P(), "descale": P(), "bias": P()},
        "wuk": P(), "wuv": P(),
        "wo": {"q": P(), "scale": P()},
        "gamma0": P(), "beta0": P(), "gamma1": P(), "beta1": P(), "gamma2": P(),
        "post_norm": P(), "qscale0": P(), "qoffset0": P(),
        "qscale1": P(), "qoffset1": P(), "router": P(),
        "w13": {"q": P(None, axis_name), "scale": P(None, axis_name)},
        "w2": {"q": P(None, axis_name), "scale": P(None, axis_name)},
        "shared_w13": P(), "shared_w2": P(),
    }
    pspecs = {"embed": P(), "final_norm": P(), "lm_head": P(),
              "cos": P(), "sin": P(), "layers": lp}
    cache_spec = P(None, axis_name)

    def fn(params, ckv, kr, ids, pos, seq, bt, slots):
        return decode_step_shard(
            params, cfg, ckv, kr, ids, pos, seq, bt, slots,
            axis_name=axis_name, num_ranks=num_ranks, strategy=strategy,
            max_tokens=max_tokens)

    step = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, cache_spec, cache_spec, ep, ep, ep, ep, ep),
        out_specs=(ep, cache_spec, cache_spec),
        check_vma=False,
    ))
    return step, pspecs
