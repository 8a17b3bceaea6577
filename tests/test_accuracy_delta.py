"""Gate the checkpoint-free quantization Δ (models/quant_ref.py,
VERDICT r4 next-6): the INT8 engines must track their f32 twins within the
stated budget on a fixed synthetic stream. ACCURACY.md records the
full-size numbers (scripts/accuracy_delta.py)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import deepseek_mla as dm
from sgl_kernel_npu_tpu.models import llama
from sgl_kernel_npu_tpu.models import quant_ref as qr


def test_llama_w8a8_quant_delta(rng):
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, num_layers=3, num_heads=8,
        num_kv_heads=4, head_dim=32, intermediate_size=512,
        page_size=32, max_position=512)
    t = 96
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, t + 1), jnp.int32)
    p32 = qr.llama_f32_params(cfg, 3)
    logits32 = qr.llama_f32_forward(p32, cfg, ids[:-1])
    pq = qr.quantize_llama(p32, cfg)
    ps = cfg.page_size
    kc, vc = llama.init_kv_cache(cfg, -(-t // ps) + 1)
    slots = jnp.arange(t, dtype=jnp.int32) + ps
    logits8, _, _ = llama.prefill_step(
        pq, cfg, kc, vc, ids[:-1], jnp.arange(t, dtype=jnp.int32), slots, 0)
    m = qr.delta_metrics(logits32, logits8, ids[1:])
    assert abs(m["ppl_delta_pct"]) <= 2.0, m
    assert m["kl_mean"] <= 0.02, m
    # random tiny models have near-uniform logits: argmax flips on near-ties
    # even at KL ~1e-4, so the greedy gate is loose here (the KL/ppl gates
    # carry the signal; ACCURACY.md records full-size agreement)
    assert m["greedy_agreement"] >= 0.85, m


def test_mla_quant_delta(rng):
    cfg = dm.MlaConfig(
        vocab_size=512, hidden_size=256, num_layers=3, num_heads=4,
        kv_lora_rank=128, qk_rope_dim=32, qk_nope_dim=64, v_head_dim=64,
        q_lora_rank=192, intermediate_size=512, page_size=32,
        max_position=512)
    t = 96
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, t + 1), jnp.int32)
    p32 = qr.mla_f32_params(cfg, 3)
    logits32 = qr.mla_f32_forward(p32, cfg, ids[:-1])
    pq = qr.quantize_mla(p32, cfg, ids[:-1])
    ps = cfg.page_size
    ckv, krope = dm.init_kv_cache(cfg, -(-t // ps) + 1)
    slots = jnp.arange(t, dtype=jnp.int32) + ps
    logits8, _, _ = dm.prefill_step(
        pq, cfg, ckv, krope, ids[:-1], jnp.arange(t, dtype=jnp.int32), slots)
    m = qr.delta_metrics(logits32, logits8, ids[1:])
    # per-tensor activation quant is coarser than per-token: looser KL gate
    assert abs(m["ppl_delta_pct"]) <= 2.0, m
    assert m["kl_mean"] <= 0.05, m
    assert m["greedy_agreement"] >= 0.80, m
