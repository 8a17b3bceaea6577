#!/usr/bin/env python
"""Checkpoint-free quantization-accuracy measurement -> ACCURACY.md.

Runs the f32 reference forwards and the INT8 engines on the same smooth
random weights + fixed token stream (models/quant_ref.py) and records
perplexity Δ and logits KL for the Llama-class W8A8 engine and the MLA
engine (per-tensor activation quant, calibrated). See quant_ref's module
docstring for why this is the honest stand-in for HF-checkpoint accuracy in
this environment. Usage: python scripts/accuracy_delta.py [--out ACCURACY.md]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_llama(t=512, seed=0):
    from sgl_kernel_npu_tpu.models import llama
    from sgl_kernel_npu_tpu.models import quant_ref as qr

    cfg = llama.LlamaConfig(
        vocab_size=4096, hidden_size=1024, num_layers=8, num_heads=8,
        num_kv_heads=4, head_dim=128, intermediate_size=2816,
        page_size=128, max_position=2048)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, t + 1), jnp.int32)
    p32 = qr.llama_f32_params(cfg, seed)
    logits32 = qr.llama_f32_forward(p32, cfg, ids[:-1])

    pq = qr.quantize_llama(p32, cfg)
    ps = cfg.page_size
    num_pages = -(-t // ps) + 1
    kc, vc = llama.init_kv_cache(cfg, num_pages)
    slots = jnp.arange(t, dtype=jnp.int32) + ps   # pages 1..
    logits8, _, _ = llama.prefill_step(
        pq, cfg, kc, vc, ids[:-1], jnp.arange(t, dtype=jnp.int32), slots, 0)
    return qr.delta_metrics(logits32, logits8, ids[1:])


def run_mla(t=384, seed=0):
    from sgl_kernel_npu_tpu.models import deepseek_mla as dm
    from sgl_kernel_npu_tpu.models import quant_ref as qr

    cfg = dm.MlaConfig(
        vocab_size=4096, hidden_size=1024, num_layers=6, num_heads=8,
        kv_lora_rank=512, qk_rope_dim=64, qk_nope_dim=128, v_head_dim=128,
        q_lora_rank=768, intermediate_size=2048, page_size=128,
        max_position=2048)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, t + 1), jnp.int32)
    p32 = qr.mla_f32_params(cfg, seed)
    logits32 = qr.mla_f32_forward(p32, cfg, ids[:-1])

    pq = qr.quantize_mla(p32, cfg, ids[:-1])
    ps = cfg.page_size
    num_pages = -(-t // ps) + 1
    ckv, krope = dm.init_kv_cache(cfg, num_pages)
    slots = jnp.arange(t, dtype=jnp.int32) + ps
    logits8, _, _ = dm.prefill_step(
        pq, cfg, ckv, krope, ids[:-1], jnp.arange(t, dtype=jnp.int32), slots)
    return qr.delta_metrics(logits32, logits8, ids[1:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (the Δ is backend-independent; avoids "
                         "competing with chip benches)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    res = {"llama_w8a8": run_llama(), "mla_w8a8_pertensor": run_mla()}
    print(json.dumps(res, indent=1))
    if args.out:
        plat = jax.devices()[0].platform
        lines = [
            "# ACCURACY — checkpoint-free quantization Δ",
            "",
            "Same smooth random f32 weights, same fixed token stream: the f32",
            "reference forward vs the INT8 engine (models/quant_ref.py;",
            "VERDICT r4 next-6). No HF checkpoints are reachable in this",
            "environment, so this measures exactly the engine's quantization",
            "error — weight int8 (per-output-channel) + activation quant",
            "(per-token dynamic for Llama-class W8A8; calibrated per-tensor",
            "for the MLA pipeline, the reference op's contract).",
            "",
            f"Backend: {plat}. Reproduce: `python scripts/accuracy_delta.py`.",
            "",
            "| engine | ppl f32 | ppl int8 | Δppl | KL mean | KL max | greedy agree |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, m in res.items():
            lines.append(
                f"| {name} | {m['ppl_f32']:.2f} | {m['ppl_int8']:.2f} | "
                f"{m['ppl_delta_pct']:+.2f}% | {m['kl_mean']:.4f} | "
                f"{m['kl_max']:.4f} | {m['greedy_agreement']*100:.1f}% |")
        lines += [
            "",
            "Gates (tests/test_accuracy_delta.py): Δppl ≤ 2%, mean KL ≤ 0.02",
            "(0.05 for the per-tensor MLA path), greedy agreement ≥ 85%/80% —",
            "the greedy gate is loose because random weights give",
            "near-uniform logits whose argmax flips on ties even at KL ~1e-3;",
            "the KL/ppl gates carry the signal. `tests/test_accuracy_vs_hf.py`",
            "un-skips on top when checkpoints become available.",
        ]
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
