#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): tokens/s/chip for Llama-3-8B-class W8A8
continuous-batching decode on one TPU chip. vs_baseline is the fraction of the
chip's HBM-bandwidth roofline achieved (speed-of-light ratio): the decode step
must stream all INT8 weights plus the live KV window per token, so
  roofline tok/s = HBM_BW / (weight_bytes/batch + kv_bytes_per_token).

Usage: python bench.py [--smoke] [--batch N] [--ctx N]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    """Parse args, run the bench with one retry, ALWAYS print one JSON line.

    A transient tunnel/backend failure must degrade to a diagnostic JSON the
    driver can record — never a bare rc=1 (that cost round 1 its number)."""
    args = parse_args()
    last_err = None
    for attempt in range(2):
        try:
            return run_bench(args)
        except Exception as e:  # noqa: BLE001 — diagnostic boundary
            last_err = f"{type(e).__name__}: {e}"
            sys.stderr.write(f"bench attempt {attempt} failed: {last_err}\n")
            time.sleep(5)
    print(json.dumps({
        "metric": "decode_tokens_per_s_per_chip_llama8b_w8a8",
        "value": 0.0,
        "unit": "tokens/s/chip",
        "vs_baseline": 0.0,
        "detail": {"error": (last_err or "")[:500]},
    }))
    return 0


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny config, fast")
    # bs128 is the serving sweet spot on the v5e (2026-08-18 sweep: 3137
    # tok/s @ 52.9% of roofline at bs64, 6308 @ 61.3% at bs128, 8426 @ 51.7%
    # at bs256 — the step is weight-stream dominated up to bs128)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--int8-kv", action="store_true", default=True,
                    help="INT8 KV cache (BASELINE config-2 includes it; default on)")
    ap.add_argument("--bf16-kv", dest="int8_kv", action="store_false")
    ap.add_argument("--v4", type=int, nargs="?", const=1, default=0,
                    help="decode variant: 1 fused in-kernel write, 2 aliased "
                         "pass-through (SKT_DECODE_V4)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the axon plugin overrides JAX_PLATFORMS)")
    return ap.parse_args()


def run_bench(args):
    if args.v4:
        os.environ["SKT_DECODE_V4"] = str(args.v4)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sgl_kernel_npu_tpu.models import llama
    from sgl_kernel_npu_tpu.utils import get_device_properties

    props = get_device_properties()

    if args.smoke:
        cfg = llama.tiny_config(int8_kv=args.int8_kv)
        batch, ctx, iters = 4, 64, 3
    else:
        cfg = llama.LlamaConfig(int8_kv=args.int8_kv)  # 8B-class
        batch, ctx, iters = args.batch, args.ctx, args.iters
        iters = min(iters, 10)

    page_size = cfg.page_size
    # K greedy decode steps run INSIDE one jit (lax.fori_loop): dispatching
    # single steps through the axon tunnel pays a ~3.4 ms RTT floor per step
    # (measured 2026-08-17), which is a dev-harness artifact, not chip time.
    # Size the block tables for the tokens generated across all reps.
    k_steps = 8 if args.smoke else 32
    reps = 3
    total_new = k_steps * (1 + reps)
    max_pages = -(-(ctx + total_new) // page_size)
    num_pages = batch * max_pages + 1

    params = llama.init_params(cfg, 0)
    if os.environ.get("SKT_GEMM_TILED", "1") != "0":
        # contiguous-DMA weight banks (ops/matmul.py::pretile_weight_bank)
        params = llama.pretile_big_weights(params)
    # token-major pages engage the v8 decode (Pallas append, no XLA scatter
    # on the big caches — see ops/attention/decode_v8.py); tm_layout_ok
    # falls back to head-major when the tm kernels' Mosaic tiling rules
    # don't hold (e.g. the smoke config's D=32 on real hardware)
    kv = llama.init_kv_cache(
        cfg, num_pages, layout="tm" if llama.tm_layout_ok(cfg) else "hm")

    rng = np.random.default_rng(0)
    bt = jnp.array(
        rng.permutation(num_pages - 1)[: batch * max_pages].reshape(batch, max_pages) + 1,
        jnp.int32,
    )
    positions0 = jnp.full((batch,), ctx - 1, jnp.int32)
    ids0 = jnp.array(rng.integers(0, cfg.vocab_size, batch), jnp.int32)

    def run_steps(params, kv, ids, pos):
        """k_steps greedy decode steps on-device (argmax feeds the next id —
        a real serving dependency chain, so XLA cannot elide any step)."""
        def body(_, carry):
            kv, ids, pos = carry
            seq = pos + 1
            slots = (bt[jnp.arange(batch), pos // page_size] * page_size
                     + pos % page_size)
            logits, kv = llama.decode_step_kv(params, cfg, kv, ids, pos, seq,
                                              bt, slots)
            ids = jnp.argmax(logits, -1).astype(jnp.int32)
            return kv, ids, pos + 1
        return jax.lax.fori_loop(0, k_steps, body, (kv, ids, pos))

    stepk = jax.jit(run_steps, donate_argnums=(1,))

    kv, ids, pos = stepk(params, kv, ids0, positions0)   # compile + warm
    int(np.asarray(ids[0]))                              # forced sync

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        kv, ids, pos = stepk(params, kv, ids, pos)
        int(np.asarray(ids[0]))                          # ~3.4ms RTT amortized /k
        times.append((time.perf_counter() - t0) / k_steps)
    dt = float(np.median(times))

    toks_per_s = batch / dt
    ctx = ctx + total_new // 2   # mean live context for the roofline below

    # Speed-of-light: bytes that MUST stream from HBM per decode step.
    h, f, l, v = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    qs, kvs = cfg.q_size, cfg.kv_size
    weight_bytes = l * (h * (qs + 2 * kvs) + qs * h + h * 2 * f + f * h) + h * v
    kv_elt = 1 if cfg.int8_kv else 2
    kv_bytes_per_tok = l * 2 * ctx * cfg.num_kv_heads * cfg.head_dim * kv_elt
    roofline = props.hbm_gbps * 1e9 / (weight_bytes / batch + kv_bytes_per_tok)
    vs_baseline = toks_per_s / roofline

    print(json.dumps({
        "metric": ("decode_tokens_per_s_smoke" if args.smoke else
                   "decode_tokens_per_s_per_chip_llama8b_w8a8" +
                   ("_int8kv" if args.int8_kv else "")),
        "value": round(toks_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "batch": batch, "ctx": ctx, "step_ms": round(dt * 1e3, 3),
            "roofline_tokens_per_s": round(roofline, 1),
            "platform": props.platform,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
