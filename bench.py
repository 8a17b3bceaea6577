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
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    runners = {"llama": run_bench, "mla": run_bench_mla,
               "moe": run_bench_moe, "qwen": run_bench_qwen}
    if args.all:
        # --all: auxiliary configs first (each faults to a diagnostic line,
        # never kills the run), headline LAST so the driver parses the llama
        # line. Each config runs in its OWN subprocess: one axon/TPU process
        # holds every buffer it ever allocated until exit, so running four
        # engines in-process OOMs the chip on config 3+ (observed 2026-08-19:
        # qwen+llama RESOURCE_EXHAUSTED after mla+moe).
        import subprocess
        for cfg_name in ["mla", "moe", "qwen", "llama"]:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--config", cfg_name,
                   "--batch", str(args.batch), "--ctx", str(args.ctx),
                   "--iters", str(args.iters)]
            if args.smoke:
                cmd.append("--smoke")
            if args.cpu:
                cmd.append("--cpu")
            if not args.int8_kv:
                cmd.append("--bf16-kv")
            r = subprocess.run(cmd, stdout=subprocess.PIPE, text=True)
            sys.stdout.write(r.stdout)
            sys.stdout.flush()
        return 0
    order = [args.config]
    last_err = None
    for cfg_name in order:
        ran = False
        for attempt in range(2):
            try:
                runners[cfg_name](args)
                ran = True
                break
            except Exception as e:  # noqa: BLE001 — diagnostic boundary
                last_err = f"{type(e).__name__}: {e}"
                sys.stderr.write(
                    f"bench[{cfg_name}] attempt {attempt} failed: {last_err}\n")
                time.sleep(5)
        if not ran:
            print(json.dumps({
                "metric": f"decode_tokens_per_s_per_chip_{cfg_name}",
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
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the axon plugin overrides JAX_PLATFORMS)")
    # BASELINE.json config selector: 'llama' (configs 1-2, the official
    # headline) stays the default so the driver's plain `python bench.py`
    # keeps printing exactly one JSON line. 'mla' (config 3), 'moe'
    # (config 4, EP=1 loopback fused MoE), 'qwen' (config 5 hybrid) each
    # print their own line; --all runs every config (headline line LAST).
    ap.add_argument("--config", default="llama",
                    choices=["llama", "mla", "moe", "qwen"])
    ap.add_argument("--all", action="store_true",
                    help="run mla+moe+qwen then the llama headline")
    return ap.parse_args()


def run_bench(args):
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sgl_kernel_npu_tpu.models import llama
    from sgl_kernel_npu_tpu.utils import get_device_properties

    props = get_device_properties()

    if args.smoke:
        cfg = llama.tiny_config(int8_kv=args.int8_kv)
        batch, ctx, iters = 4, 64, 3
    else:
        # SKT_PAGE_SIZE: paged-KV granularity A/B (the v9 attention stream
        # pays ~4 DMA issue+wait pairs per page per sequence; bigger pages
        # cut that linearly at the cost of allocator granularity — the
        # reference's mla kernels likewise allow blockSize 256,
        # csrc/mla_preprocess/README.md:53-56)
        ps = int(os.environ.get("SKT_PAGE_SIZE", "512"))
        cfg = llama.LlamaConfig(int8_kv=args.int8_kv, page_size=ps)  # 8B-class
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
    # tm2 (head-major 5-D pages + batched per-head dots, decode_v11) at
    # ps=512 is the measured best decode config on the v5e (A/B ledger in
    # ROADMAP.md: 6283 tm/ps128 -> 6299 ps256 -> 6372 tm2/ps512)
    kv = llama.init_kv_cache(
        cfg, num_pages,
        layout=os.environ.get(
            "SKT_KV_LAYOUT", "tm2" if llama.tm_layout_ok(cfg) else "hm"))

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

    trace_dir = os.environ.get("SKT_BENCH_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            kv, ids, pos = stepk(params, kv, ids, pos)
            int(np.asarray(ids[0]))
        sys.stderr.write(f"bench trace (k_steps={k_steps}) -> {trace_dir}\n")

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


def _emit(metric, toks_per_s, roofline, detail):
    print(json.dumps({
        "metric": metric,
        "value": round(toks_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(toks_per_s / roofline, 4) if roofline else 0.0,
        "detail": dict(detail, roofline_tokens_per_s=round(roofline, 1)),
    }))


def _median_step(step, k_steps, reps, state, sync):
    """Warm-compile then time `reps` k-step calls of `step(state) -> state`;
    returns (seconds/step, state).

    SKT_BENCH_TRACE=<dir>: additionally capture a jax.profiler trace of one
    post-warmup k-step call (parse with scripts/profile_bench.py
    --parse-only --outdir <dir> --k-steps <k>). This is how every bench
    config gets the per-op-class device-time budget, not just llama."""
    state = step(state)
    sync(state)
    trace_dir = os.environ.get("SKT_BENCH_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            state = step(state)
            sync(state)
        sys.stderr.write(f"bench trace (k_steps={k_steps}) -> {trace_dir}\n")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = step(state)
        sync(state)
        times.append((time.perf_counter() - t0) / k_steps)
    return float(np.median(times)), state


def run_bench_mla(args):
    """BASELINE config 3: DeepSeek-V2-Lite-dims MLA continuous-batching decode
    (mla_preprocess fusion + paged latent attention) on one chip.

    Dims per DeepSeek-V2-Lite (27 layers, hidden 2048, 16 heads, kv_lora 512,
    rope 64, nope 128, v_head 128, inter 10944); q_lora_rank=1536 is the V2
    value (Lite skips the q-LoRA, but the reference mla_preprocess op —
    csrc/mla_preprocess — hard-wires the 2-GEMM q path, so the bench keeps it)."""
    from sgl_kernel_npu_tpu.models import deepseek_mla as dm
    from sgl_kernel_npu_tpu.utils import get_device_properties

    props = get_device_properties()
    if args.smoke:
        cfg = dm.tiny_config()
        batch, ctx, k_steps, reps = 4, 64, 4, 2
    else:
        cfg = dm.MlaConfig(vocab_size=102400, hidden_size=2048, num_layers=27,
                           num_heads=16, kv_lora_rank=512, qk_rope_dim=64,
                           qk_nope_dim=128, v_head_dim=128, q_lora_rank=1536,
                           intermediate_size=10944, page_size=128)
        batch, ctx, k_steps, reps = args.batch, args.ctx, 16, 3
    ps = cfg.page_size
    total_new = k_steps * (1 + reps)
    max_pages = -(-(ctx + total_new) // ps)
    num_pages = batch * max_pages + 1

    params = dm.init_params(cfg, 0)
    fast = os.environ.get("SKT_MLA_FAST", "1") != "0"
    if fast:
        # the r5 fast path: pre-tiled closure-invariant banks + combined
        # latent cache + page-chunked mega-stream attention + deferred append
        # (models/deepseek_mla.py::decode_step_c). 1024-wide panels measured
        # best at the MLA shapes (12,638 -> 12,890 tok/s, 2026-08-21);
        # llama keeps its own 512 default.
        params = dm.pretile_mla_weights(
            params, cfg, block_n=int(os.environ.get("SKT_GEMM_BN", "1024")))
    elif os.environ.get("SKT_FUSED_RMSQ", "1") != "0":
        # fused RMSNormQuant->GEMM stages inside mla_preprocess
        params = dm.fuse_mla_weights(params)
    rng = np.random.default_rng(0)
    bt = jnp.array(
        rng.permutation(num_pages - 1)[: batch * max_pages]
        .reshape(batch, max_pages) + 1, jnp.int32)
    pos0 = jnp.full((batch,), ctx - 1, jnp.int32)
    ids0 = jnp.array(rng.integers(0, cfg.vocab_size, batch), jnp.int32)

    if fast:
        # SKT_MLA_KV: bf16 | int8 latent rows (int8 = the reference's
        # quantized-latent cache_mode 2, halving the dominant KV stream)
        kv_quant = os.environ.get("SKT_MLA_KV", "int8")
        kvc = dm.init_kv_cache_combined(cfg, num_pages, quant=kv_quant)

        def run_steps_fast(params, kvc, ids, pos):
            def body(_, carry):
                kvc, ids, pos = carry
                seq = pos + 1
                slots = (bt[jnp.arange(batch), pos // ps] * ps + pos % ps)
                logits, kvc = dm.decode_step_c(
                    params, cfg, kvc, ids, pos, seq, bt, slots)
                return kvc, jnp.argmax(logits, -1).astype(jnp.int32), pos + 1
            return jax.lax.fori_loop(0, k_steps, body, (kvc, ids, pos))

        stepk = jax.jit(run_steps_fast, donate_argnums=(1,))
        dt, _ = _median_step(
            lambda st: stepk(params, *st), k_steps, reps,
            (kvc, ids0, pos0),
            lambda st: int(np.asarray(st[1][0])))
    else:
        ckv, krope = dm.init_kv_cache(cfg, num_pages)

        def run_steps(params, ckv, krope, ids, pos):
            def body(_, carry):
                ckv, krope, ids, pos = carry
                seq = pos + 1
                slots = (bt[jnp.arange(batch), pos // ps] * ps + pos % ps)
                logits, ckv, krope = dm.decode_step(
                    params, cfg, ckv, krope, ids, pos, seq, bt, slots)
                return (ckv, krope, jnp.argmax(logits, -1).astype(jnp.int32),
                        pos + 1)
            return jax.lax.fori_loop(0, k_steps, body, (ckv, krope, ids, pos))

        stepk = jax.jit(run_steps, donate_argnums=(1, 2))
        dt, _ = _median_step(
            lambda st: stepk(params, *st), k_steps, reps,
            (ckv, krope, ids0, pos0),
            lambda st: int(np.asarray(st[2][0])))

    l, h = cfg.num_layers, cfg.hidden_size
    heads, qdim = cfg.num_heads, cfg.qk_nope_dim + cfg.qk_rope_dim
    w_int8 = l * (h * cfg.mm1_out + cfg.q_lora_rank * heads * qdim
                  + heads * cfg.v_head_dim * h + h * 2 * cfg.intermediate_size
                  + cfg.intermediate_size * h) + h * cfg.vocab_size
    w_f32 = l * (heads * cfg.qk_nope_dim * cfg.kv_lora_rank
                 + heads * cfg.kv_lora_rank * cfg.v_head_dim) * 4
    # KV bytes/token by the STORED layout: bf16 latent = 2 B/elt; the fast
    # path's combined cache pads the row to a lane multiple, and the int8
    # mode stores 1 B/elt + a 4 B/token scale — the roofline is honest for
    # the measured configuration
    if fast:
        row_elts = dm.combined_width(cfg)
        elt = 1 if os.environ.get("SKT_MLA_KV", "int8") == "int8" else 2
        row_bytes = row_elts * elt + (4 if elt == 1 else 0)
    else:
        row_bytes = (cfg.kv_lora_rank + cfg.qk_rope_dim) * 2
    kv_per_tok = l * row_bytes * (ctx + total_new // 2)
    roofline = props.hbm_gbps * 1e9 / ((w_int8 + w_f32) / batch + kv_per_tok)
    _emit("decode_tokens_per_s_per_chip_mla" + ("_smoke" if args.smoke else ""),
          batch / dt, roofline,
          {"batch": batch, "ctx": ctx, "step_ms": round(dt * 1e3, 3),
           "platform": props.platform})
    return 0


def run_bench_moe(args):
    """BASELINE config 4: single-chip fused-MoE decode layer at the per-chip
    share of a DeepSeek-V3-class EP=32 deployment (8 local experts,
    hidden 7168, moe_intermediate 2048, top-8, 128 decode tokens) — EP=1
    loopback so the chip runs the dispatch->GMM1->SwiGLU->GMM2->combine
    pipeline end-to-end (ref perf anchor: FUSED_DEEP_MOE.md:24).

    Also A/Bs chunk_rounds {1,2,4} — the comm/compute-overlap measurement
    (VERDICT r2 #4) — and reports the best."""
    from jax.sharding import Mesh
    from sgl_kernel_npu_tpu.parallel import Buffer
    from sgl_kernel_npu_tpu.utils import get_device_properties

    props = get_device_properties()
    if args.smoke:
        el, h, f, t, k = 4, 256, 128, 16, 2
    else:
        el, h, f, t, k = 8, 7168, 2048, 128, 8
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    buf = Buffer(mesh, el, num_max_dispatch_tokens_per_rank=t)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, h)) * 0.3, jnp.bfloat16)
    topk_idx = jnp.asarray(
        np.stack([rng.choice(el, k, replace=False) for _ in range(t)]),
        jnp.int32)
    topk_w = jnp.asarray(rng.random((t, k)), jnp.float32)
    w13q = jnp.asarray(rng.integers(-127, 128, (el, h, 2 * f)), jnp.int8)
    w13s = jnp.full((el, 2 * f), 2e-4, jnp.float32)
    w2q = jnp.asarray(rng.integers(-127, 128, (el, f, h)), jnp.int8)
    w2s = jnp.full((el, h), 2e-4, jnp.float32)

    # variants: XLA-scheduled fused shard at chunk_rounds 1/2/4, plus the
    # single-launch Pallas kernel (comm/compute overlapped IN-kernel — the
    # aclnnFusedDeepMoe analogue, strategies/fused_moe_pallas.py). The A/B
    # VERDICT r3 item 5 asks for: fused kernel vs the unfused composition.
    pbuf = Buffer(mesh, el, num_max_dispatch_tokens_per_rank=t,
                  low_latency_strategy="pallas")
    variants = {1: (buf, 1), 2: (buf, 2), 4: (buf, 4),
                "pallas_fused": (pbuf, 1)}
    results = {}
    for name, (b, rounds) in variants.items():
        def step(x):
            return b.fused_deep_moe(x, topk_idx, topk_w, w13q, w13s,
                                    w2q, w2s, chunk_rounds=rounds)
        try:
            out = step(x)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 — variant must not kill bench
            sys.stderr.write(f"moe variant {name} failed: {e}\n")
            continue
        # DEVICE time from a profiler trace: wall-clock of single sub-ms
        # calls through the axon tunnel under-measures by >10x (88 us wall
        # vs 1211 us device for the fused kernel, 2026-08-20)
        import glob as _glob
        import gzip as _gzip
        import tempfile
        td = tempfile.mkdtemp(prefix=f"moe_{name}_")
        loops = 6
        with jax.profiler.trace(td):
            for _ in range(loops):
                out = step(out.astype(jnp.bfloat16))
            jax.block_until_ready(out)
        try:
            fn = sorted(_glob.glob(td + "/**/*.trace.json.gz",
                                   recursive=True))[-1]
            tr = json.load(_gzip.open(fn, "rt"))
            spans = [e for e in tr["traceEvents"]
                     if e.get("ph") == "X"
                     and (e.get("name", "").startswith("fnp")
                          or e.get("name", "").startswith("fn"))
                     and "args" in e
                     and e.get("args", {}).get("hlo_category")]
            # fall back to summing all device XLA-op self time per call
            if spans:
                dt_v = sum(e["dur"] for e in spans) / loops / 1e6
            else:
                pid_ok = {e["pid"] for e in tr["traceEvents"]
                          if e.get("ph") == "M"
                          and e.get("name") == "process_name"
                          and "TPU" in e["args"].get("name", "")}
                tids = {(e["pid"], e["tid"]) for e in tr["traceEvents"]
                        if e.get("ph") == "M"
                        and e.get("name") == "thread_name"
                        and e["pid"] in pid_ok
                        and e["args"].get("name", "") == "XLA Ops"}
                top = [e for e in tr["traceEvents"]
                       if e.get("ph") == "X"
                       and (e.get("pid"), e.get("tid")) in tids]
                # spans nest; take per-call envelope = total extent / loops
                if top:
                    t0 = min(e["ts"] for e in top)
                    t1 = max(e["ts"] + e["dur"] for e in top)
                    dt_v = (t1 - t0) / loops / 1e6
                else:
                    dt_v = float("nan")
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"moe variant {name} trace parse: {e}\n")
            continue
        results[name] = dt_v

    best_rounds = min(results, key=results.get)
    dt = results[best_rounds]
    # speed-of-light: the expert weight stream (int8) + token payload traffic
    w_bytes = el * (h * 2 * f + f * h)
    tok_bytes = t * k * h * (1 + 2 + 2)   # int8 dispatch + bf16 ffn out + combine
    bound_s = (w_bytes + tok_bytes) / (props.hbm_gbps * 1e9)
    roofline = t / bound_s
    _emit("decode_tokens_per_s_per_chip_moe_ep1" +
          ("_smoke" if args.smoke else ""), t / dt, roofline,
          {"local_experts": el, "hidden": h, "inter": f, "topk": k,
           "step_us": round(dt * 1e6, 1), "platform": props.platform,
           "variant_us": {str(r): round(s * 1e6, 1)
                          for r, s in results.items()},
           "timing": "device (profiler trace)",
           "best_variant": str(best_rounds)})
    return 0


def run_bench_qwen(args):
    """BASELINE config 5: Qwen3-Next-class hybrid (GDN linear-attention +
    full-attention + sparse-MoE MLP) continuous-batching decode. Dims scaled
    to the per-chip share of the 80B model at TP=4 (hidden 2048, 12 hybrid
    layers 3:1, 8 v-heads x 128, 128 experts top-10 + shared) — the hybrid
    stack is the point here, not the exact 80B budget."""
    from sgl_kernel_npu_tpu.models import qwen_next as qn
    from sgl_kernel_npu_tpu.utils import get_device_properties

    props = get_device_properties()
    quant = os.environ.get("SKT_QWEN_QUANT", "1") != "0"
    if args.smoke:
        cfg = qn.QwenNextConfig()
        batch, k_steps, reps, ctx = 4, 4, 2, 64
    elif quant:
        # W8A8 engine (r5): int8 banks + grouped expert GMM + bf16 SSM state
        # restore the r3 dims (128 experts x 12 layers x 512 inter) — the
        # f32 weight set could never fit (19 GB of experts); int8 is ~5 GB
        cfg = qn.QwenNextConfig(
            vocab_size=32768, hidden_size=2048, num_layers=12,
            full_attention_interval=4,
            num_qk_heads=8, num_v_heads=8, head_qk_dim=128, head_v_dim=128,
            conv_width=4, chunk_size=64,
            num_heads=16, num_kv_heads=2, head_dim=128,
            page_size=128, num_experts=128, top_k=10,
            moe_intermediate_size=512, shared_intermediate_size=512,
            max_position=8192, num_loras=0, lora_rank=8)
        batch, k_steps, reps, ctx = args.batch, 8, 3, args.ctx
    else:
        # legacy f32 config (SKT_QWEN_QUANT=0): scaled to fit 16 GB in f32
        cfg = qn.QwenNextConfig(
            vocab_size=32768, hidden_size=2048, num_layers=8,
            full_attention_interval=4,
            num_qk_heads=8, num_v_heads=8, head_qk_dim=128, head_v_dim=128,
            conv_width=4, chunk_size=64,
            num_heads=16, num_kv_heads=2, head_dim=128,
            page_size=128, num_experts=64, top_k=10,
            moe_intermediate_size=512, shared_intermediate_size=512,
            max_position=8192, num_loras=0, lora_rank=8)
        batch, k_steps, reps, ctx = args.batch, 8, 3, args.ctx
    ps = cfg.page_size
    total_new = k_steps * (1 + reps)
    max_pages = -(-(ctx + total_new) // ps)
    num_pages = batch * max_pages + 1

    if quant and not args.smoke:
        params = qn.init_params_q(cfg, 0)
        state = qn.init_state(cfg, batch, num_pages, ssm_dtype=jnp.bfloat16)
        step_fn = qn.decode_step_q
    else:
        params = qn.init_params(cfg, 0)
        state = qn.init_state(cfg, batch, num_pages)
        step_fn = qn.decode_step
    rng = np.random.default_rng(0)
    bt = jnp.array(
        rng.permutation(num_pages - 1)[: batch * max_pages]
        .reshape(batch, max_pages) + 1, jnp.int32)
    pos0 = jnp.full((batch,), ctx - 1, jnp.int32)
    ids0 = jnp.array(rng.integers(0, cfg.vocab_size, batch), jnp.int32)

    def run_steps(params, state, ids, pos):
        def body(_, carry):
            state, ids, pos = carry
            seq = pos + 1
            slots = (bt[jnp.arange(batch), pos // ps] * ps + pos % ps)
            logits, state = step_fn(params, cfg, state, ids, pos, seq,
                                           bt, slots)
            return state, jnp.argmax(logits, -1).astype(jnp.int32), pos + 1
        return jax.lax.fori_loop(0, k_steps, body, (state, ids, pos))

    stepk = jax.jit(run_steps, donate_argnums=(1,))
    dt, _ = _median_step(
        lambda st: stepk(params, *st), k_steps, reps, (state, ids0, pos0),
        lambda st: int(np.asarray(st[1][0])))

    # weight stream (actual dtypes: int8 banks in the quantized engine, f32
    # in the legacy config) + KV/SSM state traffic
    w_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                  for a in jax.tree.leaves(params)) \
        - int(np.prod(params["embed"].shape)) * params["embed"].dtype.itemsize
    kv_per_tok = cfg.num_attn_layers * 2 * cfg.num_kv_heads * cfg.head_dim \
        * 2 * (ctx + total_new // 2)
    ssm_elt = state["ssm"].dtype.itemsize
    ssm_per_req = cfg.num_gdn_layers * cfg.num_v_heads * cfg.head_qk_dim \
        * cfg.head_v_dim * ssm_elt * 2   # read+write SSM state
    roofline = props.hbm_gbps * 1e9 / (
        w_bytes / batch + kv_per_tok + ssm_per_req)
    _emit("decode_tokens_per_s_per_chip_qwen_next_hybrid" +
          ("_smoke" if args.smoke else ""), batch / dt, roofline,
          {"batch": batch, "ctx": ctx, "step_ms": round(dt * 1e3, 3),
           "layers": cfg.num_layers, "platform": props.platform})
    return 0


if __name__ == "__main__":
    sys.exit(main())
