#!/usr/bin/env python
"""Trace the OFFICIAL bench decode step (bench.py config: pretiled banks,
token-major pages, k-step fori loop) and print a per-op time budget.

Usage:
  python scripts/profile_bench.py [--batch 128] [--ctx 256] [--outdir DIR]
  python scripts/profile_bench.py --parse-only --outdir DIR

The budget comes from the XLA-op track of the trace: per-op-name total µs
across one stepk call, divided by k_steps -> µs/step/op-class. This is the
tool for the ROADMAP "close the roofline gap" campaign — standalone kernel
sweeps mismeasure (84 vs 585 GB/s, see ops/matmul.py notes); only in-model
timelines count.
"""

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def capture(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgl_kernel_npu_tpu.models import llama

    cfg = llama.LlamaConfig(
        int8_kv=True, page_size=int(os.environ.get("SKT_PAGE_SIZE", "512")))
    ps = cfg.page_size
    k_steps = args.k_steps
    max_pages = -(-(args.ctx + 2 * k_steps) // ps)
    num_pages = args.batch * max_pages + 1

    params = llama.init_params(cfg, 0)
    if os.environ.get("SKT_GEMM_TILED", "1") != "0":
        params = llama.pretile_big_weights(params)
    kv = llama.init_kv_cache(
        cfg, num_pages,
        layout=os.environ.get(
            "SKT_KV_LAYOUT", "tm2" if llama.tm_layout_ok(cfg) else "hm"))

    rng = np.random.default_rng(0)
    bt = jnp.array(
        rng.permutation(num_pages - 1)[: args.batch * max_pages]
        .reshape(args.batch, max_pages) + 1, jnp.int32)
    pos0 = jnp.full((args.batch,), args.ctx - 1, jnp.int32)
    ids0 = jnp.array(rng.integers(0, cfg.vocab_size, args.batch), jnp.int32)

    def run_steps(params, kv, ids, pos):
        def body(_, carry):
            kv, ids, pos = carry
            seq = pos + 1
            slots = (bt[jnp.arange(args.batch), pos // ps] * ps + pos % ps)
            logits, kv = llama.decode_step_kv(params, cfg, kv, ids, pos, seq,
                                              bt, slots)
            ids = jnp.argmax(logits, -1).astype(jnp.int32)
            return kv, ids, pos + 1
        return jax.lax.fori_loop(0, k_steps, body, (kv, ids, pos))

    stepk = jax.jit(run_steps, donate_argnums=(1,))
    kv, ids, pos = stepk(params, kv, ids0, pos0)
    int(np.asarray(ids[0]))
    with jax.profiler.trace(args.outdir):
        kv, ids, pos = stepk(params, kv, ids, pos)
        int(np.asarray(ids[0]))
    print("trace ->", args.outdir)


def parse(outdir, k_steps):
    files = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    assert files, f"no trace under {outdir}"
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # keep ONLY the leaf "XLA Ops" thread track — the device pid also carries
    # "XLA Modules" / "Steps" parent spans that nest over the ops and would
    # double-count every op if summed per-pid
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "XLA" in n}
    op_tids = {(e["pid"], e["tid"])
               for e in events if e.get("ph") == "M"
               and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and e["args"].get("name", "") == "XLA Ops"}
    assert op_tids, f"no 'XLA Ops' track in trace (pids={pid_names})"
    # SELF time per op: the ops track nests container spans (`while`,
    # `closed_call`, the fori-loop body call) over their member ops —
    # summing raw durations double-counts every nested op and reports the
    # whole step as "while" (observed 2026-08-20). Stack-walk each thread's
    # spans and subtract children from parents.
    per_tid = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        per_tid[(e["pid"], e["tid"])].append(
            (float(e["ts"]), float(e.get("dur", 0.0)), e.get("name", "")))
    per_op = defaultdict(float)
    total = 0.0

    def _self_times(evs):
        evs.sort(key=lambda t: (t[0], -t[1]))
        out = []
        stack = []  # [start, end, name, child_total]
        for ts, dur, name in evs:
            while stack and ts >= stack[-1][1] - 1e-9:
                s, e_, nm, ch = stack.pop()
                out.append((nm, max(0.0, (e_ - s) - ch)))
                if stack:
                    stack[-1][3] += e_ - s
            stack.append([ts, ts + dur, name, 0.0])
        while stack:
            s, e_, nm, ch = stack.pop()
            out.append((nm, max(0.0, (e_ - s) - ch)))
            if stack:
                stack[-1][3] += e_ - s
        return out

    for evs in per_tid.values():
        for name, self_us in _self_times(evs):
            cls = re.sub(r"[.\d]+$", "", name)
            per_op[cls] += self_us
            total += self_us
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"{'op class':48s} {'us/step':>10s} {'%':>6s}")
    for name, dur in rows[:40]:
        print(f"{name:48s} {dur / k_steps:10.1f} {100 * dur / total:6.2f}")
    print(f"{'TOTAL (device-lane busy)':48s} {total / k_steps:10.1f}")

    # per-KERNEL breakdown: closed_call events carry the custom-call's
    # output shape + bytes_accessed in long_name/args — label each pallas
    # kernel and compute its achieved bandwidth (the trustworthy in-loop
    # per-op record; standalone sweeps mismeasure, ops/matmul.py notes)
    kern = defaultdict(lambda: [0.0, 0, 0])
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        n = e.get("name", "")
        if not n.startswith("closed_call"):
            continue
        ln = e.get("args", {}).get("long_name", "")
        m = re.search(r"= (\S+?)\{", ln)
        shape = m.group(1) if m else "?"
        key = (n.split(".")[1] if "." in n else n, shape)
        kern[key][0] += e.get("dur", 0.0)
        kern[key][1] += 1
        kern[key][2] = int(e.get("args", {}).get("bytes_accessed", 0))
    krows = []
    print(f"\n{'pallas kernel (out shape)':36s} {'us/step':>9s} "
          f"{'us/call':>9s} {'GB/s':>7s}")
    for (idx, shape), (dur, cnt, ba) in sorted(
            kern.items(), key=lambda kv: -kv[1][0]):
        per_call = dur / max(cnt, 1)
        bw = ba / (per_call * 1e-6) / 1e9 if per_call else 0.0
        print(f"cc.{idx:>4s} {shape:28s} {dur / k_steps:9.1f} "
              f"{per_call:9.1f} {bw:7.0f}")
        krows.append({"cc": idx, "out_shape": shape,
                      "us_per_step": round(dur / k_steps, 1),
                      "us_per_call": round(per_call, 1),
                      "gbps": round(bw, 1)})
    out_json = os.environ.get("SKT_PERF_JSON")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"k_steps": k_steps,
                       "total_us_per_step": round(total / k_steps, 1),
                       "op_classes": {n: round(d / k_steps, 1)
                                      for n, d in rows},
                       "kernels": krows}, f, indent=1)
        print(f"perf json -> {out_json}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--k-steps", type=int, default=32)
    ap.add_argument("--outdir", default="/tmp/skt_bench_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args)
    parse(args.outdir, args.k_steps)


if __name__ == "__main__":
    main()
