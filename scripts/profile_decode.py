#!/usr/bin/env python
"""Capture a jax.profiler trace of the decode step on the TPU.

Usage (on a machine with the chip):
  python scripts/profile_decode.py [--batch 64] [--ctx 256] [--v4] \
      [--outdir /tmp/skt_trace]
Open the trace with TensorBoard or Perfetto (trace.json.gz inside outdir).

This is the tool for attacking ROADMAP perf item 3: the per-step time budget
(matmuls vs attention vs copies) comes straight from the trace timeline.
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--bf16-kv", dest="int8_kv", action="store_false",
                    default=True)
    ap.add_argument("--outdir", default="/tmp/skt_trace")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sgl_kernel_npu_tpu.models import llama

    cfg = llama.LlamaConfig(int8_kv=args.int8_kv)
    ps = cfg.page_size
    max_pages = -(-args.ctx // ps)
    num_pages = args.batch * max_pages + 1
    params = llama.init_params(cfg, 0)
    kv = llama.init_kv_cache(cfg, num_pages)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, args.batch), jnp.int32)
    seq = jnp.full((args.batch,), args.ctx, jnp.int32)
    pos = seq - 1
    bt = jnp.asarray(
        1 + np.arange(args.batch * max_pages).reshape(args.batch, max_pages),
        jnp.int32)
    slots = bt[jnp.arange(args.batch), pos // ps] * ps + pos % ps

    step = jax.jit(lambda p, kv, i, po, sq, b_, sm: llama.decode_step_kv(
        p, cfg, kv, i, po, sq, b_, sm))
    logits, kv = step(params, kv, ids, pos, seq, bt, slots)  # compile
    _ = np.asarray(logits[0, :8])                            # forced sync

    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            logits, kv = step(params, kv, ids, pos, seq, bt, slots)
        _ = np.asarray(logits[0, :8])
    print("trace written to", args.outdir)


if __name__ == "__main__":
    main()
