"""Real-TPU drive for the paged flash prefill kernel (verify recipe #1).

Compiles the kernel at production shapes (D=128, ps=128, bf16 + int8 cache),
checks against the dense XLA path, and measures the block-sparse speedup
(compute must scale with selected pages)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops.attention import paged_prefill
from sgl_kernel_npu_tpu.ops.attention.decode_v3 import (
    reshape_and_cache_gqa_page_major,
)

HKV, G, D, PS = 8, 4, 128, 128
HQ = HKV * G
SCALE = D ** -0.5


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    prefix_len, t = 3 * PS, 512
    L = prefix_len + t
    max_pages = -(-L // PS)
    num_pages = max_pages + 2

    kfull = jnp.asarray(rng.standard_normal((L, HKV, D)) * 0.5, jnp.bfloat16)
    vfull = jnp.asarray(rng.standard_normal((L, HKV, D)) * 0.5, jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(num_pages)[:max_pages], jnp.int32)
    slots = bt[jnp.arange(L) // PS] * PS + jnp.arange(L) % PS
    kc = jnp.zeros((num_pages, HKV, PS, D), jnp.bfloat16)
    vc = jnp.zeros((num_pages, HKV, PS, D), jnp.bfloat16)
    kc, vc = reshape_and_cache_gqa_page_major(kfull, vfull, kc, vc, slots)
    q = jnp.asarray(rng.standard_normal((t, HQ, D)) * 0.5, jnp.bfloat16)

    run = jax.jit(lambda q, kc, vc, plen: paged_prefill.paged_prefill_attention(
        q, (kc, vc), bt, plen, SCALE, PS))
    t0 = time.time()
    out = run(q, kc, vc, jnp.int32(prefix_len)).block_until_ready()
    print(f"dense-causal compile+run: {time.time()-t0:.1f}s")

    # XLA golden
    def golden():
        kg = kc[bt].transpose(1, 0, 2, 3).reshape(HKV, max_pages * PS, D)
        vg = vc[bt].transpose(1, 0, 2, 3).reshape(HKV, max_pages * PS, D)
        qh = q.reshape(t, HKV, G, D).astype(jnp.float32)
        s = jnp.einsum("thgd,hnd->hgtn", qh, kg.astype(jnp.float32)) * SCALE
        ok = (jnp.arange(max_pages * PS)[None, :]
              < prefix_len + 1 + jnp.arange(t)[:, None])
        s = jnp.where(ok[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("hgtn,hnd->thgd", p, vg.astype(jnp.float32))
        return att.reshape(t, HQ, D)

    ref = jax.jit(golden)().block_until_ready()
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(f"max abs diff vs XLA dense: {diff:.4f}")
    assert diff < 0.05, diff

    # block-sparse: keep 25% of pages -> time must drop materially
    nq = -(-t // PS)
    mask = np.zeros((nq, max_pages), bool)
    for i in range(nq):
        lim = (prefix_len + (i + 1) * PS - 1) // PS
        mask[i, lim] = True          # diagonal
        mask[i, 0] = True            # sink
    sparse_fn = jax.jit(lambda q, kc, vc, plen: paged_prefill.block_sparse_paged_attention(
        q, (kc, vc), bt, jnp.asarray(mask), plen, SCALE, PS))
    t0 = time.time()
    sout = sparse_fn(q, kc, vc, jnp.int32(prefix_len)).block_until_ready()
    print(f"block-sparse compile+run: {time.time()-t0:.1f}s")
    assert np.all(np.isfinite(np.asarray(sout, np.float32)))

    def timeit(f, *a, reps=20):
        f(*a).block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            o = f(*a)
        o.block_until_ready()
        return (time.time() - t0) / reps

    td = timeit(run, q, kc, vc, jnp.int32(prefix_len))
    ts = timeit(sparse_fn, q, kc, vc, jnp.int32(prefix_len))
    print(f"dense {td*1e3:.3f} ms  sparse(2/{max_pages} pages/tile) {ts*1e3:.3f} ms  "
          f"speedup {td/ts:.2f}x")
    print("OK")


if __name__ == "__main__":
    main()
