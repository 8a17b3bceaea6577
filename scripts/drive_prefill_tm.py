"""Chip drive: tm prefill kernel at 8B dims + tm batched prefill + decode."""
import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ["SKT_IMPL"] = "pallas"
import jax, jax.numpy as jnp
from sgl_kernel_npu_tpu.models import llama

cfg = llama.LlamaConfig(int8_kv=True)   # 8B: d=128, ps=128
s, t = 2, 256
ps = cfg.page_size
mp = 6
num_pages = s * mp + 1
params = llama.init_params(cfg, 0)
kv = llama.init_kv_cache(cfg, num_pages, layout="tm")
rng = np.random.default_rng(0)
bts = jnp.asarray(1 + np.arange(s * mp).reshape(s, mp), jnp.int32)
lens = [256, 200]
ids = np.zeros((s, t), np.int32)
slp = np.full((s, t), -1, np.int32)
pos = np.zeros((s, t), np.int32)
for si, n in enumerate(lens):
    ids[si, :n] = rng.integers(0, cfg.vocab_size, n)
    p = np.arange(n)
    slp[si, :n] = np.asarray(bts)[si, p // ps] * ps + p % ps
    pos[si, :n] = p
args = (jnp.array(ids), jnp.array(lens, jnp.int32), jnp.array(pos),
        jnp.array(slp), bts, jnp.zeros(s, jnp.int32))
f = jax.jit(lambda kv, *a: llama.prefill_batch_step_kv(params, cfg, kv, *a),
            donate_argnums=(0,))
t0 = time.time()
lg, kv = f(kv, *args)
v = float(np.asarray(lg[0, lens[0]-1]).max())
print(f"chunk1 ok ({time.time()-t0:.1f}s) logit max {v:.3f}")
# second chunk with prefix
ids2 = np.zeros((s, 128), np.int32)
slp2 = np.full((s, 128), -1, np.int32)
pos2 = np.zeros((s, 128), np.int32)
ids2[0] = rng.integers(0, cfg.vocab_size, 128)
p = np.arange(256, 384)
slp2[0] = np.asarray(bts)[0, p // ps] * ps + p % ps
pos2[0] = p
lg2, kv = jax.jit(lambda kv: llama.prefill_batch_step_kv(
    params, cfg, kv, jnp.array(ids2), jnp.array([128, 0], jnp.int32),
    jnp.array(pos2), jnp.array(slp2), bts, jnp.array([256, 200], jnp.int32)),
    donate_argnums=(0,))(kv)
print("chunk2 ok", float(np.asarray(lg2[0, -1]).max()))
# decode step off the tm prefill
seq = jnp.array([385, 201], jnp.int32)
dpos = seq - 1
dslots = jnp.array([int(np.asarray(bts)[0, 384 // ps] * ps + 384 % ps),
                    int(np.asarray(bts)[1, 200 // ps] * ps + 200 % ps)], jnp.int32)
dids = jnp.array([1, 2], jnp.int32)
dl, kv = jax.jit(lambda kv: llama.decode_step_kv(
    params, cfg, kv, dids, dpos, seq, bts, dslots), donate_argnums=(0,))(kv)
print("decode ok", float(np.asarray(dl[0]).max()))
print("ALL OK")
