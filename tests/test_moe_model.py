"""DeepSeek-V3-class MoE decode step over the 8-virtual-device EP mesh,
cross-checked against a single-device dense-MoE reference."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgl_kernel_npu_tpu.models import moe

from .utils import calc_diff

R = 8


def _dense_reference(params, cfg, kc, vc, ids, pos, seq, bt, slots):
    """Same math, no EP: dense per-expert loop in numpy-like jnp."""
    from sgl_kernel_npu_tpu.models.moe import _rms
    from sgl_kernel_npu_tpu.ops.attention.decode import decode_gqa_ref
    from sgl_kernel_npu_tpu.ops.kvcache import reshape_and_cache_gqa
    from sgl_kernel_npu_tpu.ops.rope import apply_rope

    b = ids.shape[0]
    nq, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][ids]
    cs = params["cos_sin"][pos]
    cos, sin = cs[:, : d // 2], cs[:, d // 2:]
    for li in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        h1 = _rms(x, lp["in_norm"], cfg.rms_eps)
        qkv = h1 @ lp["wqkv"]
        q = apply_rope(qkv[:, : nq * d].reshape(b, nq, d), cos[:, None], sin[:, None])
        k = apply_rope(qkv[:, nq * d:(nq + nkv) * d].reshape(b, nkv, d),
                       cos[:, None], sin[:, None])
        v = qkv[:, (nq + nkv) * d:].reshape(b, nkv, d)
        kc_l, vc_l = reshape_and_cache_gqa(k, v, kc[li], vc[li], slots)
        att = decode_gqa_ref(q, kc_l, vc_l, seq, bt, 1.0 / d ** 0.5, cfg.page_size)
        x = x + att.reshape(b, -1) @ lp["wo"]
        kc = kc.at[li].set(kc_l)
        vc = vc.at[li].set(vc_l)

        h2 = _rms(x, lp["post_norm"], cfg.rms_eps)
        logits = h2 @ lp["router"]
        topk_w, topk_i = jax.lax.top_k(jax.nn.softmax(logits, -1), cfg.top_k)
        topk_w = topk_w / jnp.sum(topk_w, -1, keepdims=True)

        # dense int8 MoE: dequantize weights, loop experts
        routed = jnp.zeros_like(h2)
        f = cfg.moe_intermediate
        for e in range(cfg.num_experts):
            w13 = lp["w13"]["q"][e].astype(jnp.float32) * lp["w13"]["scale"][e][None, :]
            w2 = lp["w2"]["q"][e].astype(jnp.float32) * lp["w2"]["scale"][e][None, :]
            ug = h2 @ w13
            act = ug[:, :f] * jax.nn.sigmoid(ug[:, :f]) * ug[:, f:]
            fe = act @ w2
            wgt = jnp.sum(jnp.where(topk_i == e, topk_w, 0.0), axis=1, keepdims=True)
            routed = routed + wgt * fe
        ug = h2 @ lp["shared_w13"]
        fs = cfg.shared_intermediate
        shared = (ug[:, :fs] * jax.nn.sigmoid(ug[:, :fs]) * ug[:, fs:]) @ lp["shared_w2"]
        x = x + routed + shared
    x = _rms(x, params["final_norm"], cfg.rms_eps)
    return x @ params["lm_head"]


def test_moe_decode_step_matches_dense(rng):
    cfg = moe.MoEConfig()
    params = moe.init_params(cfg)
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))

    per_rank = 4          # tokens per rank
    total = R * per_rank
    mp_ = 2
    pages_per_rank = per_rank * mp_ + 1
    kc, vc = moe.init_kv_cache(cfg, R * pages_per_rank)

    # rank-local block tables (local page ids), identical layout per rank
    bt_local = np.stack([
        rng.permutation(pages_per_rank - 1)[:mp_] + 1 for _ in range(total)
    ]).astype(np.int32)
    seq = np.tile(np.array([1, 7, 15, 30], np.int32), R)
    pos = seq - 1
    slots = bt_local[np.arange(total), pos // cfg.page_size] * cfg.page_size \
        + pos % cfg.page_size
    ids = rng.integers(0, cfg.vocab_size, total).astype(np.int32)

    step, pspecs = moe.make_decode_step(mesh, cfg, max_tokens=per_rank)
    sharded_params = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, pspecs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    logits, kc2, vc2 = step(
        sharded_params, kc, vc, jnp.array(ids), jnp.array(pos), jnp.array(seq),
        jnp.array(bt_local), jnp.array(slots),
    )
    assert logits.shape == (total, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))

    # single-rank dense reference, rank by rank
    for rk in range(R):
        sl = slice(rk * per_rank, (rk + 1) * per_rank)
        kc_r = jnp.array(np.zeros((cfg.num_layers, cfg.num_kv_heads,
                                   pages_per_rank, cfg.page_size, cfg.head_dim),
                                  np.float32))
        ref = _dense_reference(
            params, cfg, kc_r, kc_r, jnp.array(ids[sl]), jnp.array(pos[sl]),
            jnp.array(seq[sl]), jnp.array(bt_local[sl]), jnp.array(slots[sl]))
        diff = calc_diff(np.asarray(logits)[sl], np.asarray(ref))
        assert diff < 5e-3, f"rank {rk}: {diff}"


def test_deepseek_v3_decode_step(rng):
    """DeepSeek-V3-class: MLA attention + EP MoE runs on the mesh, finite,
    and the MLA latent caches update."""
    from sgl_kernel_npu_tpu.models import deepseek_v3 as dsv3

    cfg = dsv3.DeepSeekV3Config()
    params = dsv3.init_params(cfg)
    mesh = Mesh(np.array(jax.devices()[:R]), ("ep",))
    per_rank, mp_ = 4, 2
    total = R * per_rank
    pages_per_rank = per_rank * mp_ + 1
    ckv, kr = dsv3.init_kv_cache(cfg, R * pages_per_rank)

    bt = np.stack([rng.permutation(pages_per_rank - 1)[:mp_] + 1
                   for _ in range(total)]).astype(np.int32)
    seq = np.tile(np.array([1, 5, 9, 17], np.int32), R)
    pos = seq - 1
    slots = bt[np.arange(total), pos // cfg.page_size] * cfg.page_size \
        + pos % cfg.page_size
    ids = rng.integers(0, cfg.vocab_size, total).astype(np.int32)

    step, pspecs = dsv3.make_decode_step(mesh, cfg, max_tokens=per_rank)
    sharded = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, pspecs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray))
    logits, ckv2, kr2 = step(sharded, ckv, kr, jnp.array(ids), jnp.array(pos),
                             jnp.array(seq), jnp.array(bt), jnp.array(slots))
    assert logits.shape == (total, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.abs(np.asarray(ckv2) - np.asarray(ckv)).sum() > 0
