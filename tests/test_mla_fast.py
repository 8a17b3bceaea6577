"""Fast MLA decode path (combined latent cache + decode_mla_v2 + pretiled
banks) — kernel-vs-ref parity and model fast-vs-reference trajectories.

Reference semantics: paged MLA decode (decode_attention.py:5-231) and the
mla_preprocess pipeline (csrc/mla_preprocess); SURVEY §3.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import deepseek_mla as dm
from sgl_kernel_npu_tpu.ops.attention import decode_mla_v2 as v2

from .utils import calc_diff


def _mk_case(rng, b=4, h=4, lkv=64, lrope=16, ps=16, max_pages=3, layers=2):
    c = lkv + lrope
    num_pages = b * max_pages + 1
    cache = jnp.asarray(rng.standard_normal(
        (layers, num_pages, ps, c)) * 0.3, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, h, c)) * 0.5, jnp.bfloat16)
    new = jnp.asarray(rng.standard_normal((b, c)) * 0.3, jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(num_pages - 1)[: b * max_pages]
                     .reshape(b, max_pages) + 1, jnp.int32)
    cached = jnp.asarray(rng.integers(0, max_pages * ps, b), jnp.int32)
    return q, new, cache, cached, bt, ps, lkv


def test_decode_mla_v2_kernel_vs_ref(rng, monkeypatch):
    monkeypatch.setenv("SKT_IMPL", "pallas")
    q, new, cache, cached, bt, ps, lkv = _mk_case(rng)
    for li in (0, 1):
        out = v2.decode_mla_pallas_v2_defer(
            q, new, cache, cached, bt, 0.1, ps, lkv, layer_idx=li)
        ref = v2.decode_mla_v2_ref(
            q, cache, new, cached, bt, 0.1, ps, lkv, layer_idx=li)
        assert calc_diff(out, ref) < 1e-4, (li, calc_diff(out, ref))


def test_decode_mla_v2_kernel_zero_prefix(rng, monkeypatch):
    """cached_lens=0: only the folded current token contributes."""
    monkeypatch.setenv("SKT_IMPL", "pallas")
    q, new, cache, _, bt, ps, lkv = _mk_case(rng)
    zero = jnp.zeros((q.shape[0],), jnp.int32)
    out = v2.decode_mla_pallas_v2_defer(q, new, cache, zero, bt, 0.1, ps, lkv)
    ref = v2.decode_mla_v2_ref(q, cache, new, zero, bt, 0.1, ps, lkv)
    assert calc_diff(out, ref) < 1e-4
    # with a zero prefix the output IS the new latent row (softmax of one)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.broadcast_to(np.asarray(new[:, None, :lkv], np.float32), out.shape),
        rtol=2e-2, atol=2e-2)


def test_append_mla_pallas_vs_ref(rng, monkeypatch):
    monkeypatch.setenv("SKT_IMPL", "pallas")
    layers, b, c, ps, num_pages = 3, 5, 80, 16, 9
    cache = jnp.asarray(rng.standard_normal(
        (layers, num_pages, ps, c)), jnp.bfloat16)
    new = jnp.asarray(rng.standard_normal((layers, b, c)), jnp.bfloat16)
    pages = jnp.asarray([1, 3, 8, num_pages, 5], jnp.int32)  # one dropped
    offs = jnp.asarray(rng.integers(0, ps, b), jnp.int32)
    out = v2.append_mla_pallas(new, cache, pages, offs)
    ref = v2.append_mla_ref(new, cache, pages, offs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_mla_fast_decode_matches_slow(rng, monkeypatch, impl):
    """The fast combined-cache decode must track the reference decode_step
    trajectory (same weights, same greedy ids) within mixed-precision
    tolerance: the fast path stores wuk/wuv in bf16 and runs fused
    rmsq/stacked GEMMs, so logits match loosely but argmax ids must agree on
    a smooth random model."""
    monkeypatch.setenv("SKT_IMPL", impl)
    cfg = dm.tiny_config()
    params = dm.init_params(cfg)
    params = dm.fuse_mla_weights(params)
    params = dm.pretile_mla_weights(params, cfg)
    b, mp_ = 8, 3
    num_pages = b * mp_ + 1
    ckv, krope = dm.init_kv_cache(cfg, num_pages)
    kvc = dm.init_kv_cache_combined(cfg, num_pages)
    bt = jnp.asarray(rng.permutation(num_pages - 1)[: b * mp_]
                     .reshape(b, mp_) + 1, jnp.int32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
    ids_f = ids
    ps = cfg.page_size

    slow = jax.jit(lambda p, c, k, i, po, s, bt_, sm: dm.decode_step(
        p, cfg, c, k, i, po, s, bt_, sm))
    fast = jax.jit(lambda p, c, i, po, s, bt_, sm: dm.decode_step_c(
        p, cfg, c, i, po, s, bt_, sm))

    for n in range(1, 5):
        seq = jnp.full((b,), n, jnp.int32)
        pos = seq - 1
        slots = bt[jnp.arange(b), pos // ps] * ps + pos % ps
        logits_s, ckv, krope = slow(params, ckv, krope, ids, pos, seq, bt,
                                    slots)
        logits_f, kvc = fast(params, kvc, ids_f, pos, seq, bt, slots)
        d = calc_diff(logits_f, logits_s)
        assert d < 2e-3, (n, d)
        # drive BOTH paths with the slow path's greedy ids so the caches stay
        # comparable (random logits have near-ties that bf16 wuk/wuv can flip)
        ids = jnp.argmax(logits_s, -1).astype(jnp.int32)
        ids_f = ids
        match = (np.asarray(jnp.argmax(logits_f, -1)) == np.asarray(ids)).mean()
        assert match >= 0.75, (n, match)

    # combined cache contents must equal the split caches (ctkv | krope);
    # the lane-pad region stays zero
    c = cfg.kv_lora_rank + cfg.qk_rope_dim
    comb = np.concatenate([np.asarray(ckv, np.float32),
                           np.asarray(krope, np.float32)], -1)
    kvc_np = np.asarray(kvc, np.float32)
    assert calc_diff(kvc_np[..., :c], comb) < 2e-3
    assert np.abs(kvc_np[..., c:]).sum() == 0


def test_decode_mla_v3_grouped_vs_ref(rng, monkeypatch):
    """Group-batched kernel (G sequences per step) vs the XLA twin, at G
    dividing and not dividing the batch (fallback path)."""
    monkeypatch.setenv("SKT_IMPL", "pallas")
    q, new, cache, cached, bt, ps, lkv = _mk_case(rng, b=8)
    for g in (4, 2, 8):
        out = v2.decode_mla_pallas_v3_defer(
            q, new, cache, cached, bt, 0.1, ps, lkv, layer_idx=1, group=g)
        ref = v2.decode_mla_v2_ref(
            q, cache, new, cached, bt, 0.1, ps, lkv, layer_idx=1)
        assert calc_diff(out, ref) < 1e-4, (g, calc_diff(out, ref))
    # odd batch falls back to the per-sequence kernel
    q5, new5, cache5, cached5, bt5 = (a[:5] for a in (q, new, cache, cached,
                                                      bt))
    out = v2.decode_mla_pallas_v3_defer(
        q5, new5, cache, cached5, bt5, 0.1, ps, lkv, group=8)
    ref = v2.decode_mla_v2_ref(q5, cache, new5, cached5, bt5, 0.1, ps, lkv)
    assert calc_diff(out, ref) < 1e-4


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_mla_fast_decode_int8_latent(rng, monkeypatch, impl):
    """INT8 combined latent cache (the reference's quantized-latent
    cache_mode): logits must track the bf16-cache fast path within
    quantization tolerance across a greedy trajectory."""
    monkeypatch.setenv("SKT_IMPL", impl)
    cfg = dm.tiny_config()
    params = dm.pretile_mla_weights(dm.init_params(cfg), cfg)
    b, mp_ = 8, 3
    num_pages = b * mp_ + 1
    kv16 = dm.init_kv_cache_combined(cfg, num_pages)
    kv8 = dm.init_kv_cache_combined(cfg, num_pages, quant="int8")
    bt = jnp.asarray(rng.permutation(num_pages - 1)[: b * mp_]
                     .reshape(b, mp_) + 1, jnp.int32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
    ps = cfg.page_size
    fast = jax.jit(lambda p, c, i, po, s, bt_, sm: dm.decode_step_c(
        p, cfg, c, i, po, s, bt_, sm))

    for n in range(1, 5):
        seq = jnp.full((b,), n, jnp.int32)
        pos = seq - 1
        slots = bt[jnp.arange(b), pos // ps] * ps + pos % ps
        l16, kv16 = fast(params, kv16, ids, pos, seq, bt, slots)
        l8, kv8 = fast(params, kv8, ids, pos, seq, bt, slots)
        d = calc_diff(l8, l16)
        assert d < 5e-3, (n, d)
        assert np.all(np.isfinite(np.asarray(l8)))
        ids = jnp.argmax(l16, -1).astype(jnp.int32)
    # scales landed for the written slots
    assert float(jnp.sum(kv8["s"])) > 0
