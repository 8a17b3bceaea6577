"""Quantized Qwen-Next engine (W8A8 banks + grouped expert GEMM + bf16 SSM
state) — fast-vs-f32 trajectory parity and the quantize-at-load transform.

Reference semantics: the W8A8 MoE core of fused_deep_moe
(csrc/deepep/ops/op_kernel/fused_deep_moe.h:59-95) + swiglu_quant.py; the
hybrid model layout follows HF Qwen3NextForCausalLM (models/qwen_next.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import qwen_next as qn

from .utils import calc_diff


def _setup(rng, cfg, b=4, mp_=3):
    num_pages = b * mp_ + 1
    bt = jnp.asarray(rng.permutation(num_pages - 1)[: b * mp_]
                     .reshape(b, mp_) + 1, jnp.int32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, b), jnp.int32)
    return num_pages, bt, ids


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_qwen_quantized_tracks_f32(rng, monkeypatch, impl):
    """quantize_qwen_weights(init f32 params) -> decode_step_q must track the
    f32 decode_step trajectory loosely (int8 weights) and produce the same
    cache/state structure."""
    monkeypatch.setenv("SKT_IMPL", impl)
    cfg = qn.QwenNextConfig()
    params32 = qn.init_params(cfg)
    import copy
    paramsq = qn.quantize_qwen_weights(
        copy.deepcopy(jax.tree.map(lambda a: a, params32)), cfg)
    b = 8
    num_pages, bt, ids = _setup(rng, cfg, b=b)
    state32 = qn.init_state(cfg, b, num_pages)
    stateq = qn.init_state(cfg, b, num_pages, ssm_dtype=jnp.bfloat16)
    ps = cfg.page_size

    step32 = jax.jit(lambda p, s, i, po, sl, bt_, sm: qn.decode_step(
        p, cfg, s, i, po, sl, bt_, sm))
    stepq = jax.jit(lambda p, s, i, po, sl, bt_, sm: qn.decode_step_q(
        p, cfg, s, i, po, sl, bt_, sm))

    for n in range(1, 4):
        seq = jnp.full((b,), n, jnp.int32)
        pos = seq - 1
        slots = bt[jnp.arange(b), pos // ps] * ps + pos % ps
        l32, state32 = step32(params32, state32, ids, pos, seq, bt, slots)
        lq, stateq = stepq(paramsq, stateq, ids, pos, seq, bt, slots)
        d = calc_diff(lq, l32)
        # int8 weights + bf16 state: loose but structure-preserving
        assert d < 0.05, (n, d)
        assert np.all(np.isfinite(np.asarray(lq)))
        ids = jnp.argmax(l32, -1).astype(jnp.int32)


@pytest.mark.parametrize("impl", ["ref", "pallas"])
def test_qwen_init_params_q_decodes(rng, monkeypatch, impl):
    """Direct-int8 init (bench path) runs the full hybrid stack and the
    greedy loop advances deterministically."""
    monkeypatch.setenv("SKT_IMPL", impl)
    cfg = qn.QwenNextConfig()
    params = qn.init_params_q(cfg)
    b = 8
    num_pages, bt, ids = _setup(rng, cfg, b=b)
    state = qn.init_state(cfg, b, num_pages, ssm_dtype=jnp.bfloat16)
    ps = cfg.page_size
    step = jax.jit(lambda p, s, i, po, sl, bt_, sm: qn.decode_step_q(
        p, cfg, s, i, po, sl, bt_, sm))

    outs = []
    for n in range(1, 4):
        seq = jnp.full((b,), n, jnp.int32)
        pos = seq - 1
        slots = bt[jnp.arange(b), pos // ps] * ps + pos % ps
        logits, state = step(params, state, ids, pos, seq, bt, slots)
        assert np.all(np.isfinite(np.asarray(logits)))
        ids = jnp.argmax(logits, -1).astype(jnp.int32)
        outs.append(np.asarray(ids))
    # state must actually evolve
    assert np.abs(np.asarray(state["ssm"], np.float32)).sum() > 0
    assert np.abs(np.asarray(state["k_cache"], np.float32)).sum() > 0


def test_moe_mlp_q_pallas_matches_ref(rng, monkeypatch):
    """The aligned-compaction grouped path must equal the tight-sorted ragged
    reference bit-for-... well, within f32 epilogue tolerance."""
    cfg = qn.QwenNextConfig()
    params = qn.init_params_q(cfg)
    x = jnp.asarray(rng.standard_normal((16, cfg.hidden_size)) * 0.3,
                    jnp.bfloat16)
    monkeypatch.setenv("SKT_IMPL", "pallas")
    out_p = qn._moe_mlp_q(x, params, cfg, 1)
    monkeypatch.setenv("SKT_IMPL", "ref")
    out_r = qn._moe_mlp_q(x, params, cfg, 1)
    assert calc_diff(out_p, out_r) < 1e-3
