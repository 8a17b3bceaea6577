"""Paged flash prefill kernel vs dense goldens.

Reference pattern: tests/python/sgl_kernel_npu/test_decode_attention.py-style
numpy goldens; block-sparse semantics from
csrc/attentions/csrc/ops/block_sparse_attention/ (attend only selected
blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.attention import paged_prefill
from sgl_kernel_npu_tpu.ops.attention.decode_v3 import (
    reshape_and_cache_gqa_page_major,
    reshape_and_cache_gqa_page_major_int8,
)

HKV, G, D, PS = 2, 3, 64, 32
HQ = HKV * G
SCALE = D ** -0.5


def _dense_golden(q, kfull, vfull, prefix_len, allowed_cols=None):
    """q [T, Hq, D]; kfull/vfull [L, Hkv, D] logical-position order."""
    t = q.shape[0]
    L = kfull.shape[0]
    out = np.zeros((t, HQ, D), np.float32)
    for h in range(HQ):
        kh = kfull[:, h // G].astype(np.float32)
        vh = vfull[:, h // G].astype(np.float32)
        s = q[:, h].astype(np.float32) @ kh.T * SCALE
        cols = np.arange(L)[None, :]
        mask = cols <= prefix_len + np.arange(t)[:, None]
        if allowed_cols is not None:
            mask = mask & allowed_cols[:, h // G]
        s = np.where(mask, s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / np.maximum(p.sum(-1, keepdims=True), 1e-37)
        p = np.where(mask.any(-1, keepdims=True), p, 0.0)
        out[:, h] = p @ vh
    return out


def _build_cache(rng, L, num_pages, int8=False):
    """Random KV for L logical positions scattered into a page-major cache
    through a shuffled block table."""
    kfull = (rng.standard_normal((L, HKV, D)) * 0.5).astype(np.float32)
    vfull = (rng.standard_normal((L, HKV, D)) * 0.5).astype(np.float32)
    max_pages = -(-L // PS)
    bt = jnp.asarray(rng.permutation(num_pages)[:max_pages], jnp.int32)
    slots = bt[jnp.arange(L) // PS] * PS + jnp.arange(L) % PS
    if int8:
        kc = jnp.zeros((num_pages, HKV, PS, D), jnp.int8)
        vc = jnp.zeros((num_pages, HKV, PS, D), jnp.int8)
        ks = jnp.zeros((num_pages, HKV, 1, PS), jnp.float32)
        vs = jnp.zeros((num_pages, HKV, 1, PS), jnp.float32)
        kc, vc, ks, vs = reshape_and_cache_gqa_page_major_int8(
            jnp.asarray(kfull), jnp.asarray(vfull), kc, vc, ks, vs, slots)
        cache = {"k": kc, "v": vc, "ks": ks, "vs": vs}
        # golden must see the dequantized values the kernel sees
        kdq = np.asarray(kc, np.float32) * np.asarray(ks).transpose(0, 1, 3, 2)
        vdq = np.asarray(vc, np.float32) * np.asarray(vs).transpose(0, 1, 3, 2)
        kfull = kdq[np.asarray(bt)].transpose(0, 2, 1, 3).reshape(-1, HKV, D)[:L]
        vfull = vdq[np.asarray(bt)].transpose(0, 2, 1, 3).reshape(-1, HKV, D)[:L]
    else:
        kc = jnp.zeros((num_pages, HKV, PS, D), jnp.bfloat16)
        vc = jnp.zeros((num_pages, HKV, PS, D), jnp.bfloat16)
        kc, vc = reshape_and_cache_gqa_page_major(
            jnp.asarray(kfull), jnp.asarray(vfull), kc, vc, slots)
        cache = (kc, vc)
        kfull = kfull.astype(jnp.bfloat16).astype(np.float32)
        vfull = vfull.astype(jnp.bfloat16).astype(np.float32)
    return cache, bt, kfull, vfull


@pytest.mark.parametrize("t,prefix_len", [(64, 0), (48, 80), (96, 32)])
def test_dense_causal_matches_golden(rng, t, prefix_len):
    L = prefix_len + t
    cache, bt, kfull, vfull = _build_cache(rng, L, num_pages=-(-L // PS) + 3)
    q = (rng.standard_normal((t, HQ, D)) * 0.5).astype(np.float32)

    out = paged_prefill.paged_prefill_attention(
        jnp.asarray(q, jnp.bfloat16), cache, bt, prefix_len, SCALE, PS,
        block_q=32)
    golden = _dense_golden(q.astype(jnp.bfloat16).astype(np.float32),
                           kfull, vfull, prefix_len)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden,
                               rtol=0.05, atol=0.05)


def test_int8_cache_matches_dequant_golden(rng):
    t, prefix_len = 64, 32
    L = prefix_len + t
    cache, bt, kfull, vfull = _build_cache(rng, L, -(-L // PS) + 2, int8=True)
    q = (rng.standard_normal((t, HQ, D)) * 0.5).astype(np.float32)
    out = paged_prefill.paged_prefill_attention(
        jnp.asarray(q, jnp.bfloat16), cache, bt, prefix_len, SCALE, PS,
        block_q=32)
    golden = _dense_golden(q.astype(jnp.bfloat16).astype(np.float32),
                           kfull, vfull, prefix_len)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden,
                               rtol=0.05, atol=0.05)


def test_block_sparse_skips_masked_blocks(rng):
    """Estimator-style mask: kernel output must equal a golden that attends
    ONLY the selected pages (plus causality)."""
    t, prefix_len = 64, 64          # 4 logical pages total, 2 chunk q-tiles
    L = prefix_len + t
    nq, nk = -(-t // PS), -(-L // PS)
    cache, bt, kfull, vfull = _build_cache(rng, L, nk + 2)
    q = (rng.standard_normal((t, HQ, D)) * 0.5).astype(np.float32)

    mask = rng.random((nq, nk)) < 0.5
    # keep the diagonal (self) block so every row attends something
    for i in range(nq):
        mask[i, min((prefix_len + (i + 1) * PS - 1) // PS, nk - 1)] = True
    out = paged_prefill.block_sparse_paged_attention(
        jnp.asarray(q, jnp.bfloat16), cache, bt, jnp.asarray(mask),
        prefix_len, SCALE, PS)

    allowed = np.zeros((t, HKV, L), bool)
    for i in range(nq):
        for j in range(nk):
            if mask[i, j]:
                allowed[i * PS:(i + 1) * PS, :, j * PS:(j + 1) * PS] = True
    golden = _dense_golden(q.astype(jnp.bfloat16).astype(np.float32),
                           kfull, vfull, prefix_len, allowed_cols=allowed)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden,
                               rtol=0.05, atol=0.05)


def test_per_head_page_lists(rng):
    t, prefix_len = 32, 32
    L = prefix_len + t
    nq, nk = 1, -(-L // PS)
    cache, bt, kfull, vfull = _build_cache(rng, L, nk + 1)
    q = (rng.standard_normal((t, HQ, D)) * 0.5).astype(np.float32)

    mask = np.ones((HKV, nq, nk), bool)
    mask[0, 0, 0] = False          # head 0 skips the first page
    page_sel, page_cnt = paged_prefill.block_mask_to_page_lists(
        jnp.asarray(mask), nk)
    out = paged_prefill.paged_prefill_attention(
        jnp.asarray(q, jnp.bfloat16), cache, bt, prefix_len, SCALE, PS,
        page_sel=page_sel, page_cnt=page_cnt, block_q=PS)

    allowed = np.ones((t, HKV, L), bool)
    allowed[:, 0, :PS] = False
    golden = _dense_golden(q.astype(jnp.bfloat16).astype(np.float32),
                           kfull, vfull, prefix_len, allowed_cols=allowed)
    np.testing.assert_allclose(np.asarray(out, np.float32), golden,
                               rtol=0.05, atol=0.05)


def test_model_prefill_flash_matches_xla(monkeypatch, rng):
    """prefill_chunk_step_kv with the flash kernel (SKT_IMPL=pallas) matches
    the dense-gather XLA path, both KV modes, including a prefixed chunk."""
    from sgl_kernel_npu_tpu.models import llama
    from .utils import calc_diff

    for int8 in (False, True):
        cfg = llama.tiny_config(int8_kv=int8)
        params = llama.init_params(cfg, 9)
        ps = cfg.page_size
        bt = jnp.asarray([1, 2, 3, 4], jnp.int32)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, 20), jnp.int32)

        def run(kv, lo, n, prefix):
            p = jnp.arange(lo, lo + n, dtype=jnp.int32)
            slots = bt[p // ps] * ps + p % ps
            return llama.prefill_chunk_step_kv(
                params, cfg, kv, toks[lo:lo + n], p, slots, bt,
                jnp.int32(prefix))

        monkeypatch.delenv("SKT_IMPL", raising=False)
        kv_x = llama.init_kv_cache(cfg, 8)
        lg_x1, kv_x = run(kv_x, 0, 12, 0)
        lg_x2, kv_x = run(kv_x, 12, 8, 12)

        monkeypatch.setenv("SKT_IMPL", "pallas")
        kv_f = llama.init_kv_cache(cfg, 8)
        lg_f1, kv_f = run(kv_f, 0, 12, 0)
        lg_f2, kv_f = run(kv_f, 12, 8, 12)

        assert calc_diff(np.asarray(lg_f1), np.asarray(lg_x1)) < 2e-3, int8
        assert calc_diff(np.asarray(lg_f2), np.asarray(lg_x2)) < 2e-3, int8
        k_x = kv_x["k"] if int8 else kv_x[0]
        k_f = kv_f["k"] if int8 else kv_f[0]
        np.testing.assert_array_equal(np.asarray(k_x, np.float32),
                                      np.asarray(k_f, np.float32))
