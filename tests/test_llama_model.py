"""End-to-end model consistency: prefill(n)+decode(1) == prefill(n+1) on the
last token's logits (the strongest cheap invariant of paged-KV decode)."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import llama

from .utils import assert_close


def test_prefill_decode_consistency(rng):
    cfg = llama.tiny_config()
    key = jax.random.PRNGKey(0)
    params = llama.init_params(cfg, key)
    n = 13
    tokens = jnp.array(rng.integers(0, cfg.vocab_size, n + 1), jnp.int32)

    num_pages = 8
    kc, vc = llama.init_kv_cache(cfg, num_pages)
    block_table = jnp.arange(1, 5, dtype=jnp.int32)[None]  # pages 1..4
    positions = jnp.arange(n, dtype=jnp.int32)
    slots = (block_table[0, positions // cfg.page_size] * cfg.page_size
             + positions % cfg.page_size)

    # prefill n tokens
    _, kc1, vc1 = llama.prefill_step(params, cfg, kc, vc, tokens[:n], positions, slots, 0)

    # decode token n
    pos_n = jnp.array([n], jnp.int32)
    slot_n = (block_table[0, n // cfg.page_size] * cfg.page_size
              + n % cfg.page_size)[None]
    logits_dec, _, _ = llama.decode_step(
        params, cfg, kc1, vc1, tokens[n:n + 1], pos_n,
        jnp.array([n + 1], jnp.int32), block_table, slot_n,
    )

    # golden: prefill n+1 tokens, take last logits
    kc0, vc0 = llama.init_kv_cache(cfg, num_pages)
    positions2 = jnp.arange(n + 1, dtype=jnp.int32)
    slots2 = (block_table[0, positions2 // cfg.page_size] * cfg.page_size
              + positions2 % cfg.page_size)
    logits_full, _, _ = llama.prefill_step(
        params, cfg, kc0, vc0, tokens[:n + 1], positions2, slots2, 0
    )

    assert_close(logits_dec[0], logits_full[-1], rtol=5e-2, atol=5e-2)


def test_decode_step_batch(rng):
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    b, num_pages, mp = 4, 32, 4
    kc, vc = llama.init_kv_cache(cfg, num_pages)
    bt = jnp.array(rng.permutation(num_pages - 1)[: b * mp].reshape(b, mp) + 1, jnp.int32)
    seq_lens = jnp.array([1, 5, 17, 30], jnp.int32)
    positions = seq_lens - 1
    slots = bt[jnp.arange(b), positions // cfg.page_size] * cfg.page_size + positions % cfg.page_size
    ids = jnp.array(rng.integers(0, cfg.vocab_size, b), jnp.int32)

    step = jax.jit(lambda p, kc, vc, i, po, sl, b_, sm: llama.decode_step(
        p, cfg, kc, vc, i, po, sl, b_, sm))
    logits, kc2, vc2 = step(params, kc, vc, ids, positions, seq_lens, bt, slots)
    assert logits.shape == (b, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    # cache was written at the new slots
    diff = np.abs(np.asarray(kc2) - np.asarray(kc)).sum(axis=(0, 1, 4))
    assert (diff > 0).sum() >= b  # at least one page-slot per request changed


def test_decode_step_int8_kv(rng):
    """INT8 KV cache decode tracks the bf16-KV decode closely."""
    cfg8 = llama.tiny_config(int8_kv=True)
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    b, num_pages, mp = 2, 16, 3
    kv8 = llama.init_kv_cache(cfg8, num_pages)
    kc, vc = llama.init_kv_cache(cfg, num_pages)
    bt = jnp.array(rng.permutation(num_pages - 1)[: b * mp].reshape(b, mp) + 1, jnp.int32)
    seq_lens = jnp.array([1, 9], jnp.int32)
    positions = seq_lens - 1
    slots = bt[jnp.arange(b), positions // cfg.page_size] * cfg.page_size + positions % cfg.page_size
    ids = jnp.array(rng.integers(0, cfg.vocab_size, b), jnp.int32)

    l8, kv8b = llama.decode_step_kv(params, cfg8, kv8, ids, positions, seq_lens, bt, slots)
    lf, _, _ = llama.decode_step(params, cfg, kc, vc, ids, positions, seq_lens, bt, slots)
    from .utils import calc_diff
    assert calc_diff(np.asarray(l8), np.asarray(lf)) < 2e-3
    assert kv8b["k"].dtype == jnp.int8


def test_chunked_prefill_matches_single_shot(rng):
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    n = 20
    tokens = jnp.array(rng.integers(0, cfg.vocab_size, n), jnp.int32)
    bt = jnp.arange(1, 4, dtype=jnp.int32)   # 3 pages (page 16 -> 48 slots)
    positions = jnp.arange(n, dtype=jnp.int32)
    slots = bt[positions // cfg.page_size] * cfg.page_size + positions % cfg.page_size

    # single-shot
    kc0, vc0 = llama.init_kv_cache(cfg, 8)
    lg_full, kcf, vcf = llama.prefill_step(params, cfg, kc0, vc0, tokens,
                                           positions, slots, 0)

    # two chunks: 12 + 8
    kc, vc = llama.init_kv_cache(cfg, 8)
    lg1, kc, vc = llama.prefill_chunk_step(
        params, cfg, kc, vc, tokens[:12], positions[:12], slots[:12], bt, 0)
    lg2, kc, vc = llama.prefill_chunk_step(
        params, cfg, kc, vc, tokens[12:], positions[12:], slots[12:], bt, 12)

    from .utils import calc_diff
    assert calc_diff(np.asarray(lg2), np.asarray(lg_full)[12:]) < 2e-3
    assert calc_diff(np.asarray(kc), np.asarray(kcf)) < 1e-3
