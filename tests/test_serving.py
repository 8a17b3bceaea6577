"""End-to-end serving engine: scheduler + paged KV + llama decode, greedy
determinism across batching patterns."""

import jax
import numpy as np

from sgl_kernel_npu_tpu.models import llama
from sgl_kernel_npu_tpu.serving import LlamaEngine


def test_engine_generates_and_matches_unbatched(rng):
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (5, 9, 3)]

    eng = LlamaEngine(cfg, params=params, num_pages=64, decode_batch=4,
                      token_budget=64)
    outs = eng.generate(prompts, max_new_tokens=6)
    assert all(len(o) == 6 for o in outs)

    # one-at-a-time engine produces the same greedy continuations
    for i, p in enumerate(prompts):
        solo = LlamaEngine(cfg, params=params, num_pages=64, decode_batch=4,
                           token_budget=64)
        o = solo.generate([p], max_new_tokens=6)[0]
        assert o == outs[i], (i, o, outs[i])


def test_engine_frees_pages(rng):
    cfg = llama.tiny_config()
    eng = LlamaEngine(cfg, num_pages=64, decode_batch=2, token_budget=64)
    free0 = eng.sched.free_pages()
    eng.generate([[1, 2, 3, 4]], max_new_tokens=3)
    assert eng.sched.free_pages() == free0


def test_engine_chunked_prefill_long_prompt(rng):
    """Prompt longer than the token budget: multiple prefill chunks, identical
    output to a large-budget single-chunk engine."""
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    prompt = list(rng.integers(0, cfg.vocab_size, 30))

    big = LlamaEngine(cfg, params=params, num_pages=64, token_budget=64)
    out_big = big.generate([prompt], max_new_tokens=5)[0]

    small = LlamaEngine(cfg, params=params, num_pages=64, token_budget=8)
    out_small = small.generate([prompt], max_new_tokens=5)[0]
    assert out_small == out_big
