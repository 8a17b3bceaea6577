"""Accuracy parity vs the HuggingFace reference implementation (BASELINE: match
accuracy within the stated delta at the same bit-width).

Builds a small random Llama with transformers (torch CPU), saves it, loads it
through our W8A8 quantizing loader, and compares greedy decode logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.models import llama, loader

from .utils import calc_diff


@pytest.fixture(scope="module")
def hf_model(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


def test_w8a8_logits_match_hf(hf_model, rng):
    model, path = hf_model
    cfg, params = loader.load_llama_w8a8(path)
    cfg = llama.LlamaConfig(**{**cfg.__dict__, "page_size": 16})

    n = 12
    tokens = rng.integers(0, 256, n).astype(np.int64)

    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens)[None]).logits[0].float().numpy()

    kc, vc = llama.init_kv_cache(cfg, 8)
    bt = jnp.array([1, 2, 3], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)
    slots = bt[positions // cfg.page_size] * cfg.page_size + positions % cfg.page_size
    our_logits, kc, vc = llama.prefill_step(
        params, cfg, kc, vc, jnp.array(tokens, jnp.int32), positions, slots, 0)

    diff = calc_diff(np.asarray(our_logits), hf_logits)
    assert diff < 5e-3, f"cosine diff {diff}"
    # greedy argmax agreement on most positions (int8 rounding tolerance)
    agree = (np.asarray(our_logits).argmax(-1) == hf_logits.argmax(-1)).mean()
    assert agree >= 0.8, f"greedy agreement {agree}"


def test_w8a8_decode_matches_hf_next_token(hf_model, rng):
    model, path = hf_model
    cfg, params = loader.load_llama_w8a8(path)
    cfg = llama.LlamaConfig(**{**cfg.__dict__, "page_size": 16})
    n = 9
    tokens = rng.integers(0, 256, n + 1).astype(np.int64)

    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens)[None]).logits[0, -1].float().numpy()

    kc, vc = llama.init_kv_cache(cfg, 8)
    bt = jnp.array([[1, 2, 3]], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)
    slots = bt[0, positions // cfg.page_size] * cfg.page_size + positions % cfg.page_size
    _, kc, vc = llama.prefill_step(
        params, cfg, kc, vc, jnp.array(tokens[:n], jnp.int32), positions, slots, 0)
    pos_n = jnp.array([n], jnp.int32)
    slot_n = (bt[0, n // cfg.page_size] * cfg.page_size + n % cfg.page_size)[None]
    our, _, _ = llama.decode_step(
        params, cfg, kc, vc, jnp.array(tokens[n:n + 1], jnp.int32), pos_n,
        jnp.array([n + 1], jnp.int32), bt, slot_n)
    diff = calc_diff(np.asarray(our)[0], hf_logits)
    assert diff < 5e-3, f"cosine diff {diff}"
