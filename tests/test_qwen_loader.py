"""Qwen3-Next HF checkpoint loader + logits parity against the real HF model.

The installed `transformers` provides `Qwen3NextForCausalLM` — the public
model family the reference's fla/GDN kernel stack serves (reference:
python/sgl_kernel_npu/sgl_kernel_npu/fla/*, csrc mega_chunk_gdn). A tiny
random-initialized checkpoint is saved in HF format, loaded through
models.loader.load_qwen_next, and both the full-sequence forward and the
paged decode path must track HF's fp32 logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from .utils import calc_diff

torch = pytest.importorskip("torch")

try:
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM
    HAS_QWEN3_NEXT = True
except ImportError:
    HAS_QWEN3_NEXT = False

pytestmark = pytest.mark.skipif(not HAS_QWEN3_NEXT,
                                reason="transformers lacks qwen3_next")


def _tiny_hf_checkpoint(tmp_path, seed=0):
    torch.manual_seed(seed)
    hf_cfg = Qwen3NextConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=4,
        layer_types=["linear_attention", "linear_attention",
                     "linear_attention", "full_attention"],
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        linear_key_head_dim=16,
        linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        partial_rotary_factor=0.25,
        rope_theta=10000.0,
        num_experts=8,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=32,
        intermediate_size=64,
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = Qwen3NextForCausalLM(hf_cfg).eval()
    # non-trivial norm weights so the zero-centered (+1) convention is tested
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name and p.ndim == 1:
                p.add_(torch.randn_like(p) * 0.1)
    hf_cfg.save_pretrained(str(tmp_path))
    from safetensors.numpy import save_file
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    return model


def test_qwen_next_hf_forward_parity(tmp_path, rng):
    model = _tiny_hf_checkpoint(tmp_path)
    from sgl_kernel_npu_tpu.models.loader import load_qwen_next
    from sgl_kernel_npu_tpu.models import qwen_next

    cfg, params = load_qwen_next(str(tmp_path))
    assert cfg.full_attention_interval == 4
    assert cfg.num_gdn_layers == 3 and cfg.num_attn_layers == 1

    b, t = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (b, t))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    mine = np.asarray(qwen_next.forward_full(params, cfg, jnp.asarray(ids)))
    assert mine.shape == ref.shape
    d = calc_diff(mine, ref)
    assert d < 1e-3, f"forward logits diverge from HF: calc_diff={d}"


def test_qwen_next_hf_decode_parity(tmp_path, rng):
    """Paged decode path (conv update + recurrent delta rule + paged GQA)
    tracks HF full-forward logits token by token."""
    model = _tiny_hf_checkpoint(tmp_path)
    from sgl_kernel_npu_tpu.models.loader import load_qwen_next
    from sgl_kernel_npu_tpu.models import qwen_next

    cfg, params = load_qwen_next(str(tmp_path))
    b, t = 1, 10
    ids = rng.integers(0, cfg.vocab_size, (b, t))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    max_pages = (t + cfg.page_size - 1) // cfg.page_size + 1
    state = qwen_next.init_state(cfg, b, max_pages * b + 1)
    bt = jnp.arange(1, b * max_pages + 1, dtype=jnp.int32).reshape(b, max_pages)
    step = jax.jit(lambda p, s, i, po, sq, b_, sm:
                   qwen_next.decode_step(p, cfg, s, i, po, sq, b_, sm))
    for ti in range(t):
        pos = jnp.full((b,), ti, jnp.int32)
        seq = pos + 1
        slots = (bt[jnp.arange(b), pos // cfg.page_size] * cfg.page_size
                 + pos % cfg.page_size)
        logits, state = step(params, state, jnp.asarray(ids[:, ti]), pos, seq,
                             bt, slots)
        d = calc_diff(np.asarray(logits), ref[:, ti])
        assert d < 1e-3, f"decode step {ti}: calc_diff={d}"
