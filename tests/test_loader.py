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


def test_load_deepseek_mla(tmp_path, rng):
    """Synthetic HF DeepSeek checkpoint -> loader -> (a) mla_preprocess of
    layer 0 matches a numpy forward of the raw fp weights (verifies the whole
    wdqkv/wuq/wuk/gamma mapping chain), (b) decode runs end-to-end."""
    import json as _json
    from safetensors.numpy import save_file
    from sgl_kernel_npu_tpu.models import deepseek_mla, loader
    from sgl_kernel_npu_tpu.ops import mla_preprocess as mp

    h, heads, kvl, rope, nope, vdim, qlora, f = 64, 2, 32, 8, 16, 16, 48, 96
    l, vocab = 2, 128
    cfg_json = dict(vocab_size=vocab, hidden_size=h, num_hidden_layers=l,
                    num_attention_heads=heads, kv_lora_rank=kvl,
                    qk_rope_head_dim=rope, qk_nope_head_dim=nope,
                    v_head_dim=vdim, q_lora_rank=qlora, intermediate_size=f,
                    rms_norm_eps=1e-6, max_position_embeddings=128)
    (tmp_path / "config.json").write_text(_json.dumps(cfg_json))

    def r(*shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    tensors = {"model.embed_tokens.weight": r(vocab, h),
               "model.norm.weight": np.ones(h, np.float32)}
    for i in range(l):
        p = f"model.layers.{i}."
        tensors.update({
            p + "self_attn.q_a_proj.weight": r(qlora, h),
            p + "self_attn.q_a_layernorm.weight": np.ones(qlora, np.float32),
            p + "self_attn.q_b_proj.weight": r(heads * (nope + rope), qlora),
            p + "self_attn.kv_a_proj_with_mqa.weight": r(kvl + rope, h),
            p + "self_attn.kv_a_layernorm.weight": np.ones(kvl, np.float32),
            p + "self_attn.kv_b_proj.weight": r(heads * (nope + vdim), kvl),
            p + "self_attn.o_proj.weight": r(h, heads * vdim),
            p + "mlp.gate_proj.weight": r(f, h),
            p + "mlp.up_proj.weight": r(f, h),
            p + "mlp.down_proj.weight": r(h, f),
            p + "input_layernorm.weight": np.ones(h, np.float32),
            p + "post_attention_layernorm.weight": np.ones(h, np.float32),
        })
    save_file(tensors, str(tmp_path / "model.safetensors"))

    cfg, params = loader.load_deepseek_mla_w8a8(str(tmp_path))
    assert cfg.kv_lora_rank == kvl and cfg.num_heads == heads

    # ---- numpy golden of the layer-0 pre-attention chain (fp weights)
    n = 3
    x = (rng.standard_normal((n, h)) * 0.5).astype(np.float32)
    pos = np.arange(n, dtype=np.int32)

    def nrm(v, g):
        return v / np.sqrt((v * v).mean(-1, keepdims=True) + 1e-6) * g

    fused = nrm(x, np.ones(h)) @ np.concatenate(
        [tensors["model.layers.0.self_attn.kv_a_proj_with_mqa.weight"],
         tensors["model.layers.0.self_attn.q_a_proj.weight"]], 0).T
    ctkv = nrm(fused[:, :kvl], np.ones(kvl))
    kpe = fused[:, kvl:kvl + rope]
    cq = nrm(fused[:, kvl + rope:], np.ones(qlora))
    qout = cq @ tensors["model.layers.0.self_attn.q_b_proj.weight"].T
    qout = qout.reshape(n, heads, nope + rope)
    kvb = tensors["model.layers.0.self_attn.kv_b_proj.weight"].reshape(
        heads, nope + vdim, kvl)
    q_nope = np.einsum("nhd,hdk->nhk", qout[..., :nope], kvb[:, :nope])
    cos = np.asarray(params["cos"])[pos]
    sin = np.asarray(params["sin"])[pos]

    def rot(v, c, s):
        half = v.shape[-1] // 2
        return v * c + np.concatenate([-v[..., half:], v[..., :half]], -1) * s

    q_pe = rot(qout[..., nope:], cos[:, None], sin[:, None])
    k_pe = rot(kpe, cos, sin)

    lp = jax.tree.map(lambda a: a[0], params["layers"])
    ckv_c = jnp.zeros((4, cfg.page_size, kvl), jnp.float32)
    kr_c = jnp.zeros((4, cfg.page_size, rope), jnp.float32)
    slots = jnp.arange(n, dtype=jnp.int32)
    out = mp.mla_preprocess(
        jnp.asarray(x), lp["gamma0"], lp["beta0"],
        lp["wdqkv"]["q"], lp["wdqkv"]["descale"],
        lp["gamma1"], lp["beta1"], lp["wuq"]["q"], lp["wuq"]["descale"],
        lp["gamma2"], jnp.asarray(cos), jnp.asarray(sin), lp["wuk"],
        ckv_c, kr_c, slots,
        lp["qscale0"], lp["qoffset0"], lp["wdqkv"]["bias"],
        lp["qscale1"], lp["qoffset1"], lp["wuq"]["bias"],
        cache_mode="krope_ctkv", quant_mode="per_token")

    from .utils import calc_diff
    assert calc_diff(np.asarray(out.q_nope, np.float32), q_nope) < 3e-2
    assert calc_diff(np.asarray(out.q_pe, np.float32), q_pe) < 3e-2
    got_ctkv = np.asarray(out.kv_cache)[0, :n]
    got_kpe = np.asarray(out.krope_cache)[0, :n]
    assert calc_diff(got_ctkv, ctkv) < 3e-2
    assert calc_diff(got_kpe, k_pe) < 3e-2

    # ---- end-to-end decode step runs on the loaded pytree
    ckv, kr = deepseek_mla.init_kv_cache(cfg, 6)
    bt = jnp.array([[1, 2]], jnp.int32)
    lg, _, _ = deepseek_mla.decode_step(
        params, cfg, ckv, kr, jnp.array([5], jnp.int32),
        jnp.array([0], jnp.int32), jnp.array([1], jnp.int32), bt,
        jnp.array([16], jnp.int32))
    assert np.isfinite(np.asarray(lg)).all()


def test_load_moe_expert_bank(tmp_path, rng):
    """Expert bank loader: dequantized experts match the saved fp weights and
    slot into the fused-MoE grouped GEMM contract."""
    import json as _json
    from safetensors.numpy import save_file
    from sgl_kernel_npu_tpu.models import loader
    from sgl_kernel_npu_tpu.ops.matmul import grouped_matmul_int8_ref
    from sgl_kernel_npu_tpu.ops.quant import per_token_quant_int8

    L, E, h, f, fs = 2, 4, 32, 48, 16
    tensors = {}
    for i in range(L):
        pre = f"model.layers.{i}.mlp."
        for e in range(E):
            ep = f"{pre}experts.{e}."
            tensors[ep + "gate_proj.weight"] = (rng.standard_normal((f, h)) * 0.1).astype(np.float32)
            tensors[ep + "up_proj.weight"] = (rng.standard_normal((f, h)) * 0.1).astype(np.float32)
            tensors[ep + "down_proj.weight"] = (rng.standard_normal((h, f)) * 0.1).astype(np.float32)
        tensors[pre + "gate.weight"] = (rng.standard_normal((E, h)) * 0.3).astype(np.float32)
        for nm, shp in (("gate_proj", (fs, h)), ("up_proj", (fs, h)),
                        ("down_proj", (h, fs))):
            tensors[f"{pre}shared_experts.{nm}.weight"] = \
                (rng.standard_normal(shp) * 0.1).astype(np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    bank = loader.load_moe_expert_bank(str(tmp_path), L, E)
    assert bank["w13"]["q"].shape == (L, E, h, 2 * f)
    assert bank["w2"]["q"].shape == (L, E, f, h)
    assert bank["router"].shape == (L, h, E)

    # dequant expert 2 of layer 1 matches the saved fp weights
    deq = np.asarray(bank["w13"]["q"][1, 2], np.float32) * \
        np.asarray(bank["w13"]["scale"][1, 2])
    want = np.concatenate(
        [tensors["model.layers.1.mlp.experts.2.gate_proj.weight"].T,
         tensors["model.layers.1.mlp.experts.2.up_proj.weight"].T], axis=1)
    from .utils import calc_diff
    assert calc_diff(deq, want) < 5e-3

    # grouped GEMM over the loaded bank == per-expert fp matmuls
    counts = np.array([3, 0, 2, 1], np.int32)
    x = (rng.standard_normal((int(counts.sum()), h)) * 0.5).astype(np.float32)
    xq, xs = per_token_quant_int8(jnp.asarray(x))
    got = np.asarray(grouped_matmul_int8_ref(
        xq, bank["w13"]["q"][0], xs, bank["w13"]["scale"][0],
        jnp.asarray(counts)), np.float32)
    row = 0
    for e in range(E):
        we = np.concatenate(
            [tensors[f"model.layers.0.mlp.experts.{e}.gate_proj.weight"].T,
             tensors[f"model.layers.0.mlp.experts.{e}.up_proj.weight"].T], 1)
        for _ in range(counts[e]):
            assert calc_diff(got[row], x[row] @ we) < 2e-2
            row += 1
