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
    params = llama.init_params(cfg, 1)
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
    params = llama.init_params(cfg, 3)
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
    params = llama.init_params(cfg, 5)
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


def test_decode_verify_step_linear_chain_matches_sequential(rng):
    """Verification of a linear draft chain == running the tokens one by one:
    the self-speculative invariant that makes EAGLE lossless."""
    from sgl_kernel_npu_tpu.ops import speculative as spec

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, 9)
    n, dt = 7, 3
    tokens = jnp.array(rng.integers(0, cfg.vocab_size, n + dt), jnp.int32)
    bt = jnp.array([[1, 2, 3]], jnp.int32)

    # prefill the prefix
    kc, vc = llama.init_kv_cache(cfg, 8)
    pos = jnp.arange(n, dtype=jnp.int32)
    slots = bt[0, pos // cfg.page_size] * cfg.page_size + pos % cfg.page_size
    _, kc, vc = llama.prefill_step(params, cfg, kc, vc, tokens[:n], pos, slots, 0)

    # verify a LINEAR chain of dt drafts (tree mask = causal)
    draft_pos = jnp.arange(n, n + dt, dtype=jnp.int32)[None]
    draft_slots = (bt[0, draft_pos[0] // cfg.page_size] * cfg.page_size
                   + draft_pos[0] % cfg.page_size)[None]
    tree_mask = jnp.tril(jnp.ones((1, dt, dt), bool))
    logits_v, _, _ = llama.decode_verify_step(
        params, cfg, kc, vc, tokens[n:n + dt][None], draft_pos, tree_mask,
        jnp.array([n], jnp.int32), bt, draft_slots)

    # sequential decode golden
    kc2, vc2 = llama.init_kv_cache(cfg, 8)
    _, kc2, vc2 = llama.prefill_step(params, cfg, kc2, vc2, tokens[:n], pos, slots, 0)
    seq_logits = []
    for i in range(dt):
        p_i = jnp.array([n + i], jnp.int32)
        s_i = (bt[0, p_i // cfg.page_size] * cfg.page_size + p_i % cfg.page_size)
        lg, kc2, vc2 = llama.decode_step(
            params, cfg, kc2, vc2, tokens[n + i:n + i + 1], p_i,
            jnp.array([n + i + 1], jnp.int32), bt, s_i)
        seq_logits.append(np.asarray(lg)[0])

    from .utils import calc_diff
    for i in range(dt):
        assert calc_diff(np.asarray(logits_v)[0, i], seq_logits[i]) < 2e-3

    # and greedy verify accepts the whole chain when drafts == argmax
    target = jnp.argmax(logits_v[0], -1)[None].astype(jnp.int32)
    cands = jnp.concatenate([tokens[n:n + 1][None],
                             target[:, :-1]], axis=1)
    ridx = jnp.arange(dt, dtype=jnp.int32)[None]
    ntok = jnp.array([[1, 2, -1]], jnp.int32)
    nsib = jnp.full((1, dt), -1, jnp.int32)
    # candidates[i] must equal target at the previous accepted node for accept:
    # construct candidates = [root, argmax@0, argmax@1]
    p_out, ai, an = spec.verify_tree_greedy(cands, ridx, ntok, nsib, target)
    assert int(an[0]) == dt - 1  # all non-root drafts accepted

def test_decode_defer_matches_eager(monkeypatch, rng):
    """Deferred-write decode (default): same greedy tokens and close logits vs
    the eager scatter-then-attend path over a multi-step decode. The paths
    differ only in the CURRENT token's attention term (exact bf16 vs its
    int8 cache roundtrip), so logits agree to quantization noise and the
    caches hold identically-quantized entries for identical inputs."""
    for int8_kv in (False, True):
        cfg = llama.tiny_config(int8_kv=int8_kv)
        params = llama.init_params(cfg, 2)
        kv1 = llama.init_kv_cache(cfg, 8)
        kv2 = jax.tree.map(lambda a: a, kv1)
        bt = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
        b = 2

        monkeypatch.setenv("SKT_IMPL", "pallas")
        for step in range(4):
            seq = jnp.full((b,), step + 1, jnp.int32)
            pos = seq - 1
            slots = bt[jnp.arange(b), pos // cfg.page_size] * cfg.page_size \
                + pos % cfg.page_size
            ids = jnp.array(rng.integers(0, cfg.vocab_size, b), jnp.int32)
            monkeypatch.setenv("SKT_DECODE_DEFER", "1")
            lg1, kv1 = llama.decode_step_kv(params, cfg, kv1, ids, pos, seq,
                                            bt, slots)
            monkeypatch.setenv("SKT_DECODE_DEFER", "0")
            lg2, kv2 = llama.decode_step_kv(params, cfg, kv2, ids, pos, seq,
                                            bt, slots)
            from .utils import calc_diff
            assert calc_diff(np.asarray(lg1), np.asarray(lg2)) < 5e-3, step
            if not int8_kv:
                # bf16 mode: the new-token term is mathematically identical
                # (no quant roundtrip), caches must match to bf16 rounding
                for a, b_ in zip(jax.tree.leaves(kv1), jax.tree.leaves(kv2)):
                    assert np.allclose(np.asarray(a, np.float32),
                                       np.asarray(b_, np.float32), atol=2e-2)


def test_decode_step_tp_matches_single_device(rng):
    """TP=4 decode over the CPU mesh == unsharded decode (within the
    row-parallel per-shard activation-quant noise)."""
    from jax.sharding import Mesh

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, 4)
    tp = 4
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    params_tp = llama.shard_params_tp(params, cfg, tp)
    cfg_s = llama.shard_cfg_tp(cfg, tp)
    kv_tp = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[llama.init_kv_cache(cfg_s, 8) for _ in range(tp)])
    kv = llama.init_kv_cache(cfg, 8)
    bt = jnp.array([[1, 2, 3]], jnp.int32)

    from .utils import calc_diff
    for n in (1, 2, 3):
        seq = jnp.array([n], jnp.int32)
        pos = seq - 1
        slots = bt[0, pos // cfg.page_size] * cfg.page_size + pos % cfg.page_size
        ids = jnp.array([int(rng.integers(0, cfg.vocab_size))], jnp.int32)
        lg_tp, kv_tp = llama.decode_step_tp(
            params_tp, cfg, kv_tp, ids, pos, seq, bt, slots, mesh)
        lg, kv = llama.decode_step_kv(params, cfg, kv, ids, pos, seq, bt, slots)
        assert calc_diff(np.asarray(lg_tp), np.asarray(lg)) < 5e-3, n


def test_prefill_batch_matches_single(rng):
    """Padded batched prefill == per-sequence chunked prefill (both KV modes),
    including a second chunk with a non-zero prefix."""
    for int8 in (False, True):
        cfg = llama.tiny_config(int8_kv=int8)
        params = llama.init_params(cfg, 6)
        lens = [7, 4]
        bts = jnp.array([[1, 2, 0], [3, 4, 0]], jnp.int32)
        toks = [list(rng.integers(0, cfg.vocab_size, n)) for n in lens]
        ps = cfg.page_size

        def slots_for(si, lo, n):
            p = jnp.arange(lo, lo + n)
            return bts[si, p // ps] * ps + p % ps

        # golden: per-sequence prefill
        kv1 = llama.init_kv_cache(cfg, 8)
        lgs = []
        for si, n in enumerate(lens):
            lg, kv1 = llama.prefill_chunk_step_kv(
                params, cfg, kv1, jnp.array(toks[si], jnp.int32),
                jnp.arange(n, dtype=jnp.int32), slots_for(si, 0, n),
                bts[si], jnp.int32(0))
            lgs.append(np.asarray(lg))

        # batched: pad to T=7
        t = max(lens)
        ids = np.zeros((2, t), np.int32)
        slp = np.full((2, t), -1, np.int32)
        pos = np.zeros((2, t), np.int32)
        for si, n in enumerate(lens):
            ids[si, :n] = toks[si]
            slp[si, :n] = np.asarray(slots_for(si, 0, n))
            pos[si, :n] = np.arange(n)
        kv2 = llama.init_kv_cache(cfg, 8)
        lgb, kv2 = llama.prefill_batch_step_kv(
            params, cfg, kv2, jnp.array(ids), jnp.array(lens, jnp.int32),
            jnp.array(pos), jnp.array(slp), bts, jnp.zeros(2, jnp.int32))

        from .utils import calc_diff
        for si, n in enumerate(lens):
            assert calc_diff(np.asarray(lgb)[si, :n], lgs[si]) < 2e-3, (int8, si)
        k1 = kv1["k"] if int8 else kv1[0]
        k2 = kv2["k"] if int8 else kv2[0]
        np.testing.assert_array_equal(
            np.asarray(k1, np.float32), np.asarray(k2, np.float32))

        # second chunk for seq 0 with prefix 7
        extra = list(rng.integers(0, cfg.vocab_size, 3))
        lg, kv1 = llama.prefill_chunk_step_kv(
            params, cfg, kv1, jnp.array(extra, jnp.int32),
            jnp.arange(7, 10, dtype=jnp.int32), slots_for(0, 7, 3),
            bts[0], jnp.int32(7))
        ids2 = np.zeros((2, 3), np.int32)
        slp2 = np.full((2, 3), -1, np.int32)
        pos2 = np.zeros((2, 3), np.int32)
        ids2[0] = extra
        slp2[0] = np.asarray(slots_for(0, 7, 3))
        pos2[0] = np.arange(7, 10)
        lgb2, kv2 = llama.prefill_batch_step_kv(
            params, cfg, kv2, jnp.array(ids2), jnp.array([3, 0], jnp.int32),
            jnp.array(pos2), jnp.array(slp2), bts,
            jnp.array([7, 4], jnp.int32))
        assert calc_diff(np.asarray(lgb2)[0], np.asarray(lg)) < 2e-3, int8

def test_decode_v8_token_major_model_matches_hm(monkeypatch, rng):
    """Token-major (v8) model decode == head-major defer path: same logits
    each step and the same logical cache contents (layout-transposed)."""
    cfg = llama.tiny_config(int8_kv=True)
    params = llama.init_params(cfg, 2)
    kv_tm = llama.init_kv_cache(cfg, 8, layout="tm")
    kv_hm = llama.init_kv_cache(cfg, 8)
    bt = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    b = 2

    monkeypatch.setenv("SKT_IMPL", "pallas")
    from .utils import calc_diff
    for step in range(5):
        seq = jnp.full((b,), step + 1, jnp.int32)
        pos = seq - 1
        slots = bt[jnp.arange(b), pos // cfg.page_size] * cfg.page_size \
            + pos % cfg.page_size
        ids = jnp.array(rng.integers(0, cfg.vocab_size, b), jnp.int32)
        lg1, kv_tm = llama.decode_step_kv(params, cfg, kv_tm, ids, pos, seq,
                                          bt, slots)
        lg2, kv_hm = llama.decode_step_kv(params, cfg, kv_hm, ids, pos, seq,
                                          bt, slots)
        assert calc_diff(np.asarray(lg1), np.asarray(lg2)) < 2e-3, step

    # cache parity: tm rows r = t*hkv + h <-> hm [hkv, ps, d]
    l, p = cfg.num_layers, 8
    hkv, ps, d = cfg.num_kv_heads, cfg.page_size, cfg.head_dim
    k_tm = np.asarray(kv_tm["k"]).reshape(l, p, ps, hkv, d)
    k_hm = np.asarray(kv_hm["k"])
    assert np.array_equal(k_tm.transpose(0, 1, 3, 2, 4), k_hm)
    ks_tm = np.asarray(kv_tm["ks"]).reshape(l, p, ps, hkv)
    ks_hm = np.asarray(kv_hm["ks"])[:, :, :, 0, :]
    assert np.array_equal(ks_tm.transpose(0, 1, 3, 2), ks_hm)


def test_prefill_batch_tm_matches_hm(monkeypatch, rng):
    """Token-major defer-write batched prefill == head-major write-then-attend
    prefill: bitwise cache parity (quantization inputs identical) and logits
    within quantization noise (tm attends the in-flight chunk in exact bf16);
    then a decode step continues correctly off the tm prefill's cache."""
    monkeypatch.setenv("SKT_IMPL", "pallas")
    cfg = llama.tiny_config(int8_kv=True)
    params = llama.init_params(cfg, 6)
    lens = [7, 4]
    bts = jnp.array([[1, 2, 0], [3, 4, 0]], jnp.int32)
    toks = [list(rng.integers(0, cfg.vocab_size, n)) for n in lens]
    ps = cfg.page_size

    def slots_for(si, lo, n):
        p = jnp.arange(lo, lo + n)
        return bts[si, p // ps] * ps + p % ps

    t = max(lens)
    ids = np.zeros((2, t), np.int32)
    slp = np.full((2, t), -1, np.int32)
    pos = np.zeros((2, t), np.int32)
    for si, n in enumerate(lens):
        ids[si, :n] = toks[si]
        slp[si, :n] = np.asarray(slots_for(si, 0, n))
        pos[si, :n] = np.arange(n)

    kv_hm = llama.init_kv_cache(cfg, 8)
    lg_hm, kv_hm = llama.prefill_batch_step_kv(
        params, cfg, kv_hm, jnp.array(ids), jnp.array(lens, jnp.int32),
        jnp.array(pos), jnp.array(slp), bts, jnp.zeros(2, jnp.int32))
    kv_tm = llama.init_kv_cache(cfg, 8, layout="tm")
    lg_tm, kv_tm = llama.prefill_batch_step_kv(
        params, cfg, kv_tm, jnp.array(ids), jnp.array(lens, jnp.int32),
        jnp.array(pos), jnp.array(slp), bts, jnp.zeros(2, jnp.int32))

    from .utils import calc_diff
    for si, n in enumerate(lens):
        assert calc_diff(np.asarray(lg_tm)[si, :n],
                         np.asarray(lg_hm)[si, :n]) < 8e-3, si

    # LAYER 0's k/v inputs are identical across paths (embeddings only), so
    # its quantized cache entries must match bitwise; later layers diverge by
    # ulps (tm attends the in-flight chunk in exact bf16, hm through the
    # quantized cache), which shifts rounding.
    l, p = cfg.num_layers, 8
    hkv, d = cfg.num_kv_heads, cfg.head_dim
    k_tm = np.asarray(kv_tm["k"]).reshape(l, p, ps, hkv, d)
    assert np.array_equal(k_tm[0].transpose(0, 2, 1, 3),
                          np.asarray(kv_hm["k"])[0])
    ks_tm = np.asarray(kv_tm["ks"]).reshape(l, p, ps, hkv)
    assert np.array_equal(ks_tm[0].transpose(0, 2, 1),
                          np.asarray(kv_hm["ks"])[0, :, :, 0, :])

    # second chunk with a non-zero prefix, then one decode step
    extra = list(rng.integers(0, cfg.vocab_size, 3))
    ids2 = np.zeros((2, 3), np.int32)
    slp2 = np.full((2, 3), -1, np.int32)
    pos2 = np.zeros((2, 3), np.int32)
    ids2[0] = extra
    slp2[0] = np.asarray(slots_for(0, 7, 3))
    pos2[0] = np.arange(7, 10)
    args2 = (jnp.array(ids2), jnp.array([3, 0], jnp.int32), jnp.array(pos2),
             jnp.array(slp2), bts, jnp.array([7, 4], jnp.int32))
    lg2_hm, kv_hm = llama.prefill_batch_step_kv(params, cfg, kv_hm, *args2)
    lg2_tm, kv_tm = llama.prefill_batch_step_kv(params, cfg, kv_tm, *args2)
    assert calc_diff(np.asarray(lg2_tm)[0], np.asarray(lg2_hm)[0]) < 8e-3

    seq = jnp.array([11, 5], jnp.int32)
    dpos = seq - 1
    dslots = jnp.array([int(slots_for(0, 10, 1)[0]),
                        int(slots_for(1, 4, 1)[0])], jnp.int32)
    dids = jnp.array(rng.integers(0, cfg.vocab_size, 2), jnp.int32)
    dl_hm, _ = llama.decode_step_kv(params, cfg, kv_hm, dids, dpos, seq,
                                    bts, dslots)
    dl_tm, _ = llama.decode_step_kv(params, cfg, kv_tm, dids, dpos, seq,
                                    bts, dslots)
    assert calc_diff(np.asarray(dl_tm), np.asarray(dl_hm)) < 8e-3


def test_prefill_chunk_tm_routes_to_batch(monkeypatch, rng):
    """Single-sequence prefill_chunk_step_kv on a token-major cache routes
    through the batched defer-write path and matches the hm chunk path."""
    monkeypatch.setenv("SKT_IMPL", "pallas")
    cfg = llama.tiny_config(int8_kv=True)
    params = llama.init_params(cfg, 3)
    n = 9
    toks = jnp.array(rng.integers(0, cfg.vocab_size, n), jnp.int32)
    bt = jnp.array([1, 2, 3], jnp.int32)
    ps = cfg.page_size
    pos = jnp.arange(n, dtype=jnp.int32)
    slots = bt[pos // ps] * ps + pos % ps

    kv_hm = llama.init_kv_cache(cfg, 8)
    lg_hm, kv_hm = llama.prefill_chunk_step_kv(
        params, cfg, kv_hm, toks, pos, slots, bt, jnp.int32(0))
    kv_tm = llama.init_kv_cache(cfg, 8, layout="tm")
    lg_tm, kv_tm = llama.prefill_chunk_step_kv(
        params, cfg, kv_tm, toks, pos, slots, bt, jnp.int32(0))

    from .utils import calc_diff
    assert calc_diff(np.asarray(lg_tm), np.asarray(lg_hm)) < 8e-3
    hkv, d = cfg.num_kv_heads, cfg.head_dim
    k_tm = np.asarray(kv_tm["k"]).reshape(cfg.num_layers, 8, ps, hkv, d)
    assert np.array_equal(k_tm[0].transpose(0, 2, 1, 3),
                          np.asarray(kv_hm["k"])[0])


def test_tm_layout_ok_gates_on_mosaic_tiling(monkeypatch):
    """tm pages are only eligible when the tm kernels compile on hardware:
    D % 128 (lane tiling), hkv % 8 (the append's row-slice DMA — chip-probed
    2026-08-18: hkv=4 is rejected), ps % 16. Interpret mode (CPU tests) keeps
    tm coverage at tiny shapes."""
    from sgl_kernel_npu_tpu.utils import device

    monkeypatch.setenv("SKT_IMPL", "pallas")
    tiny = llama.tiny_config(int8_kv=True)
    assert llama.tm_layout_ok(tiny)          # interpret mode: any shapes

    monkeypatch.setattr(device, "on_tpu", lambda: True)  # compiled rules
    assert not llama.tm_layout_ok(tiny)      # D=32, hkv=4, ps=16
    assert llama.tm_layout_ok(llama.LlamaConfig(int8_kv=True))
    assert not llama.tm_layout_ok(
        llama.LlamaConfig(int8_kv=True, num_kv_heads=4))   # hkv % 8
    assert not llama.tm_layout_ok(llama.LlamaConfig())     # bf16 KV
    monkeypatch.setenv("SKT_DECODE_DEFER", "0")
    assert not llama.tm_layout_ok(llama.LlamaConfig(int8_kv=True))


def test_engine_auto_layout_falls_back_to_hm(monkeypatch, rng):
    """The serving auto-select must pick head-major pages when the tm
    kernels cannot compile for the config (e.g. hkv % 8 != 0 on hardware)."""
    from sgl_kernel_npu_tpu.serving import LlamaEngine
    from sgl_kernel_npu_tpu.utils import device

    monkeypatch.setenv("SKT_IMPL", "pallas")
    cfg = llama.tiny_config(int8_kv=True)
    monkeypatch.setattr(device, "on_tpu", lambda: True)
    eng = LlamaEngine(cfg, params=llama.init_params(cfg, 0), num_pages=8)
    assert eng.kv["k"].ndim == 5, "hkv=4 must auto-select head-major pages"


def test_pretile_big_weights_model_parity(monkeypatch, rng):
    """decode_step_kv / prefill_batch_step_kv logits are unchanged by
    llama.pretile_big_weights (ADVICE r2: the model-level 4-D bank branches
    of _qmm_l/_qmm had no parity coverage). bn=64 divides every tiny-config
    N (wqkv 512, wo 256, w13 1024, w2 256, lm_head 512)."""
    import copy

    monkeypatch.setenv("SKT_IMPL", "pallas")
    monkeypatch.setenv("SKT_GEMM_BN", "64")
    cfg = llama.tiny_config(int8_kv=True)
    params = llama.init_params(cfg, 11)
    params_t = llama.pretile_big_weights(copy.deepcopy(params))
    for name in ("wqkv", "wo", "w13", "w2"):
        assert params_t["layers"][name]["q"].ndim == 4, name
    assert params_t["lm_head"]["q"].ndim == 4

    from .utils import calc_diff

    b, num_pages, mp = 2, 8, 3
    bt = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)

    # batched prefill parity
    n = 5
    kv_a = llama.init_kv_cache(cfg, num_pages, layout="tm")
    kv_b = llama.init_kv_cache(cfg, num_pages, layout="tm")
    ids = jnp.array(rng.integers(0, cfg.vocab_size, (b, n)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    lens = jnp.full((b,), n, jnp.int32)
    slots_p = bt[jnp.arange(b)[:, None], pos // cfg.page_size] * cfg.page_size \
        + pos % cfg.page_size
    zeros = jnp.zeros((b,), jnp.int32)
    lg_a, kv_a = llama.prefill_batch_step_kv(params, cfg, kv_a, ids, lens,
                                             pos, slots_p, bt, zeros)
    lg_b, kv_b = llama.prefill_batch_step_kv(params_t, cfg, kv_b, ids, lens,
                                             pos, slots_p, bt, zeros)
    assert calc_diff(np.asarray(lg_a), np.asarray(lg_b)) < 2e-3

    # decode parity off the same cache, both small-m (b=2 < 8, the sliced
    # fallback) and via the logits already checked above
    seq = jnp.full((b,), n + 1, jnp.int32)
    p2 = seq - 1
    slots = bt[jnp.arange(b), p2 // cfg.page_size] * cfg.page_size \
        + p2 % cfg.page_size
    dids = jnp.array(rng.integers(0, cfg.vocab_size, b), jnp.int32)
    dg_a, _ = llama.decode_step_kv(params, cfg, kv_a, dids, p2, seq, bt, slots)
    dg_b, _ = llama.decode_step_kv(params_t, cfg, kv_b, dids, p2, seq, bt,
                                   slots)
    assert calc_diff(np.asarray(dg_a), np.asarray(dg_b)) < 2e-3
