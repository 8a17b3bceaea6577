"""Speculative tree ops vs the reference's exact test vectors
(tests/python/sgl_kernel_npu/test_build_tree.py:374-440) and a python port of
verify_tree_greedy_native (speculative.py:135-207)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import speculative as spec


def _preprocess(score_list, parents_list, num_verify_tokens):
    """numpy port of build_tree_kernel_efficient_preprocess (test_build_tree.py:14-40)."""
    scores = np.concatenate([s.reshape(s.shape[0], -1) for s in score_list], axis=1)
    top_idx = np.argsort(-scores, axis=1, kind="stable")[:, : num_verify_tokens - 1]
    top_idx = np.sort(top_idx, axis=1)
    parent_list = np.concatenate(parents_list[:-1], axis=1)
    return parent_list, top_idx


def _reference_vectors():
    score_list = [
        np.array([[[7.1127e-01, 2.8292e-01, 2.2995e-03, 1.7357e-03]],
                  [[9.7476e-01, 2.2219e-02, 6.5031e-04, 1.3212e-04]]], np.float32),
        np.array([[[6.9142e-01, 1.2863e-02, 1.6873e-03, 1.1871e-03],
                   [2.4787e-01, 1.8818e-02, 1.4204e-02, 9.2235e-04],
                   [2.2971e-03, 1.6700e-06, 1.8737e-07, 8.3146e-08],
                   [1.2771e-03, 2.4374e-04, 1.7832e-04, 1.1947e-05]],
                  [[8.4832e-02, 6.6068e-02, 5.8304e-02, 5.7851e-02],
                   [2.3616e-03, 1.1243e-03, 5.4368e-04, 2.7768e-04],
                   [2.5286e-04, 1.5578e-04, 2.8817e-05, 1.2888e-05],
                   [1.2834e-04, 2.5417e-06, 1.1279e-06, 1.6088e-08]]], np.float32),
        np.array([[[6.6438e-01, 2.6997e-02, 2.4236e-05, 4.0821e-06],
                   [2.4402e-01, 2.8409e-03, 5.0935e-04, 2.9022e-04],
                   [1.6178e-02, 2.0567e-03, 4.5892e-04, 3.0034e-05],
                   [1.3023e-02, 5.0497e-04, 3.6371e-04, 8.7750e-05]],
                  [[2.3263e-02, 2.0054e-02, 9.3990e-03, 2.7783e-03],
                   [6.4156e-02, 5.5506e-04, 1.0429e-04, 9.7211e-05],
                   [4.9950e-02, 5.0630e-03, 9.0068e-04, 3.3656e-04],
                   [7.5817e-03, 8.5731e-04, 6.9972e-04, 6.0793e-04]]], np.float32),
        np.array([[[6.6420e-01, 1.0525e-04, 6.5864e-05, 1.2253e-06],
                   [1.3019e-01, 1.0461e-01, 5.2083e-03, 1.6777e-03],
                   [2.0103e-02, 6.7335e-03, 1.2625e-04, 1.0364e-05],
                   [1.5142e-02, 7.0819e-04, 9.6595e-05, 8.7951e-05]],
                  [[5.8608e-02, 1.8840e-03, 7.8535e-04, 4.4400e-04],
                   [1.2185e-02, 2.0684e-03, 1.7418e-03, 1.4327e-03],
                   [6.2455e-03, 6.1487e-03, 2.6862e-03, 1.8034e-03],
                   [1.8590e-03, 1.6151e-03, 1.2481e-03, 3.6038e-04]]], np.float32),
    ]
    parents_list = [
        np.array([[-1, 0, 1, 2, 3], [-1, 0, 1, 2, 3]], np.int64),
        np.array([[4, 8, 9, 10], [4, 5, 6, 7]], np.int64),
        np.array([[20, 24, 21, 28], [24, 28, 20, 21]], np.int64),
        np.array([[36, 40, 41, 44], [36, 40, 44, 45]], np.int64),
    ]
    seq_lens = np.array([5, 10], np.int64)
    return score_list, parents_list, seq_lens


def test_build_tree_reference_vectors():
    score_list, parents_list, seq_lens = _reference_vectors()
    topk, dt = 4, 8
    parent_list, selected_index = _preprocess(score_list, parents_list, dt)

    positions, ridx, ntok, nsib, mask = spec.build_tree_efficient(
        jnp.array(parent_list, jnp.int32), jnp.array(selected_index, jnp.int32),
        jnp.array(seq_lens, jnp.int32), topk, dt,
    )
    assert np.asarray(positions).tolist() == [5, 6, 6, 7, 7, 8, 8, 9,
                                              10, 11, 12, 12, 12, 12, 13, 14]
    assert np.asarray(ridx).tolist() == [[0, 1, 2, 3, 4, 5, 6, 7],
                                         [8, 9, 10, 11, 12, 13, 14, 15]]
    assert np.asarray(ntok).tolist() == [[1, 3, 4, 5, 6, 7, -1, -1],
                                         [1, 2, -1, 6, -1, -1, 7, -1]]
    assert np.asarray(nsib).tolist() == [[-1, 2, -1, -1, -1, -1, -1, -1],
                                         [-1, -1, 3, 4, 5, -1, -1, -1]]
    # mask sanity: diagonal true, root column true for valid nodes
    m = np.asarray(mask)
    assert m[:, np.arange(dt), np.arange(dt)].all()
    assert m[:, :, 0].all()


def _verify_native(candidates, retrive_index, ntok, nsib, target):
    """numpy port of verify_tree_greedy_native (general BFS branch)."""
    bs, dt = candidates.shape
    predicts = np.full(bs * dt, -1, np.int32)
    accept_index = np.full((bs, dt), -1, np.int32)
    accept_num = np.zeros(bs, np.int32)
    for b in range(bs):
        last = retrive_index[b, 0]
        accept_index[b, 0] = last
        num = 0
        cur = 0
        for _ in range(1, dt):
            cur = ntok[b, cur]
            found = False
            while cur != -1:
                di = retrive_index[b, cur]
                if candidates[b, cur] == target[b, last - dt * b]:
                    predicts[last] = target[b, last - dt * b]
                    num += 1
                    accept_index[b, num] = di
                    last = di
                    found = True
                    break
                cur = nsib[b, cur]
            if not found:
                break
            cur = last - dt * b
        accept_num[b] = num
        predicts[last] = target[b, last - dt * b]
    return predicts, accept_index, accept_num


def test_verify_tree_greedy(rng):
    bs, dt = 3, 6
    # build random small trees via build_tree on random routing
    ntok = np.array([[1, 2, 3, -1, -1, -1],
                     [1, -1, 4, -1, -1, -1],
                     [1, 3, -1, 5, -1, -1]], np.int32)
    nsib = np.array([[-1, -1, -1, -1, -1, -1],
                     [-1, 2, 3, -1, -1, -1],
                     [-1, 2, -1, 4, -1, -1]], np.int32)
    ridx = (np.arange(bs)[:, None] * dt + np.arange(dt)[None]).astype(np.int32)
    candidates = rng.integers(0, 5, (bs, dt)).astype(np.int32)
    target = rng.integers(0, 5, (bs, dt)).astype(np.int32)

    p, ai, an = spec.verify_tree_greedy(
        jnp.array(candidates), jnp.array(ridx), jnp.array(ntok),
        jnp.array(nsib), jnp.array(target),
    )
    gp, gai, gan = _verify_native(candidates, ridx, ntok, nsib, target)
    np.testing.assert_array_equal(np.asarray(an), gan)
    np.testing.assert_array_equal(np.asarray(ai), gai)
    np.testing.assert_array_equal(np.asarray(p), gp)


def test_build_tree_bitpacked_mask(rng):
    """QLEN_ONLY_BITPACKING (ref speculative.py:13-15): same tree, mask rows
    bit-packed LSB-first into int32 words; unpack must equal QLEN_ONLY."""
    bs, topk, dt = 3, 4, 6
    parent_list = jnp.asarray(rng.integers(0, topk * 2, (bs, dt * 2)), jnp.int32)
    selected_index = jnp.asarray(
        np.stack([rng.permutation(topk * 2)[:dt - 1] for _ in range(bs)]),
        jnp.int32)
    seq_len = jnp.asarray(rng.integers(4, 30, bs), jnp.int32)

    pos_b, ri_b, nt_b, ns_b, packed = spec.build_tree_efficient(
        parent_list, selected_index, seq_len, topk, dt,
        tree_mask_mode=spec.TreeMaskMode.QLEN_ONLY_BITPACKING)
    pos, ri, nt, ns, mask = spec.build_tree_efficient(
        parent_list, selected_index, seq_len, topk, dt,
        tree_mask_mode=spec.TreeMaskMode.QLEN_ONLY)

    assert packed.dtype == jnp.int32 and packed.shape == (bs, dt, 1)
    np.testing.assert_array_equal(np.asarray(pos_b), np.asarray(pos))
    np.testing.assert_array_equal(np.asarray(nt_b), np.asarray(nt))
    np.testing.assert_array_equal(np.asarray(ns_b), np.asarray(ns))
    np.testing.assert_array_equal(
        np.asarray(spec.unpack_tree_mask(packed, dt)), np.asarray(mask))
    # >32-node packing spills into multiple words
    wide = jnp.asarray(rng.integers(0, 2, (2, 40, 40)), bool)
    rt = spec.unpack_tree_mask(spec.pack_tree_mask(wide), 40)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(wide))
