"""EAGLE speculative-decoding tree ops: build_tree_efficient + verify_tree_greedy.

Reference parity:
  csrc/build_tree/ (port of sglang eagle_utils.cu, README.md:7-28) with the
  native golden build_tree_efficient_native in
  python/sgl_kernel_npu/sgl_kernel_npu/speculative.py:17-133;
  sample/verify_tree_greedy.py (Triton kernel :7-93) with golden
  verify_tree_greedy_native (speculative.py:135-207).
Test vectors: tests/python/sgl_kernel_npu/test_build_tree.py:374-440.

Node convention: node 0 is the verified root; node i (1..dt-1) corresponds to
selected_index[:, i-1]. Parent resolution: ptb = selected_index[i-1] // topk;
ptb == 0 -> root, else the node whose selected_index equals
parent_list[ptb], plus one.

TPU design: the reference walks the tree with scalar loops per batch element;
here every step is a [bs, dt] vector op inside small static loops (dt <= ~16),
so the whole builder jits into a handful of fused VPU passes — no kernel
needed. verify is the same: dt static steps of a masked sibling-walk,
vmapped over the batch.
"""

from __future__ import annotations

from enum import IntEnum

import jax
import jax.numpy as jnp


class TreeMaskMode(IntEnum):
    FULL_MASK = 0
    QLEN_ONLY = 1
    QLEN_ONLY_BITPACKING = 2


def _parents(parent_list, selected_index, topk, dt):
    """Parent node id for nodes 1..dt-1 ([bs, dt-1]); dt = invalid sentinel."""
    ptb = selected_index // topk                                  # [bs, dt-1]
    parent_tok = jnp.take_along_axis(
        parent_list, jnp.clip(ptb, 0, parent_list.shape[1] - 1), axis=1
    )
    # find node p+1 with selected_index[:, p] == parent_tok
    eq = selected_index[:, None, :] == parent_tok[:, :, None]     # [bs, dt-1, dt-1]
    found = jnp.any(eq, axis=-1)
    pos = jnp.argmax(eq, axis=-1) + 1
    parent = jnp.where(ptb == 0, 0, jnp.where(found, pos, dt))
    return parent                                                  # [bs, dt-1]


def build_tree_efficient(parent_list, selected_index, verified_seq_len,
                         topk: int, draft_token_num: int,
                         tree_mask_mode: int = TreeMaskMode.QLEN_ONLY):
    """Returns (positions [bs*dt], retrive_index [bs, dt],
    retrive_next_token [bs, dt], retrive_next_sibling [bs, dt],
    tree_mask [bs, dt, dt] bool — draft-vs-draft ancestor mask).

    For FULL_MASK callers, prepend all-True prefix columns per sequence
    (the [dt, seq_len] block is constant True); QLEN_ONLY is the natural
    TPU layout and what paged verification consumes.
    """
    dt = draft_token_num
    bs = selected_index.shape[0]
    parent = _parents(parent_list.astype(jnp.int32),
                      selected_index.astype(jnp.int32), topk, dt)  # [bs, dt-1]
    # full per-node parent array, parent[0] = 0
    par = jnp.concatenate([jnp.zeros((bs, 1), jnp.int32), parent], axis=1)  # [bs, dt]
    par_safe = jnp.clip(par, 0, dt - 1)

    # depth + ancestor closure by pointer-jumping (dt iterations max)
    depth = jnp.zeros((bs, dt), jnp.int32)
    anc = jnp.broadcast_to(jnp.eye(dt, dtype=bool)[None], (bs, dt, dt))
    valid_node = jnp.concatenate(
        [jnp.ones((bs, 1), bool), parent < dt], axis=1)
    for _ in range(dt - 1):
        parent_depth = jnp.take_along_axis(depth, par_safe, axis=1)
        depth = jnp.where((par > 0) | (jnp.arange(dt)[None] > 0),
                          jnp.minimum(parent_depth + 1, dt), depth)
        # recompute: node i depth = depth[parent]+1 for i>=1
        depth = depth.at[:, 0].set(0)
        parent_anc = jnp.take_along_axis(
            anc, par_safe[:, :, None], axis=1
        )
        anc = anc | jnp.where((jnp.arange(dt)[None, :, None] > 0), parent_anc, False)

    positions = (verified_seq_len[:, None].astype(jnp.int32) + depth).reshape(-1)
    retrive_index = (jnp.arange(bs)[:, None] * dt + jnp.arange(dt)[None]).astype(jnp.int32)

    # children lists: iterate i descending, prepend to parent's list
    next_token = jnp.full((bs, dt), -1, jnp.int32)
    next_sibling = jnp.full((bs, dt), -1, jnp.int32)
    rows = jnp.arange(bs)
    for i in range(dt - 1, 0, -1):
        p = par[:, i]
        ok = (p < dt) & valid_node[:, i]
        p_safe = jnp.clip(p, 0, dt - 1)
        old_head = next_token[rows, p_safe]
        next_sibling = next_sibling.at[rows, i].set(
            jnp.where(ok, old_head, next_sibling[rows, i]))
        next_token = next_token.at[rows, p_safe].set(
            jnp.where(ok, i, next_token[rows, p_safe]))

    tree_mask = anc & valid_node[:, :, None] & valid_node[:, None, :]
    if tree_mask_mode == TreeMaskMode.QLEN_ONLY_BITPACKING:
        # bit-packed rows (ref speculative.py:13-15 TreeMaskMode): LSB-first
        # int32 words, the same packing convention as the grammar bitmask op
        # (ops/grammar.py) so consumers share one unpack path
        tree_mask = pack_tree_mask(tree_mask)
    return positions, retrive_index, next_token, next_sibling, tree_mask


def pack_tree_mask(tree_mask):
    """[..., dt] bool -> [..., ceil(dt/32)] int32, bit j of word w =
    mask[..., w*32+j] (LSB-first, xgrammar/apply_token_bitmask convention)."""
    dt = tree_mask.shape[-1]
    words = -(-dt // 32)
    pad = words * 32 - dt
    m = jnp.pad(tree_mask.astype(jnp.uint32), [(0, 0)] * (tree_mask.ndim - 1)
                + [(0, pad)])
    m = m.reshape(tree_mask.shape[:-1] + (words, 32))
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint32).astype(jnp.int32)


def unpack_tree_mask(packed, dt: int):
    """Inverse of pack_tree_mask: [..., words] int32 -> [..., dt] bool."""
    words = packed.shape[-1]
    bits = (packed.astype(jnp.uint32)[..., :, None]
            >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return bits.reshape(packed.shape[:-1] + (words * 32,))[..., :dt].astype(bool)


def verify_tree_greedy(candidates, retrive_index, retrive_next_token,
                       retrive_next_sibling, target_predict):
    """Greedy tree verification (golden: speculative.py:135-207).

    candidates [bs, dt] draft tokens; retrive_* [bs, dt]; target_predict
    [bs, dt] — target model's argmax at each draft position.
    Returns (predicts [bs*dt] (-1 where unset), accept_index [bs, dt] (-1
    padded), accept_token_num [bs]).
    """
    bs, dt = candidates.shape

    def one(cand, ridx, ntok, nsib, target):
        predicts = jnp.full((dt,), -1, jnp.int32)
        accept_index = jnp.full((dt,), -1, jnp.int32)
        accept_index = accept_index.at[0].set(ridx[0])
        last_local = jnp.int32(0)       # node id of last accepted
        num_accepted = jnp.int32(0)
        cur = jnp.int32(0)
        alive = jnp.bool_(True)

        for _ in range(1, dt):
            cur = jnp.where(alive, ntok[jnp.clip(cur, 0, dt - 1)], -1)
            found = jnp.bool_(False)
            match_node = jnp.int32(-1)
            for _ in range(dt):           # sibling walk
                ok = alive & (cur != -1) & (~found)
                cur_safe = jnp.clip(cur, 0, dt - 1)
                tgt = target[jnp.clip(last_local, 0, dt - 1)]
                hit = ok & (cand[cur_safe] == tgt)
                match_node = jnp.where(hit, cur, match_node)
                found = found | hit
                cur = jnp.where(ok & ~hit, nsib[cur_safe], cur)
            # apply acceptance
            acc = alive & found
            mn = jnp.clip(match_node, 0, dt - 1)
            predicts = jnp.where(
                acc, predicts.at[jnp.clip(last_local, 0, dt - 1)].set(
                    target[jnp.clip(last_local, 0, dt - 1)]), predicts)
            num_accepted = num_accepted + acc.astype(jnp.int32)
            accept_index = jnp.where(
                acc, accept_index.at[num_accepted].set(ridx[mn]), accept_index)
            last_local = jnp.where(acc, mn, last_local)
            cur = jnp.where(acc, mn, cur)
            alive = acc

        predicts = predicts.at[jnp.clip(last_local, 0, dt - 1)].set(
            target[jnp.clip(last_local, 0, dt - 1)])
        return predicts, accept_index, num_accepted

    predicts_l, accept_index, accept_num = jax.vmap(one)(
        candidates.astype(jnp.int32), retrive_index.astype(jnp.int32),
        retrive_next_token.astype(jnp.int32),
        retrive_next_sibling.astype(jnp.int32), target_predict.astype(jnp.int32),
    )
    return predicts_l.reshape(-1), accept_index, accept_num
