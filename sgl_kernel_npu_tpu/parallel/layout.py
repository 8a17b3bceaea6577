"""Dispatch layout computation — per-token routing metadata for EP.

Reference parity: aclnnDispatchLayout (csrc/deepep/ops/op_kernel/
dispatch_layout{,_a2}.h; layout documented at csrc/deepep/deep_ep.cpp:120-138):
given topk_idx it produces num_tokens_per_rank, num_tokens_per_expert and
is_token_in_rank. On TPU this is a handful of one-hot reductions that XLA fuses
into a single pass — no kernel needed.

Conventions:
  topk_idx [T, K] int32 — global expert ids; -1 = dropped slot (reference
  MOE_ENABLE_TOPK_NEG_ONE semantics: negative entries route nowhere).
  Expert e lives on rank e // (num_experts // num_ranks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_dispatch_layout(topk_idx: jax.Array, num_experts: int, num_ranks: int):
    """Returns (num_tokens_per_rank [R], num_tokens_per_expert [E],
    is_token_in_rank [T, R] bool).

    A token counts once per rank even when several of its top-k experts live on
    the same rank (the dispatch sends one copy per destination rank).
    """
    assert num_experts % num_ranks == 0
    experts_per_rank = num_experts // num_ranks
    valid = topk_idx >= 0
    safe_idx = jnp.where(valid, topk_idx, 0)

    one_hot_expert = jax.nn.one_hot(safe_idx, num_experts, dtype=jnp.int32) * valid[..., None]
    num_tokens_per_expert = jnp.sum(one_hot_expert, axis=(0, 1))

    token_rank = safe_idx // experts_per_rank  # [T, K]
    in_rank = jax.nn.one_hot(token_rank, num_ranks, dtype=jnp.int32) * valid[..., None]
    is_token_in_rank = jnp.any(in_rank > 0, axis=1)  # [T, R]
    num_tokens_per_rank = jnp.sum(is_token_in_rank.astype(jnp.int32), axis=0)
    return num_tokens_per_rank, num_tokens_per_expert, is_token_in_rank


def tokens_per_local_expert(topk_idx, num_experts: int, num_ranks: int, rank_count_matrix=False):
    """Per (dest_rank, local_expert) token counts [R, E/R] for one rank's topk."""
    experts_per_rank = num_experts // num_ranks
    valid = topk_idx >= 0
    safe_idx = jnp.where(valid, topk_idx, 0)
    one_hot = jax.nn.one_hot(safe_idx, num_experts, dtype=jnp.int32) * valid[..., None]
    counts = jnp.sum(one_hot, axis=(0, 1))  # [E]
    return counts.reshape(num_ranks, experts_per_rank)
