"""Elastic EP scale-down + EP feature extensions.

Reference parity (SURVEY.md §5 "failure detection / elasticity"):
  * elasticInfo — csrc/deepep/ops/op_kernel/moe_distribute_dispatch_v2.h:77,
    261-283: an optional int32 tensor (flag + new epWorldSize +
    sharedExpertRankNum + moeExpertNum + rank remap list) read at kernel start;
    when the scale-down flag is set the kernel re-derives its world size and
    routing from the remap table so dispatch/combine keep working after ranks
    are removed.
  * long-seq multi-round — csrc/deepep/deep_ep.cpp:54-78: tile up-to-131072
    token batches through bounded windows in <=256 rounds of <=8192 tokens.
  * cumulative_local_expert_recv_stats — python/deep_ep/deep_ep/buffer.py:679-681:
    EP load-balance counters accumulated across steps.

TPU realisation: the mesh is fixed; "scale-down" routes AROUND dead ranks —
the remap table reassigns each logical expert-owner rank to a surviving
physical rank, and the routing math in dispatch consults it. All shapes stay
static; the elastic info is data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ElasticInfo(NamedTuple):
    """flag + remap, matching the reference's int32 block layout."""

    flag: jnp.ndarray            # [] int32, 1 = scale-down active
    new_world_size: jnp.ndarray  # [] int32
    shared_expert_rank_num: jnp.ndarray  # [] int32
    moe_expert_num: jnp.ndarray  # [] int32
    rank_remap: jnp.ndarray      # [R] int32: logical rank -> physical (or -1)

    @staticmethod
    def identity(num_ranks: int):
        return ElasticInfo(
            flag=jnp.int32(0),
            new_world_size=jnp.int32(num_ranks),
            shared_expert_rank_num=jnp.int32(0),
            moe_expert_num=jnp.int32(0),
            rank_remap=jnp.arange(num_ranks, dtype=jnp.int32),
        )

    def pack(self):
        return jnp.concatenate([
            jnp.stack([self.flag, self.new_world_size,
                       self.shared_expert_rank_num, self.moe_expert_num]),
            self.rank_remap,
        ])

    @staticmethod
    def unpack(arr, num_ranks: int):
        return ElasticInfo(arr[0], arr[1], arr[2], arr[3], arr[4:4 + num_ranks])


def remap_dst_rank(dst, elastic: "ElasticInfo | None", num_ranks: int):
    """Apply the elastic remap to destination ranks computed from expert ids.

    dst [..] int32 logical owner ranks; returns physical ranks (dead ranks'
    tokens go to their remap target; remap -1 -> dropped == num_ranks)."""
    if elastic is None:
        return dst
    remapped = elastic.rank_remap[jnp.clip(dst, 0, num_ranks - 1)]
    remapped = jnp.where(remapped < 0, num_ranks, remapped)
    return jnp.where(elastic.flag > 0, remapped, dst)
