"""Grammar-constrained decoding: apply_token_bitmask.

Reference parity: csrc/apply_token_bitmask/ (include/sgl_kenel_npu_ops.h:168-169,
op_host/apply_token_bitmask.cpp:21-38); golden
tests/python/sgl_kernel_npu/test_apply_token_bitmask.py:30-50 — xgrammar-style
packed int32 bitmask, bit b of word w guards vocab column w*32+b; bit==0 means
"masked" (logit -> -inf). Optional `indices` selects which logits rows each
bitmask row applies to.

One unpack + select on the VPU; XLA fuses it into the sampling epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = float("-inf")


def apply_token_bitmask(logits, bitmask, indices=None):
    """logits [B, V]; bitmask [Bm, ceil(V/32)] int32; indices [Bm] optional —
    row indices[i] of logits gets bitmask row i. Returns masked logits."""
    b, v = logits.shape
    words = bitmask.shape[1]
    bits = jnp.arange(v, dtype=jnp.int32)
    word = bits // 32
    bit = bits % 32
    unpacked = (bitmask[:, word] >> bit) & 1        # [Bm, V]
    allowed = unpacked.astype(bool)

    if indices is None:
        return jnp.where(allowed, logits, _NEG_INF)

    # Scatter per-row masks to their target rows; untargeted rows unmasked.
    full = jnp.ones((b + 1, v), bool).at[indices].set(allowed, mode="drop")[:b]
    return jnp.where(full, logits, _NEG_INF)
