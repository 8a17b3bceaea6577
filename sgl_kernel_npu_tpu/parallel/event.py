"""EventOverlap + FuseMode — reference API-surface parity.

Reference: deep_ep/utils.py:13-33 (EventOverlap: wraps an npu.Event plus
`extra_tensors` kept alive so graph capture does not free comm buffers between
dispatch and the consumer stream) and deep_ep/buffer.py:21-23 (FuseMode).

TPU semantics: XLA has no user-visible streams — cross-op ordering IS data
dependency, and async collectives are scheduled by the compiler. EventOverlap
therefore degrades to a completion token: it pins the tensors whose production
it represents, `current_stream_wait()` blocks the host on them (the only
"wait" that exists outside jit), and inside jit it is a no-op because the
consumer's data dependency already orders execution.
"""

from __future__ import annotations

import enum
from typing import Optional, Sequence

import jax


class FuseMode(enum.IntEnum):
    """Ref: deep_ep/buffer.py:21-23."""
    NONE = 0
    FUSED_DEEP_MOE = 1


class EventOverlap:
    """Completion token for overlapped comm (ref: deep_ep/utils.py:13-33)."""

    def __init__(self, event: Optional[object] = None,
                 extra_tensors: Optional[Sequence[jax.Array]] = None):
        self.event = event
        self.extra_tensors = tuple(extra_tensors or ())

    def current_stream_wait(self) -> None:
        """Host-side wait: block until the pinned tensors are materialized.
        Inside jit this object should not be waited on — data dependencies
        already order the consumer after the collective."""
        for t in self.extra_tensors:
            jax.block_until_ready(t)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.current_stream_wait()
        return False
