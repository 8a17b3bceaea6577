"""Memory saver — pause/resume device memory for RL weight-swap workflows.

Reference parity: contrib/torch_memory_saver (SURVEY.md §2.6) — pause frees
physical device pages while keeping virtual addresses stable
(aclrtReserveMemAddress + Malloc/MapMem, csrc/core.cpp:17-94), with tag-scoped
regions (entrypoint.py:18-91) and optional host backup.

TPU realisation: XLA owns HBM and JAX arrays are immutable, so "stable virtual
addresses" has no direct analogue (recorded as a capability-mapping note, not
a gap): the equivalent capability is tag-scoped offload of live arrays to
pinned host memory and re-upload on resume, with jit-donation giving in-place
rebinding. The MemorySaver tracks pytrees by tag; pause(tag) moves them to
host (or drops them when backup=False, like the reference's
no-backup mode), resume(tag) restores device residency.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax


def _device_put_tree(tree, sharding_or_device):
    return jax.tree.map(lambda a: jax.device_put(a, sharding_or_device), tree)


class MemorySaver:
    """Tag-scoped pause/resume of device arrays (ref: entrypoint.py API)."""

    def __init__(self):
        self._regions: Dict[str, Any] = {}
        self._paused: Dict[str, Any] = {}
        self._shardings: Dict[str, Any] = {}

    @contextlib.contextmanager
    def region(self, tag: str = "default"):
        """Register arrays created inside the region via `track`."""
        self._current_tag = tag
        try:
            yield self
        finally:
            self._current_tag = None

    def track(self, tree, tag: str = None):
        """Track a pytree of device arrays under a tag; returns it unchanged."""
        tag = tag or getattr(self, "_current_tag", None) or "default"
        self._regions[tag] = tree
        self._shardings[tag] = jax.tree.map(lambda a: a.sharding, tree)
        return tree

    def pause(self, tag: str = "default", backup: bool = True):
        """Release device memory for the tag. backup=True stages to pinned
        host memory (ref: aclrtMallocHost backup); False drops the values
        (caller must re-materialize on resume, ref no-backup mode)."""
        tree = self._regions.get(tag)
        if tree is None:
            return
        if backup:
            try:
                dev = jax.devices()[0]
                host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
                self._paused[tag] = _device_put_tree(tree, host)
            except Exception:
                self._paused[tag] = jax.tree.map(lambda a: jax.device_get(a), tree)
        else:
            self._paused[tag] = None
        # drop device references so XLA can free the HBM
        self._regions[tag] = None

    def resume(self, tag: str = "default", values=None):
        """Restore device residency; `values` re-materializes no-backup tags."""
        staged = values if values is not None else self._paused.get(tag)
        if staged is None:
            raise ValueError(f"tag {tag!r} was paused without backup; pass values=")
        restored = jax.tree.map(
            lambda a, s: jax.device_put(a, s), staged, self._shardings[tag]
        )
        self._regions[tag] = restored
        self._paused[tag] = None
        return restored

    def get(self, tag: str = "default"):
        return self._regions.get(tag)


_global_saver = MemorySaver()


def get_memory_saver() -> MemorySaver:
    return _global_saver
