"""Per-call EP communication config.

Reference parity: deep_ep_cpp.Config (csrc/deepep/config.cpp, pybind at
pybind_extension.cpp:17-48) — num_sms + chunk sizes — and the per-EP-size
preset tables in python/deep_ep/deep_ep/buffer.py:138-179.

On TPU "num_sms" has no direct analogue (XLA owns core scheduling); the knobs
that matter are the chunk size used to pipeline ICI transfers against compute
and the worst-case token padding that keeps shapes static.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Config:
    # Pipeline chunk (tokens) for comm/compute overlap in fused paths.
    chunk_tokens: int = 256
    # Kept for reference call-site compatibility (Buffer.set_num_sms): the
    # number of comm "lanes"; XLA owns TPU core scheduling.
    default_num_sms = 24
    # Static worst-case receive factor: a rank receives at most
    # ceil(total_tokens * factor / num_ranks) tokens in normal mode.
    max_recv_factor: float = 2.0

    @staticmethod
    def get_dispatch_config(num_ranks: int) -> "Config":
        """Preset table analogous to buffer.py:138-158 (tuned num_sms/chunks
        per EP size -> here chunk sizes per EP size)."""
        if num_ranks <= 8:
            return Config(chunk_tokens=512)
        if num_ranks <= 32:
            return Config(chunk_tokens=256)
        return Config(chunk_tokens=128)

    @staticmethod
    def get_combine_config(num_ranks: int) -> "Config":
        """Analogous to buffer.py:160-179."""
        if num_ranks <= 8:
            return Config(chunk_tokens=512)
        if num_ranks <= 32:
            return Config(chunk_tokens=256)
        return Config(chunk_tokens=128)
