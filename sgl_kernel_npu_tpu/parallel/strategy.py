"""EP communication strategy ABCs + registries.

Reference parity: python/deep_ep/deep_ep/ep_strategy.py:32-260 — abstract
NormalEPCommStrategy / LowLatencyEPCommStrategy with name registries and
decorator-based registration, selected via DEEP_USE_MODE (buffer.py:85-123).
Here the env var is SKT_DEEP_USE_MODE ("normal_name,low_latency_name").

All strategy methods are *per-shard* functions: they must be called inside a
shard_map over the EP mesh axis (the TPU analogue of "inside the HCCL
communicator"). They are pure and jittable with static shapes.
"""

from __future__ import annotations

import abc
from typing import Dict, Type

_NORMAL_REGISTRY: Dict[str, Type["NormalEPCommStrategy"]] = {}
_LOW_LATENCY_REGISTRY: Dict[str, Type["LowLatencyEPCommStrategy"]] = {}


def register_normal_strategy(name: str):
    def deco(cls):
        _NORMAL_REGISTRY[name] = cls
        cls.strategy_name = name
        return cls

    return deco


def register_low_latency_strategy(name: str):
    def deco(cls):
        _LOW_LATENCY_REGISTRY[name] = cls
        cls.strategy_name = name
        return cls

    return deco


def get_normal_strategy(name: str) -> "NormalEPCommStrategy":
    return _NORMAL_REGISTRY[name]()


def get_low_latency_strategy(name: str) -> "LowLatencyEPCommStrategy":
    return _LOW_LATENCY_REGISTRY[name]()


def normal_strategy_names():
    return sorted(_NORMAL_REGISTRY)


def low_latency_strategy_names():
    return sorted(_LOW_LATENCY_REGISTRY)


class NormalEPCommStrategy(abc.ABC):
    """Prefill/training-path EP comm (ref: NormalEPCommStrategy ABC)."""

    strategy_name = "?"

    @abc.abstractmethod
    def dispatch(self, x, topk_idx, topk_weights, *, axis_name, num_experts,
                 num_ranks, quant_mode="bf16", capacity_factor=2.0, config=None):
        """-> DispatchResult (see strategies.normal)."""

    @abc.abstractmethod
    def combine(self, x, handle, topk_weights, *, axis_name, config=None):
        """-> (combined_x [T,H], combined_topk_weights [T,K])."""


class LowLatencyEPCommStrategy(abc.ABC):
    """Decode-path EP comm (ref: LowLatencyEPCommStrategy ABC)."""

    strategy_name = "?"

    @abc.abstractmethod
    def low_latency_dispatch(self, x, topk_idx, *, axis_name, num_experts,
                             num_ranks, num_max_dispatch_tokens_per_rank,
                             quant_mode="bf16"):
        """-> LowLatencyDispatchResult (see strategies.low_latency)."""

    @abc.abstractmethod
    def low_latency_combine(self, x, topk_idx, topk_weights, handle, *, axis_name):
        """-> combined_x [T, H]."""
