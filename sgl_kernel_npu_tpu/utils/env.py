"""Runtime env-var flag system.

The reference's de-facto config system is env vars (SURVEY.md §5 "Config/flag
system"; reference table at python/deep_ep/README.md:213-227, reads at
csrc/deepep/deep_ep.cpp:53-56,287,903-909). We keep the same tiered design:

  tier 1: build/install time   -> not applicable (pure Python + Pallas)
  tier 2: env vars             -> this module (parsed once, cached, overridable)
  tier 3: per-call Config      -> sgl_kernel_npu_tpu.parallel.config.Config

Flags (TPU names, reference analogue in parens):

  SKT_IMPL                       "auto" | "ref" | "pallas"  kernel impl selection
                                 (ref: GDN_ATTN_BACKEND_TRITON-style switches)
  SKT_DEEP_USE_MODE              EP strategy names "normal,low_latency"
                                 (ref: DEEP_USE_MODE, buffer.py:85-94)
  SKT_NORMAL_LONG_SEQ_ROUND      multi-round long-seq dispatch rounds, <=256
                                 (ref: DEEPEP_NORMAL_LONG_SEQ_ROUND)
  SKT_NORMAL_PER_ROUND_TOKENS    tokens per round, <=8192
                                 (ref: DEEPEP_NORMAL_LONG_SEQ_PER_ROUND_TOKENS)
  SKT_COMBINE_ENABLE_LONG_SEQ    bool (ref: DEEPEP_NORMAL_COMBINE_ENABLE_LONG_SEQ)
  SKT_SHARED_EXPERT_RANK_NUM     int (ref: MOE_SHARED_EXPERT_RANK_NUM)
  SKT_EXPERT_TOKEN_NUMS_TYPE     0=cumsum 1=count (ref: MOE_EXPERT_TOKEN_NUMS_TYPE)
  SKT_ENABLE_TOPK_NEG_ONE        bool: topk_idx==-1 means "drop token"
                                 (ref: MOE_ENABLE_TOPK_NEG_ONE)
  SKT_BF16_DISPATCH              bool: skip INT8 comm quant
                                 (ref: SGLANG_DEEPEP_BF16_DISPATCH)
  SKT_DECODE_UNROLL              bool: unroll the decode layer loop (escape
                                 hatch for scan+aliasing compile pathologies)
  SKT_LOG_LEVEL                  logging level for the package logger
"""

from __future__ import annotations

import os
from typing import Optional

_TRUE = ("1", "true", "yes", "on")

# Limits mirrored from the reference adapter (csrc/deepep/deep_ep.cpp:25-28,71-75).
MAX_LONG_SEQ_ROUNDS = 256
MAX_PER_ROUND_TOKENS = 8192
MAX_LONG_SEQ_TOKENS = 131072


def env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in _TRUE


def env_int(name: str, default: int, lo: Optional[int] = None, hi: Optional[int] = None) -> int:
    v = os.environ.get(name)
    if v is None:
        out = default
    else:
        try:
            out = int(v)
        except ValueError:
            out = default
    if lo is not None:
        out = max(lo, out)
    if hi is not None:
        out = min(hi, out)
    return out


def env_str(name: str, default: str = "") -> str:
    return os.environ.get(name, default)


def impl_mode() -> str:
    """Kernel implementation selection: auto (pallas on TPU, ref elsewhere),
    or forced 'ref' / 'pallas'."""
    mode = env_str("SKT_IMPL", "auto").lower()
    if mode not in ("auto", "ref", "pallas"):
        mode = "auto"
    return mode


def deep_use_mode() -> tuple:
    """EP strategy pair selection (normal_name, low_latency_name).

    Reference: DEEP_USE_MODE parsed in python/deep_ep/deep_ep/buffer.py:85-123.
    """
    raw = env_str("SKT_DEEP_USE_MODE", "default,default")
    parts = [p.strip() or "default" for p in raw.split(",")]
    while len(parts) < 2:
        parts.append("default")
    return parts[0], parts[1]


def long_seq_config() -> tuple:
    """(rounds, per_round_tokens) for multi-round normal dispatch.

    Reference: csrc/deepep/deep_ep.cpp:54-78 — rounds<=256, tokens<=8192,
    product<=131072."""
    rounds = env_int("SKT_NORMAL_LONG_SEQ_ROUND", 1, lo=1, hi=MAX_LONG_SEQ_ROUNDS)
    per_round = env_int("SKT_NORMAL_PER_ROUND_TOKENS", MAX_PER_ROUND_TOKENS, lo=1, hi=MAX_PER_ROUND_TOKENS)
    if rounds * per_round > MAX_LONG_SEQ_TOKENS:
        rounds = max(1, MAX_LONG_SEQ_TOKENS // per_round)
    return rounds, per_round


def shared_expert_rank_num() -> int:
    return env_int("SKT_SHARED_EXPERT_RANK_NUM", 0, lo=0)


def expert_token_nums_type() -> int:
    return env_int("SKT_EXPERT_TOKEN_NUMS_TYPE", 1, lo=0, hi=1)


def enable_topk_neg_one() -> bool:
    return env_bool("SKT_ENABLE_TOPK_NEG_ONE", False)


def bf16_dispatch() -> bool:
    return env_bool("SKT_BF16_DISPATCH", False)


