"""Env flag system + Config presets (reference: the DEEP_USE_MODE /
DEEPEP_* env table, python/deep_ep/README.md:213-227)."""

from sgl_kernel_npu_tpu.parallel.config import Config
from sgl_kernel_npu_tpu.utils import env


def test_deep_use_mode_parsing(monkeypatch):
    monkeypatch.setenv("SKT_DEEP_USE_MODE", "alltoall,pallas")
    assert env.deep_use_mode() == ("alltoall", "pallas")
    monkeypatch.setenv("SKT_DEEP_USE_MODE", "default")
    assert env.deep_use_mode() == ("default", "default")
    monkeypatch.delenv("SKT_DEEP_USE_MODE")
    assert env.deep_use_mode() == ("default", "default")


def test_long_seq_limits(monkeypatch):
    monkeypatch.setenv("SKT_NORMAL_LONG_SEQ_ROUND", "1000")   # > 256 cap
    monkeypatch.setenv("SKT_NORMAL_PER_ROUND_TOKENS", "8192")
    rounds, per = env.long_seq_config()
    assert rounds <= env.MAX_LONG_SEQ_ROUNDS
    assert rounds * per <= env.MAX_LONG_SEQ_TOKENS


def test_env_bool_int(monkeypatch):
    monkeypatch.setenv("SKT_BF16_DISPATCH", "true")
    assert env.bf16_dispatch()
    monkeypatch.setenv("SKT_SHARED_EXPERT_RANK_NUM", "-3")
    assert env.shared_expert_rank_num() == 0  # clamped


def test_config_presets():
    assert Config.get_dispatch_config(8).chunk_tokens == 512
    assert Config.get_dispatch_config(64).chunk_tokens == 128
    assert Config.get_combine_config(16).chunk_tokens == 256
