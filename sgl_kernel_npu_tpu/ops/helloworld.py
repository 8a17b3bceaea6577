"""helloworld — the canonical example op documenting this framework's op
pattern.

Reference parity: csrc/helloworld/ (op_host/helloworld.cpp:19,
op_kernel/kernel_helloworld.cpp:21-47) — a bf16 elementwise add used as the
template for adding new ops (and for version stamping, utils/version.h).

The pattern every op in this package follows:
  1. a jnp reference implementation (`helloworld_ref`) — always correct,
     jittable, the golden for tests and the fallback off-TPU;
  2. a Pallas TPU kernel (`helloworld_pallas`) for ops where control of
     VMEM/DMA/MXU scheduling beats XLA's default fusion;
  3. a dispatching wrapper (`helloworld`) selecting by platform/env
     (utils.use_pallas(), SKT_IMPL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import interpret_mode, use_pallas
from ..version import __version__, git_commit


def helloworld_ref(x, y):
    return x + y


def _kernel(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] + y_ref[...]


def helloworld_pallas(x, y):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x, y)


def helloworld(x, y):
    """bf16 add; logs the package version once like the reference stamps its
    .so (helloworld.cpp:37-45)."""
    if use_pallas():
        return helloworld_pallas(x, y)
    return helloworld_ref(x, y)


def version_info() -> str:
    return f"sgl_kernel_npu_tpu {__version__} ({git_commit()})"
