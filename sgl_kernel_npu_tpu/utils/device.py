"""Device/platform introspection and kernel-impl selection.

Reference parity: python/sgl_kernel_npu/sgl_kernel_npu/utils/triton_utils.py
(get_device_properties -> #cube/#vector cores used for grid sizing). On TPU the
analogous numbers are core count, VMEM budget and HBM bandwidth; we also decide
here whether Pallas kernels run compiled (TPU) or interpreted (CPU test mesh).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax

from . import env


@dataclass(frozen=True)
class DeviceProperties:
    platform: str          # "tpu" | "cpu" | ...
    num_devices: int
    # Per-chip numbers (TPU v5e defaults; refined per detected kind).
    hbm_bytes: int
    hbm_gbps: float        # HBM bandwidth GB/s, for roofline estimates
    vmem_bytes: int
    bf16_tflops: float
    int8_tops: float


_TPU_SPECS = {
    # kind-substring -> (hbm GB, hbm GB/s, vmem MB, bf16 TFLOPs, int8 TOPs)
    "v5 lite": (16, 819, 128, 197, 394),
    "v5litepod": (16, 819, 128, 197, 394),
    "v5e": (16, 819, 128, 197, 394),
    "v5p": (95, 2765, 128, 459, 918),
    "v4": (32, 1228, 128, 275, 275),
    "v6": (32, 1640, 128, 918, 1836),
}


@functools.lru_cache(maxsize=1)
def get_device_properties() -> DeviceProperties:
    devs = jax.devices()
    platform = devs[0].platform if devs else "cpu"
    hbm, bw, vmem, tflops, tops = (16, 819, 128, 197, 394)
    if platform == "tpu":
        kind = getattr(devs[0], "device_kind", "").lower()
        for key, spec in _TPU_SPECS.items():
            if key in kind:
                hbm, bw, vmem, tflops, tops = spec
                break
    return DeviceProperties(
        platform=platform,
        num_devices=len(devs),
        hbm_bytes=hbm << 30,
        hbm_gbps=float(bw),
        vmem_bytes=vmem << 20,
        bf16_tflops=float(tflops),
        int8_tops=float(tops),
    )


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def use_pallas() -> bool:
    """Whether wrappers should call the Pallas kernel (vs the jnp reference)."""
    mode = env.impl_mode()
    if mode == "ref":
        return False
    if mode == "pallas":
        return True
    return on_tpu()


def interpret_mode() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU test meshes)."""
    return not on_tpu()
