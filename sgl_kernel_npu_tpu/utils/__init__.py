from . import env  # noqa: F401
from .device import (  # noqa: F401
    DeviceProperties,
    get_device_properties,
    interpret_mode,
    on_tpu,
    use_pallas,
)
from .logging import get_logger, log_parameters  # noqa: F401


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
