from . import low_latency, normal  # noqa: F401
