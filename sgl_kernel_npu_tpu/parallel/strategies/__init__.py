from . import low_latency, normal, pallas_ll  # noqa: F401
