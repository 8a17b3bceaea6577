from . import layered, low_latency, normal, pallas_ll  # noqa: F401
