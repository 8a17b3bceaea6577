"""Model families wiring the kernel library end-to-end (BASELINE.json configs)."""

from . import llama  # noqa: F401
