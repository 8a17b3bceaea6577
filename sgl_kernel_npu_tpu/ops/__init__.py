"""Op surface of sgl_kernel_npu_tpu — TPU-native equivalents of the reference's
csrc/ + python op inventory (SURVEY.md §2.1/§2.4, full map in PARITY.md).

Each op ships as a jnp reference twin (`*_ref`) and, where the op is hot, a
Pallas kernel; the un-suffixed name dispatches on platform/env (SKT_IMPL).
"""

from . import (  # noqa: F401
    activation,
    gdn,
    grammar,
    helloworld,
    kvcache,
    lora,
    mamba,
    matmul,
    mla_preprocess,
    moe_helpers,
    norm,
    qkv_fusion,
    quant,
    rope,
    sampling,
    speculative,
)
from .attention import decode_gqa, decode_mla  # noqa: F401
