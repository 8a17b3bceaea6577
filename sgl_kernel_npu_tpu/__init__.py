"""sgl_kernel_npu_tpu — a TPU-native (JAX/XLA/Pallas) kernel + expert-parallel
communication library with the capabilities of sgl-project/sgl-kernel-npu.

Subpackages:
  ops       kernel library (attention, norms, quant matmuls, SSM, LoRA, ...)
  parallel  DeepEP-equivalent expert-parallel dispatch/combine over ICI/DCN
  models    model families wiring the ops end-to-end (Llama GQA, DeepSeek MLA,
            DeepSeek-V3-class MoE, Qwen-Next hybrid SSM)
  utils     env flags, logging, device introspection
"""

from .version import __version__  # noqa: F401
