"""Small MoE helper ops.

Reference parity (python/sgl_kernel_npu/sgl_kernel_npu/moe/):
  mul_add.py:7-60                       -> mul_add (routed*factor + shared)
  zero_experts_compute_identity.py:7-81 -> zero_experts_compute_identity

Both are single-pass VPU elementwise ops that XLA fuses; no Pallas needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def mul_add(routed_input, shared_input, scaling_factor):
    """out = routed * factor + shared (merging routed-expert and shared-expert
    branches of an MoE layer)."""
    return (routed_input.astype(jnp.float32) * scaling_factor
            + shared_input.astype(jnp.float32)).astype(routed_input.dtype)


def zero_experts_compute_identity(expert_indices, expert_scales, num_experts,
                                  zero_expert_type, hidden_states,
                                  identity_mask_value=0):
    """'Zero experts' (ids >= num_experts) contribute an identity-weighted
    passthrough of the hidden states; their slots are then neutralised so the
    real expert path ignores them.

    Returns (zero_result, new_expert_indices, new_expert_scales):
      zero_result[s] = hidden[s] * sum of scales of zero-expert slots
      slots with idx >= num_experts: scale -> 0, idx -> identity_mask_value.
    (The reference mutates indices/scales in place; JAX returns new arrays.)
    """
    assert zero_expert_type == "identity"
    is_zero = expert_indices >= num_experts
    sum_scales = jnp.sum(jnp.where(is_zero, expert_scales, 0.0), axis=1, keepdims=True)
    zero_result = (hidden_states.astype(jnp.float32) * sum_scales).astype(hidden_states.dtype)
    new_scales = jnp.where(is_zero, 0.0, expert_scales)
    new_indices = jnp.where(is_zero, identity_mask_value, expert_indices)
    return zero_result, new_indices, new_scales
