"""Triangular inverse for the GDN pipeline.

Reference parity: csrc/tri_inv/ (`tri_inv_col_sweep`, include/sgl_kenel_npu_ops.h:167,
vector-only, n in {16,32,64,128}) and the Triton blocked solver
python fla/solve_tril.py (16x16 base inverses merged to 32/64).

TPU design: the GDN use is always (I - A)^{-1} for STRICT lower-triangular A —
A is nilpotent, so the inverse is the finite Neumann series, computed in
ceil(log2(n)) MXU matmuls via repeated squaring:
(I-A)^{-1} = (I+A)(I+A^2)(I+A^4)...  No sequential column sweep needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv_unit_lower(a):
    """Inverse of (I - A) for strictly-lower-triangular A ([..., n, n])."""
    n = a.shape[-1]
    out = jnp.eye(n, dtype=a.dtype) + a
    p = a
    steps = max(1, (n - 1).bit_length())
    for _ in range(steps - 1):
        p = jnp.matmul(p, p)
        out = out + jnp.matmul(out, p)
    return out


def tri_inv_col_sweep(m):
    """Inverse of a unit-diagonal lower-triangular matrix ([..., n, n]).

    Parity with csrc/tri_inv's op surface: m = I - A_strict; returns m^{-1}.
    """
    n = m.shape[-1]
    a = jnp.tril(-(m - jnp.eye(n, dtype=m.dtype)), k=-1)
    return inv_unit_lower(a)


def solve_tril(a):
    """fla/solve_tril.py parity: given strict-lower A (attn matrix), return
    (I - A)^{-1} — the form chunk_gated_delta_rule consumes."""
    return inv_unit_lower(jnp.tril(a, k=-1))
