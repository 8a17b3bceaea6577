"""Collective wrappers.

`ragged_all_to_all` is the workhorse of the EP layer (the TPU equivalent of the
reference's direct peer-HCCS-window writes, SURVEY.md §2.8). XLA lowers it to
ICI-native ragged transfers on TPU, but the CPU backend (used by the 8-device
virtual test mesh) has no ThunkEmitter for it — so off-TPU we emulate it with
an all_gather + local slice assembly. Semantics follow jax.lax.ragged_all_to_all
exactly: per-rank offset arrays of length R*S carry S slices per peer, and
output_offsets name where each sent slice lands in its receiver's output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def ragged_all_to_all(operand, output, input_offsets, send_sizes,
                      output_offsets, recv_sizes, *, axis_name):
    if _on_tpu():
        return jax.lax.ragged_all_to_all(
            operand, output, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=axis_name,
        )
    return _emulated(operand, output, input_offsets, send_sizes,
                     output_offsets, recv_sizes, axis_name=axis_name)


def _emulated(operand, output, input_offsets, send_sizes, output_offsets,
              recv_sizes, *, axis_name):
    r = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    s = input_offsets.shape[0] // r  # slices per peer
    sbuf = operand.shape[0]
    out_rows = output.shape[0]

    g_op = jax.lax.all_gather(operand, axis_name)          # [R, SBUF, ...]
    g_in = jax.lax.all_gather(input_offsets, axis_name)    # [R, R*S]
    g_sz = jax.lax.all_gather(send_sizes, axis_name)
    g_out = jax.lax.all_gather(output_offsets, axis_name)

    out = output
    rows = jnp.arange(sbuf)
    for i in range(r):
        # slices rank i sends to me
        off_in = jax.lax.dynamic_slice(g_in[i], (me * s,), (s,))
        sizes = jax.lax.dynamic_slice(g_sz[i], (me * s,), (s,))
        off_out = jax.lax.dynamic_slice(g_out[i], (me * s,), (s,))
        rel = rows[None, :] - off_in[:, None]                     # [S, SBUF]
        m = (rel >= 0) & (rel < sizes[:, None])
        tgt = jnp.where(m, off_out[:, None] + rel, out_rows)      # drop sentinel
        src_rows = jnp.broadcast_to(rows[None, :], tgt.shape)
        vals = g_op[i][src_rows.reshape(-1)]
        out = out.at[tgt.reshape(-1)].set(vals, mode="drop")
    return out
