"""Mamba/SSM causal-conv1d ops: varlen prefill, decode state update,
speculative-decode state management.

Reference parity:
  csrc/causal_conv1d/ + python mamba/causal_conv1d.py
    causal_conv1d_fn_native (:651-696)  -> causal_conv1d_fn
    causal_conv1d_update_npu (:1266-1428) -> causal_conv1d_update
      (cache_seqlens accepted; the reference documents a circular mode for it
       but its kernel never loads cache_seqlens_ptr (:981 is the only
       occurrence) and validate asserts it None — executed semantics are the
       plain sliding-window update, which this op matches exactly)
  csrc/causal_conv1d_update/ (+ rollback support)
  python mamba/mamba_state_update_triton.py
    conv_state_rollback (:150-287) -> conv_state_rollback
    move_intermediate_cache (:86-146) -> move_intermediate_cache

TPU design: width-W depthwise causal conv is W shifted multiply-adds on the
VPU — XLA fuses the whole thing; the update path is a roll+append on the state
window. Speculative decoding keeps per-step intermediate windows and rolls
back by shifting the window right by (draft_token_num-1-accepted).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

PAD_SLOT_ID = -1


def _act(x, activation):
    if activation in ("silu", "swish"):
        return x * jax.nn.sigmoid(x)
    return x


def causal_conv1d_fn(x, weight, bias=None, initial_states=None,
                     activation: Optional[str] = "silu",
                     return_final_states: bool = False, seqlens=None):
    """Depthwise causal conv over [B, dim, T].

    weight [dim, W]; bias [dim]; initial_states [B, dim, W-1] (zeros if None).
    Returns out [B, dim, T] (+ final_states [B, dim, W-1] when requested,
    taken at the end of each sequence per `seqlens`, matching
    causal_conv1d_fn_native's gather).
    """
    b, dim, t = x.shape
    _, w = weight.shape
    x32 = x.astype(jnp.float32)
    if initial_states is None:
        init = jnp.zeros((b, dim, w - 1), jnp.float32)
        had_init = False
    else:
        init = initial_states.astype(jnp.float32)
        had_init = True
    xp = jnp.concatenate([init, x32], axis=-1)          # [B, dim, W-1+T]

    out = jnp.zeros((b, dim, t), jnp.float32)
    for i in range(w):
        out = out + weight[None, :, i:i + 1].astype(jnp.float32) * xp[..., i:i + t]
    if bias is not None:
        out = out + bias[None, :, None].astype(jnp.float32)
    out = _act(out, activation).astype(x.dtype)

    if not return_final_states:
        return out, None
    if seqlens is None:
        seqlens = jnp.full((b,), t, jnp.int32)
    # Final state = last W-1 inputs of each sequence. In the concatenated
    # buffer xp (= [init|x], init zeroed for rows without one) the columns are
    # uniformly seqlens..seqlens+W-2 — the native per-row base/mask arithmetic
    # (causal_conv1d.py:687-694) reduces to this because its negative-position
    # zero-fill equals reading the zeroed prepend.
    del had_init
    idx = seqlens.astype(jnp.int32)[:, None] + jnp.arange(w - 1)[None, :]  # [B, W-1]
    gather = jnp.take_along_axis(
        xp, jnp.clip(idx, 0, xp.shape[-1] - 1)[:, None, :].repeat(dim, 1), axis=2
    )
    return out, gather.astype(x.dtype)


def causal_conv1d_varlen(x_flat, query_start_loc, weight, bias=None,
                         conv_states=None, cache_indices=None,
                         has_initial_state=None, activation="silu",
                         max_seq_len: Optional[int] = None):
    """Varlen prefill over flat [dim, total_tokens] + cu_seqlens
    (ref: prepare_data + causal_conv1d_fn_npu, causal_conv1d.py:699-790).

    Returns (out_flat [dim, total_tokens], final_states [B, dim, W-1]).
    """
    dim, total = x_flat.shape
    bsz = query_start_loc.shape[0] - 1
    seqlens = (query_start_loc[1:] - query_start_loc[:-1]).astype(jnp.int32)
    maxt = max_seq_len or total

    j = jnp.arange(maxt)
    starts = query_start_loc[:-1].astype(jnp.int32)
    gather_cols = jnp.clip(starts[:, None] + j[None, :], 0, total - 1)
    mask = j[None, :] < seqlens[:, None]
    x_pad = jnp.where(mask[:, None, :], x_flat[:, gather_cols].transpose(1, 0, 2), 0.0)

    init = None
    if conv_states is not None and has_initial_state is not None:
        ci = (cache_indices if cache_indices is not None
              else jnp.arange(bsz)).astype(jnp.int32)
        init = (conv_states[jnp.clip(ci, 0, conv_states.shape[0] - 1)]
                * has_initial_state[:, None, None])

    out_pad, final = causal_conv1d_fn(
        x_pad, weight, bias, initial_states=init, activation=activation,
        return_final_states=True, seqlens=seqlens,
    )
    # un-pad back to flat layout
    flat_idx = starts[:, None] + j[None, :]
    tgt = jnp.where(mask, flat_idx, total)
    out_flat = jnp.zeros((dim, total + 1), out_pad.dtype).at[:, tgt.reshape(-1)].set(
        out_pad.transpose(1, 0, 2).reshape(dim, -1), mode="drop"
    )[:, :total]
    return out_flat, final


def causal_conv1d_update(x, conv_state, weight, bias=None, activation=None,
                         conv_state_indices=None, num_accepted_tokens=None,
                         intermediate_conv_window=None,
                         pad_slot_id: int = PAD_SLOT_ID, cache_seqlens=None):
    """Decode-time conv update.

    x [B, dim] or [B, dim, S]; conv_state [cache_lines, dim, state_len];
    conv_state_indices [B] picks cache lines (pad_slot_id rows are skipped).
    Returns (out like x, new_conv_state[, new_intermediate]) — intermediate
    windows [B, S, dim, state_len] are recorded per decoded step when a buffer
    is passed (speculative decoding; rollback is conv_state_rollback).

    cache_seqlens: accepted for reference API parity. The reference DOCUMENTS
    a circular-buffer mode for it (causal_conv1d.py:1287-1291) but its kernel
    never reads the pointer — `cache_seqlens_ptr` appears in
    _causal_conv1d_update_kernel's signature (:981) and nowhere else, and
    validate_data asserts it None (:1305,:1336) — so the reference's executed
    semantics with cache_seqlens set are the ordinary sliding-window update.
    This op matches that actual behavior (tests/test_mamba.py documents it).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    b, dim, s = x.shape
    lines, _, state_len = conv_state.shape
    _, w = weight.shape

    idx = (conv_state_indices if conv_state_indices is not None
           else jnp.arange(b)).astype(jnp.int32)
    valid = idx != pad_slot_id
    idx_safe = jnp.clip(idx, 0, lines - 1)
    state = conv_state[idx_safe].astype(jnp.float32)     # [B, dim, state_len]

    x32 = x.astype(jnp.float32)
    outs = []
    inters = []
    for step in range(s):
        window = jnp.concatenate([state[..., -(w - 1):], x32[..., step:step + 1]], -1)
        y = jnp.sum(window * weight[None].astype(jnp.float32), axis=-1)
        if bias is not None:
            y = y + bias[None].astype(jnp.float32)
        outs.append(_act(y, activation))
        state = jnp.concatenate([state[..., 1:], x32[..., step:step + 1]], -1)
        inters.append(state)

    out = jnp.stack(outs, axis=-1).astype(x.dtype)       # [B, dim, S]
    new_state = jnp.where(valid[:, None, None], state, conv_state[idx_safe].astype(jnp.float32))
    new_conv = conv_state.at[jnp.where(valid, idx_safe, lines)].set(
        new_state.astype(conv_state.dtype), mode="drop")

    results = (out[..., 0] if squeeze else out, new_conv)
    if intermediate_conv_window is not None:
        inter = jnp.stack(inters, axis=1).astype(intermediate_conv_window.dtype)
        results = results + (inter,)
    return results


def conv_state_rollback(conv_states, state_indices, step_indices, draft_token_num):
    """Shift each request's window right by (draft_token_num-1-step) dropping
    rejected-token entries (ref kernel: mamba_state_update_triton.py:150-223).

    conv_states [num_layers, pool, window, dims]; returns updated array."""
    l, pool, win, dims = conv_states.shape
    shift = (draft_token_num - 1) - step_indices.astype(jnp.int32)  # [R]
    do = (step_indices >= 0) & (shift > 0)
    idx_safe = jnp.clip(state_indices.astype(jnp.int32), 0, pool - 1)

    rows = conv_states[:, idx_safe]                      # [L, R, win, dims]
    src = jnp.arange(win)[None, :] - shift[:, None]      # dst w <- src w-shift
    src_safe = jnp.clip(src, 0, win - 1)
    shifted = jnp.take_along_axis(
        rows, src_safe[None, :, :, None].repeat(l, 0).repeat(dims, 3), axis=2
    )
    shifted = jnp.where((src >= 0)[None, :, :, None], shifted, rows)
    new_rows = jnp.where(do[None, :, None, None], shifted, rows)
    tgt = jnp.where(do, idx_safe, pool)
    return conv_states.at[:, tgt].set(new_rows, mode="drop")


def move_intermediate_cache(ssm_states, intermediate_state_cache,
                            dst_indices, src_indices, last_steps):
    """ssm_states[:, dst] = intermediate_state_cache[:, src, last_step]
    (ref: mamba_state_update_triton.py:86-146)."""
    l, s, d, h, v, k = intermediate_state_cache.shape
    src = jnp.clip(src_indices.astype(jnp.int32), 0, s - 1)
    stp = jnp.clip(last_steps.astype(jnp.int32), 0, d - 1)
    vals = intermediate_state_cache[:, src, stp]         # [L, R, H, V, K]
    tgt = jnp.clip(dst_indices.astype(jnp.int32), 0, ssm_states.shape[1] - 1)
    return ssm_states.at[:, tgt].set(vals.astype(ssm_states.dtype))
