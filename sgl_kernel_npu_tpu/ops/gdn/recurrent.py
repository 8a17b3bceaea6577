"""Recurrent (decode-time) gated delta rule with paged SSM state.

Reference parity: csrc/recurrent_gated_delta_rule/ (signature
include/sgl_kenel_npu_ops.h:101-108); golden semantics from
tests/python/sgl_kernel_npu/test_recurrent_gated_delta_rule.py run_golden:
  split mix_qkv -> q,k,v; L2norm q,k; q *= scale; alpha = exp(g);
  beta = sigmoid(be); per token: S = S*alpha; y = (v - S.k) * beta;
  S += y (x) k; out = S.q; state written per-slot via ssm_state_indices;
  MTP: initial state read from slot (seq_start + num_accepted-1); optional
  intermediate_state cache seeded with the recurrent state at step 0.

State layout [num_slots, Hv, Dv, Dk] (reference layout).

TPU design: sequences are padded to a static max step count and the token
recurrence is one lax.scan whose body is batched over (seq, head) — each step
is a rank-1 delta update, pure VPU + small MXU contractions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .chunk import l2norm


def recurrent_gated_delta_rule(
    mix_qkv, recurrent_state, beta, scale, actual_seq_lengths,
    ssm_state_indices, nk: int, nv: int,
    intermediate_state=None, cache_indices=None, num_accepted_tokens=None,
    g=None, gk=None, max_steps: Optional[int] = None,
):
    """mix_qkv [T, nk*dk*2 + nv*dv]; recurrent_state [slots, nv, dv, dk];
    beta [T, nv] (pre-sigmoid); g [T, nv] (log decay); actual_seq_lengths
    [num_seqs]; ssm_state_indices [T] state slot per token.

    Returns (out [T, nv, dv], new_state [slots, nv, dv, dk]).
    """
    t = mix_qkv.shape[0]
    slots = recurrent_state.shape[0]
    dv = recurrent_state.shape[2]
    dk = recurrent_state.shape[3]
    nseq = actual_seq_lengths.shape[0]
    maxs = max_steps or t

    x32 = mix_qkv.astype(jnp.float32)
    qf, kf, vf = jnp.split(x32, [nk * dk, 2 * nk * dk], axis=-1)
    qf = l2norm(qf.reshape(t, nk, dk))
    kf = l2norm(kf.reshape(t, nk, dk))
    vf = vf.reshape(t, nv, dv)
    if scale is None:
        scale = dk ** -0.5
    qf = qf * scale

    alpha = jnp.exp(g.astype(jnp.float32)) if g is not None else jnp.ones((t, nv), jnp.float32)
    bsig = jax.nn.sigmoid(beta.astype(jnp.float32)) if beta is not None else jnp.ones((t, nv), jnp.float32)

    # GQA head map
    rep = nv // nk
    head_src = jnp.arange(nv) // rep

    # group tokens by sequence: [nseq, maxs]
    lens = actual_seq_lengths.astype(jnp.int32)
    starts = jnp.cumsum(lens) - lens
    j = jnp.arange(maxs)
    tok = starts[:, None] + j[None, :]
    m = j[None, :] < lens[:, None]
    tok_safe = jnp.clip(tok, 0, t - 1)

    state_full = recurrent_state.astype(jnp.float32)
    if intermediate_state is not None and cache_indices is not None:
        # seed the intermediate cache's step-0 with the recurrent state
        ci = jnp.clip(cache_indices.astype(jnp.int32), 0, intermediate_state.shape[0] - 1)
        inter = intermediate_state.at[ci, 0].set(
            recurrent_state[ci].astype(intermediate_state.dtype))
        state_full = inter.reshape(-1, nv, dv, dk).astype(jnp.float32)
        slots = state_full.shape[0]

    # initial state per sequence
    if num_accepted_tokens is not None:
        init_tok = starts + num_accepted_tokens.astype(jnp.int32) - 1
    else:
        init_tok = starts
    init_slot = ssm_state_indices[jnp.clip(init_tok, 0, t - 1)].astype(jnp.int32)
    s0 = state_full[jnp.clip(init_slot, 0, slots - 1)]   # [nseq, nv, dv, dk]

    def step(carry, j_idx):
        s = carry                                         # [nseq, nv, dv, dk]
        tk = tok_safe[:, j_idx]
        active = m[:, j_idx]
        q_i = qf[tk][:, head_src]                         # [nseq, nv, dk]
        k_i = kf[tk][:, head_src]
        v_i = vf[tk]                                      # [nseq, nv, dv]
        a_i = alpha[tk]
        b_i = bsig[tk]

        s_new = s * a_i[..., None, None]
        x = jnp.einsum("snvk,snk->snv", s_new, k_i)       # S.k  [nseq, nv, dv]
        y = (v_i - x) * b_i[..., None]
        s_new = s_new + y[..., :, None] * k_i[..., None, :]
        o_i = jnp.einsum("snvk,snk->snv", s_new, q_i)

        s = jnp.where(active[:, None, None, None], s_new, s)
        o_i = jnp.where(active[:, None, None], o_i, 0.0)
        slot = jnp.where(active, ssm_state_indices[tk].astype(jnp.int32), slots)
        return s, (o_i, slot, s_new)

    _, (outs, slot_ids, states) = jax.lax.scan(step, s0, jnp.arange(maxs))
    # outs: [maxs, nseq, nv, dv] -> flat [T, nv, dv]
    out = jnp.zeros((t + 1, nv, dv), jnp.float32).at[
        jnp.where(m.T, tok_safe.T, t).reshape(-1)
    ].set(outs.reshape(maxs * nseq, nv, dv), mode="drop")[:t]

    # state writes: every active token writes its (possibly intermediate) state
    # to its slot; later steps overwrite earlier ones at the same slot.
    new_state = state_full
    for sidx in range(maxs):  # static, ordered overwrites
        new_state = new_state.at[slot_ids[sidx]].set(
            jnp.where(m[:, sidx][:, None, None, None], states[sidx],
                      new_state[jnp.clip(slot_ids[sidx], 0, slots - 1)]),
            mode="drop")
    return out.astype(mix_qkv.dtype), new_state.astype(recurrent_state.dtype)
