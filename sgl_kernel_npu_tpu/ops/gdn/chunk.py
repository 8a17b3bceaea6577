"""Chunked Gated-Delta-Net prefill (Qwen3-Next class).

Reference parity: the fla/ Triton pipeline — chunk.py (orchestrator
chunk_gated_delta_rule_fwd:205-259 with native golden
chunk_gated_delta_rule_native:53-204), chunk_scaled_dot_kkt.py, solve_tril.py,
wy_fast.py, chunk_delta_h.py, chunk_o.py, cumsum.py — and the AscendC
mega-kernel csrc/mega_chunk_gdn/ (cumsum -> KK^T -> tri-inverse -> WY ->
chunk-H -> chunk-O fused, GDN_C=GDN_D=128).

TPU design: the five sub-kernels are pure MXU batched matmuls over [B, H, N,
C, D] chunk tensors; XLA fuses the elementwise decay math into them, and the
inter-chunk recurrence is a lax.scan carrying the [B, H, Dk, Dv] state — the
mega-kernel's fusion falls out of jit for free. fp32 throughout the state
path (the reference computes in fp32 too).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .tri_inv import inv_unit_lower


def l2norm(x, eps: float = 1e-6):
    """fla/l2norm.py parity: L2 normalization over the last dim, fp32 math."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * inv).astype(x.dtype)


def chunk_gated_delta_rule(
    q, k, v, g, beta,
    chunk_size: int = 64,
    initial_state=None,
    output_final_state: bool = False,
    use_qk_l2norm_in_kernel: bool = False,
    scale: Optional[float] = None,
):
    """Chunked GDN forward.

    q, k [B, T, H, Dk]; v [B, T, H, Dv]; g, beta [B, T, H] (g = log decay).
    initial_state [B, H, Dk, Dv]. Returns (out [B, T, H, Dv],
    final_state [B, H, Dk, Dv] | None).

    Math matches chunk_gated_delta_rule_native (fla/chunk.py:53-171):
      within-chunk decay D_ij = exp(g_i - g_j) (i >= j, cumsum g)
      T = (I + tril(K_beta K^T * D, -1))^{-1}  (the WY transform)
      W = T (K_beta * exp(g));  U = T V_beta
      per chunk: o = (q * exp(g)) S + tril(q k^T * D) (U - W S)
                 S <- exp(g_C) S + (k * exp(g_C - g))^T (U - W S)
    """
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    if use_qk_l2norm_in_kernel:
        q = l2norm(q)
        k = l2norm(k)
    if scale is None:
        scale = dk ** -0.5

    # [B, H, T, D] fp32, pad T to chunk multiple
    def bhtd(x):
        return x.transpose(0, 2, 1, 3).astype(jnp.float32)

    pad = (-t) % c
    qf = jnp.pad(bhtd(q), ((0, 0), (0, 0), (0, pad), (0, 0))) * scale
    kf = jnp.pad(bhtd(k), ((0, 0), (0, 0), (0, pad), (0, 0)))
    vf = jnp.pad(bhtd(v), ((0, 0), (0, 0), (0, pad), (0, 0)))
    gf = jnp.pad(g.transpose(0, 2, 1).astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
    bf = jnp.pad(beta.transpose(0, 2, 1).astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
    n = (t + pad) // c

    # chunked views [B, H, N, C, D]
    qc = qf.reshape(b, h, n, c, dk)
    kc = kf.reshape(b, h, n, c, dk)
    vc = vf.reshape(b, h, n, c, dv)
    gc = jnp.cumsum(gf.reshape(b, h, n, c), axis=-1)        # within-chunk cumsum
    bc = bf.reshape(b, h, n, c)

    k_beta = kc * bc[..., None]
    v_beta = vc * bc[..., None]

    # decay mask D_ij = exp(g_i - g_j), lower-tri incl diag
    diff = gc[..., :, None] - gc[..., None, :]
    decay = jnp.tril(jnp.exp(jnp.tril(diff)))               # [B, H, N, C, C]

    # WY transform: T = (I - (-attn))^{-1}, attn = -(k_beta k^T * D) strict lower
    kkt = jnp.einsum("bhncd,bhnmd->bhncm", k_beta, kc)      # chunk_scaled_dot_kkt
    a_strict = jnp.tril(kkt * decay, k=-1)                  # strict lower
    # native: attn = -(kkt*decay) strict; T = (I - attn)^{-1} = (I + A)^{-1}
    t_inv = inv_unit_lower(-a_strict)

    u = jnp.einsum("bhncm,bhnmd->bhncd", t_inv, v_beta)     # wy_fast: U
    w = jnp.einsum("bhncm,bhnmd->bhncd", t_inv, k_beta * jnp.exp(gc)[..., None])

    # within-chunk attention for the output — keeps the diagonal (native masks
    # with triu(diagonal=1), fla/chunk.py:139-143)
    qk = jnp.einsum("bhncd,bhnmd->bhncm", qc, kc) * decay
    qk = jnp.tril(qk)

    state0 = (jnp.zeros((b, h, dk, dv), jnp.float32) if initial_state is None
              else initial_state.astype(jnp.float32))

    g_last = gc[..., -1]                                     # [B, H, N]
    k_decay = kc * jnp.exp(g_last[..., None, None] - gc[..., None])

    def step(state, xs):
        q_i, k_i, u_i, w_i, qk_i, g_i, gl_i, kd_i = xs
        v_prime = jnp.einsum("bhcd,bhde->bhce", w_i, state)
        v_new = u_i - v_prime
        attn_inter = jnp.einsum("bhcd,bhde->bhce", q_i * jnp.exp(g_i)[..., None], state)
        o_i = attn_inter + jnp.einsum("bhcm,bhme->bhce", qk_i, v_new)
        new_state = state * jnp.exp(gl_i)[..., None, None] + \
            jnp.einsum("bhcd,bhce->bhde", kd_i, v_new)
        return new_state, o_i

    xs = (
        qc.transpose(2, 0, 1, 3, 4), kc.transpose(2, 0, 1, 3, 4),
        u.transpose(2, 0, 1, 3, 4), w.transpose(2, 0, 1, 3, 4),
        qk.transpose(2, 0, 1, 3, 4), gc.transpose(2, 0, 1, 3),
        g_last.transpose(2, 0, 1), k_decay.transpose(2, 0, 1, 3, 4),
    )
    final_state, o = jax.lax.scan(step, state0, xs)
    out = o.transpose(1, 2, 0, 3, 4).reshape(b, h, n * c, dv)[:, :, :t]
    out = out.transpose(0, 2, 1, 3).astype(q.dtype)
    return out, (final_state if output_final_state else None)


def chunk_gated_delta_rule_varlen(
    q, k, v, g, beta, cu_seqlens, initial_state,
    max_seq_len: Optional[int] = None,
    chunk_size: int = 64,
    use_qk_l2norm_in_kernel: bool = True,
    scale: Optional[float] = None,
):
    """Varlen wrapper over flat [1, total, H, D] inputs + cu_seqlens, with GQA
    head expansion (ref: chunk_gated_delta_rule_npu_native, fla/chunk.py:146-204).

    initial_state [num_seqs, Hv, Dk, Dv]. Returns (out flat [1, total, Hv, Dv],
    final_states [num_seqs, Hv, Dk, Dv]).
    """
    hq = q.shape[-2]
    hv = v.shape[-2]
    if hv > hq:
        rep = hv // hq
        q = jnp.repeat(q, rep, axis=-2)
        k = jnp.repeat(k, rep, axis=-2)

    total = q.shape[1]
    nseq = cu_seqlens.shape[0] - 1
    maxt = max_seq_len or total
    seqlens = (cu_seqlens[1:] - cu_seqlens[:-1]).astype(jnp.int32)
    starts = cu_seqlens[:-1].astype(jnp.int32)

    j = jnp.arange(maxt)
    gcols = jnp.clip(starts[:, None] + j[None, :], 0, total - 1)
    m = j[None, :] < seqlens[:, None]

    def padseq(x, fill=0.0):
        g_ = x[0][gcols]                      # [nseq, maxt, ...]
        return jnp.where(m.reshape(nseq, maxt, *([1] * (g_.ndim - 2))), g_, fill)

    qp, kp, vp = padseq(q), padseq(k), padseq(v)
    gp = padseq(g)                            # decay 0 on padding -> state frozen
    bp = padseq(beta)

    out, final = chunk_gated_delta_rule(
        qp, kp, vp, gp, bp, chunk_size=chunk_size, initial_state=initial_state,
        output_final_state=True, use_qk_l2norm_in_kernel=use_qk_l2norm_in_kernel,
        scale=scale,
    )
    # scatter back to flat
    tgt = jnp.where(m, starts[:, None] + j[None, :], total)
    flat = jnp.zeros((total + 1,) + out.shape[2:], out.dtype).at[tgt.reshape(-1)].set(
        out.reshape(nseq * maxt, *out.shape[2:]), mode="drop")[:total]
    return flat[None], final


def chunk_local_cumsum(g, chunk_size: int, reverse: bool = False):
    """Per-chunk inclusive cumsum over the time dim (fla/cumsum.py parity).

    g [B, T, H] -> same shape; each chunk of `chunk_size` positions cumsums
    independently (the decay-accumulation primitive of the chunk pipeline).
    """
    b, t, h = g.shape
    pad = (-t) % chunk_size
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    n = (t + pad) // chunk_size
    gc = gp.reshape(b, n, chunk_size, h)
    if reverse:
        out = jnp.flip(jnp.cumsum(jnp.flip(gc, 2), axis=2), 2)
    else:
        out = jnp.cumsum(gc, axis=2)
    return out.reshape(b, n * chunk_size, h)[:, :t].astype(g.dtype)
