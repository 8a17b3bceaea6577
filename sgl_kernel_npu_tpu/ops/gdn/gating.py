"""GDN gating + gated layernorm + fused sigmoid-gating recurrent update +
Qwen-Next QKVZ/BA projection split.

Reference parity (python/sgl_kernel_npu/sgl_kernel_npu/fla/):
  fused_gdn_gating.py:12-128    -> fused_gdn_gating
    g = -exp(A_log) * softplus(a + dt_bias; beta, threshold), beta = sigmoid(b)
  fused_gdn_gating.py:132-194   -> fused_gdn_gating_without_sigmoid
  layernorm_gated.py:19-314     -> layernorm_gated (group norm + silu(z) gate)
  fused_sigmoid_gating_recurrent.py:18-242 -> fused_sigmoid_gating_delta_rule_update
  utils.py:247-477              -> fused_qkvzba_split_reshape_cat
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .chunk import l2norm


def _softplus(x, beta, threshold):
    return jnp.where(beta * x <= threshold,
                     (1.0 / beta) * jnp.log1p(jnp.exp(beta * x)), x)


def fused_gdn_gating(A_log, a, b, dt_bias, beta: float = 1.0,
                     threshold: float = 20.0):
    """Returns (g [B,H] f32, beta_out [B,H] f32)."""
    x = a.astype(jnp.float32) + dt_bias.astype(jnp.float32)[None, :]
    g = -jnp.exp(A_log.astype(jnp.float32))[None, :] * _softplus(x, beta, threshold)
    return g, jax.nn.sigmoid(b.astype(jnp.float32))


def fused_gdn_gating_without_sigmoid(A_log, a, b, dt_bias, beta: float = 1.0,
                                     threshold: float = 20.0):
    """Returns (g, b) — b passes through unchanged (ref :132-194)."""
    x = a.astype(jnp.float32) + dt_bias.astype(jnp.float32)[None, :]
    g = -jnp.exp(A_log.astype(jnp.float32))[None, :] * _softplus(x, beta, threshold)
    return g, b


def layernorm_gated(x, weight, bias=None, z=None, eps: float = 1e-6,
                    group_size: Optional[int] = None,
                    norm_before_gate: bool = True, is_rms_norm: bool = False):
    """Group-wise (layer|rms)norm with optional silu(z) gating.

    x, z [M, N]; weight/bias [N]; group_size divides N.
    norm_before_gate: out = norm(x) * silu(z); else: norm(x * silu(z)).
    """
    m, n = x.shape
    gs = group_size or n
    x32 = x.astype(jnp.float32)
    if z is not None and not norm_before_gate:
        x32 = x32 * jax.nn.silu(z.astype(jnp.float32))
    xg = x32.reshape(m, n // gs, gs)
    if not is_rms_norm:
        mu = jnp.mean(xg, -1, keepdims=True)
        xc = xg - mu
    else:
        xc = xg
    var = jnp.mean(xc * xc, -1, keepdims=True)
    out = (xc * jax.lax.rsqrt(var + eps)).reshape(m, n) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if z is not None and norm_before_gate:
        out = out * jax.nn.silu(z.astype(jnp.float32))
    return out.astype(x.dtype)


def fused_sigmoid_gating_delta_rule_update(
    A_log, a, dt_bias, softplus_beta, softplus_threshold,
    q, k, v, b, initial_state_source, initial_state_indices,
    scale=None, use_qk_l2norm_in_kernel: bool = False, cu_seqlens=None,
):
    """Fused gating + single-token recurrent delta update (decode path).

    q, k [B, 1, H, K]; v [B, 1, HV, V]; a, b [B, 1, HV];
    initial_state_source [pool, HV, K, V]; indices [B].
    Returns (o [B, 1, HV, V], updated state pool).
    """
    bsz = q.shape[0]
    h = q.shape[2]
    hv = v.shape[2]
    kd = q.shape[-1]
    vd = v.shape[-1]
    rep = hv // h

    g, beta = fused_gdn_gating(
        A_log, a.reshape(bsz, hv), b.reshape(bsz, hv), dt_bias,
        softplus_beta, softplus_threshold)

    qf = q.reshape(bsz, h, kd)
    kf = k.reshape(bsz, h, kd)
    if use_qk_l2norm_in_kernel:
        qf, kf = l2norm(qf), l2norm(kf)
    if scale is None:
        scale = kd ** -0.5
    qf = (qf.astype(jnp.float32) * scale)[:, jnp.arange(hv) // rep]
    kf = kf.astype(jnp.float32)[:, jnp.arange(hv) // rep]
    vf = v.reshape(bsz, hv, vd).astype(jnp.float32)

    idx = jnp.clip(initial_state_indices.astype(jnp.int32), 0,
                   initial_state_source.shape[0] - 1)
    s = initial_state_source[idx].astype(jnp.float32)    # [B, HV, K, V]

    s = s * jnp.exp(g)[..., None, None]
    kv = jnp.einsum("bhkv,bhk->bhv", s, kf)
    delta = (vf - kv) * beta[..., None]
    s = s + kf[..., :, None] * delta[..., None, :]
    o = jnp.einsum("bhkv,bhk->bhv", s, qf)

    valid = initial_state_indices >= 0
    tgt = jnp.where(valid, idx, initial_state_source.shape[0])
    new_pool = initial_state_source.at[tgt].set(
        s.astype(initial_state_source.dtype), mode="drop")
    return o.reshape(bsz, 1, hv, vd).astype(q.dtype), new_pool


def fused_qkvzba_split_reshape_cat(mixed_qkvz, mixed_ba, num_heads_qk,
                                   num_heads_v, head_qk, head_v):
    """Split Qwen-Next fused projections.

    mixed_qkvz [B, Hqk*(2*Dqk + 2*r*Dv)] laid out per qk-head as
    [q Dqk | k Dqk | v r*Dv | z r*Dv]; mixed_ba [B, Hqk*2r] per qk-head [b r | a r].
    Returns (mixed_qkv [B, Hqk*Dqk*2 + Hv*Dv], z [B, Hv, Dv], b [B, Hv], a [B, Hv]).
    """
    bsz = mixed_qkvz.shape[0]
    r = num_heads_v // num_heads_qk
    per = mixed_qkvz.reshape(bsz, num_heads_qk, 2 * head_qk + 2 * r * head_v)
    q = per[..., :head_qk]
    k = per[..., head_qk:2 * head_qk]
    v = per[..., 2 * head_qk:2 * head_qk + r * head_v]
    z = per[..., 2 * head_qk + r * head_v:]
    mixed_qkv = jnp.concatenate(
        [q.reshape(bsz, -1), k.reshape(bsz, -1), v.reshape(bsz, -1)], axis=-1)
    z = z.reshape(bsz, num_heads_v, head_v)
    ba = mixed_ba.reshape(bsz, num_heads_qk, 2 * r)
    b = ba[..., :r].reshape(bsz, num_heads_v)
    a = ba[..., r:].reshape(bsz, num_heads_v)
    return mixed_qkv, z, b, a
