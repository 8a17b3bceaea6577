"""Sampling ops — temperature / top-k / top-p / min-p, TPU-friendly.

The reference repo ships only the speculative verification samplers
(python/sgl_kernel_npu/sgl_kernel_npu/sample/, verify_tree_greedy); generation
sampling lives in SGLang above it. This module is that SGLang-role layer for
the serving engine: batched, jit-compatible (static shapes, no data-dependent
control flow), fused into one pass over the logits.

Design notes:
  * top-k via jax.lax.top_k (XLA sorts on-chip); top-p on the SORTED
    distribution with an exclusive-cumsum mask, renormalized implicitly by
    categorical sampling over masked logits;
  * everything composes into `sample(logits, key, temperature, top_k, top_p,
    min_p)` — pass 0/1.0 to disable a stage (static python floats/ints
    specialize the jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def apply_temperature(logits, temperature):
    """logits [B, V] / temperature ([B] or scalar). 0 => argmax passthrough
    (handled in sample())."""
    t = jnp.asarray(temperature, jnp.float32)
    t = jnp.maximum(t, 1e-6)
    if t.ndim == 1:
        t = t[:, None]
    return logits.astype(jnp.float32) / t


def top_k_mask(logits, k: int):
    """Keep the k highest logits per row, others -> -inf. Static k."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= kth, logits, _NEG)


def top_p_mask(logits, p: float):
    """Nucleus: keep the smallest prefix of the sorted distribution with
    cumulative probability >= p (the top token always survives)."""
    if p >= 1.0:
        return logits
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, -1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1) - probs          # exclusive
    keep_sorted = cum < p
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], sort_idx].set(keep_sorted)
    return jnp.where(keep, logits, _NEG)


def min_p_mask(logits, min_p: float):
    """Drop tokens with prob < min_p * max_prob (llama.cpp-style min-p)."""
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    thresh = min_p * jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs >= thresh, logits, _NEG)


def sample(logits, key, temperature=1.0, top_k: int = 0, top_p: float = 1.0,
           min_p: float = 0.0):
    """Fused sampling: returns token ids [B]. temperature==0 -> greedy."""
    if isinstance(temperature, (int, float)) and temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = apply_temperature(logits, temperature)
    x = top_k_mask(x, top_k)
    x = top_p_mask(x, top_p)
    x = min_p_mask(x, min_p)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


def apply_penalties(logits, output_ids, output_len, presence_penalty=0.0,
                    frequency_penalty=0.0, repetition_penalty=1.0):
    """Standard sampling penalties over previously generated tokens.

    logits [B, V]; output_ids [B, T] (generated so far, padded);
    output_len [B] valid counts. OpenAI-style presence/frequency penalties and
    CTRL-style repetition penalty, batched and jit-compatible.
    """
    b, v = logits.shape
    t = output_ids.shape[1]
    valid = jnp.arange(t)[None, :] < output_len[:, None]
    onehot = jax.nn.one_hot(jnp.where(valid, output_ids, v), v + 1,
                            dtype=jnp.float32)[..., :v]      # [B, T, V]
    counts = jnp.sum(onehot, axis=1)                          # [B, V]
    seen = counts > 0

    x = logits.astype(jnp.float32)
    x = x - presence_penalty * seen.astype(jnp.float32)
    x = x - frequency_penalty * counts
    if repetition_penalty != 1.0:
        x = jnp.where(seen, jnp.where(x > 0, x / repetition_penalty,
                                      x * repetition_penalty), x)
    return x
