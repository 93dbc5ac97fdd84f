"""CTC loss — log-space forward algorithm as one `lax.scan`.

Not present in the reference (inference-only: the transpose GEMMs for a
backward pass exist but are never called, cuMatrix.h:236-238 /
cuMatrix.cpp:73-145). A training-capable framework needs it; this is the
standard Graves CTC forward recursion over the blank-interleaved extended
label sequence, fully batched, differentiable by JAX autodiff.

Variable input lengths are handled with the padding trick: frames at
t >= input_length are replaced by a deterministic blank (log-prob 0),
which provably leaves the total CTC probability unchanged, so the scan
runs a static T steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e30


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m + jnp.log(
        jnp.exp(jnp.maximum(a - m_safe, -80.0)) * (a - m_safe > -80.0)
        + jnp.exp(jnp.maximum(b - m_safe, -80.0)) * (b - m_safe > -80.0)
        + jnp.exp(jnp.maximum(c - m_safe, -80.0)) * (c - m_safe > -80.0)
        + 1e-37)
    return jnp.maximum(out, NEG_INF)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def ctc_loss(log_probs: jax.Array, labels: jax.Array,
             input_lengths: jax.Array, label_lengths: jax.Array,
             blank_id: int = 0) -> jax.Array:
    """Per-example negative log-likelihood.

    log_probs: [T, B, V] time-major log-probabilities.
    labels: [B, S] int32 target ids (no blanks), padded arbitrarily.
    input_lengths: [B], label_lengths: [B].
    Returns loss [B] (not length-normalized, matching torch's
    reduction='none' on summed-per-example losses).
    """
    T, B, V = log_probs.shape
    S = labels.shape[1]
    L = 2 * S + 1

    # extended sequence z: blank, l1, blank, l2, ..., blank
    k = jnp.arange(L)
    is_lab = (k % 2 == 1)
    lab_idx = jnp.clip(k // 2, 0, S - 1)
    z = jnp.where(is_lab[None, :], labels[:, lab_idx], blank_id)  # [B, L]
    z = z.astype(jnp.int32)
    ext_len = 2 * label_lengths + 1                              # [B]

    # skip transition allowed into position k iff z[k] != blank and
    # z[k] != z[k-2]
    z_m2 = jnp.concatenate(
        [jnp.full((B, 2), -1, jnp.int32), z[:, :-2]], axis=1)
    can_skip = is_lab[None, :] & (z != z_m2)                      # [B, L]

    # frames beyond input_length -> deterministic blank
    t_idx = jnp.arange(T)[:, None]                                # [T, 1]
    pad = t_idx >= input_lengths[None, :]                         # [T, B]
    onehot_blank = jnp.where(jnp.arange(V) == blank_id, 0.0, NEG_INF)
    lp = jnp.where(pad[:, :, None],
                   onehot_blank[None, None, :], log_probs)        # [T, B, V]

    # emission log-probs along z, materialized for ALL frames before
    # the scan: [T, B, L]. The r5 train-step breakdown measured the
    # CTC scan at 16.5 ms of an 86 ms flagship step — each of the 200
    # sequential steps paid a [B, V]->[B, L] gather dispatch for ~10k
    # elements of real work. A hoisted [T, B, L] take_along_axis was
    # measured WORSE (25.8 ms: traced-index gathers are element-at-a-
    # time on TPU — same lesson as the r4 streaming overlay), so the
    # lookup is a one-hot matmul instead: e[t, b, l] = sum_v
    # lp[t, b, v] onehot[b, l, v] rides the MXU, and Precision.HIGHEST
    # (3-limb bf16 split, 24 mantissa bits) keeps f32 log-probs exact
    # to the last ulp of the 1-sparse contraction.
    onehot = (z[:, :, None]
              == jnp.arange(V, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)                               # [B, L, V]
    e_all = jnp.einsum("tbv,blv->tbl", lp, onehot,
                       precision=lax.Precision.HIGHEST)           # [T, B, L]

    valid_k = k[None, :] < ext_len[:, None]                       # [B, L]

    alpha0 = jnp.full((B, L), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(0.0)
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, 0.0, NEG_INF))
    alpha0 = jnp.where(valid_k, alpha0 + e_all[0], NEG_INF)

    def step(alpha, e):
        a1 = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate(
            [jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a2 = jnp.where(can_skip, a2, NEG_INF)
        new = _logsumexp3(alpha, a1, a2) + e
        new = jnp.where(valid_k, new, NEG_INF)
        return new, None

    alpha, _ = lax.scan(step, alpha0, e_all[1:], unroll=8)

    # answer: logsumexp of the last two valid positions
    last = jnp.take_along_axis(alpha, (ext_len - 1)[:, None], axis=1)[:, 0]
    last2_idx = jnp.clip(ext_len - 2, 0, L - 1)
    last2 = jnp.take_along_axis(alpha, last2_idx[:, None], axis=1)[:, 0]
    last2 = jnp.where(ext_len >= 2, last2, NEG_INF)
    total = _logsumexp3(last, last2, jnp.full_like(last, NEG_INF))
    return -total
