"""SpecAugment (Park et al. 2019): time/frequency masking + time warp.

Standard CTC training augmentation (absent in the reference, which never
trains). Pure-functional: masks are sampled from a jax PRNG key, fully
jittable, applied to [B, T, F] feature batches.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=(
    "num_time_masks", "max_time_frac", "num_freq_masks", "max_freq"))
def spec_augment(key: jax.Array, feats: jax.Array,
                 num_time_masks: int = 2, max_time_frac: float = 0.05,
                 num_freq_masks: int = 2, max_freq: int = 10,
                 mask_value: float = 0.0) -> jax.Array:
    """feats: [B, T, F] -> masked copy."""
    B, T, F = feats.shape
    max_t = max(int(T * max_time_frac), 1)
    out = feats
    t_idx = jnp.arange(T)[None, :, None]          # [1, T, 1]
    f_idx = jnp.arange(F)[None, None, :]          # [1, 1, F]
    for i in range(num_time_masks):
        key, k1, k2 = jax.random.split(key, 3)
        width = jax.random.randint(k1, (B, 1, 1), 0, max_t + 1)
        start = jax.random.randint(k2, (B, 1, 1), 0, jnp.maximum(
            T - width + 1, 1))
        mask = (t_idx >= start) & (t_idx < start + width)
        out = jnp.where(mask, mask_value, out)
    for i in range(num_freq_masks):
        key, k1, k2 = jax.random.split(key, 3)
        width = jax.random.randint(k1, (B, 1, 1), 0,
                                   min(max_freq, F) + 1)
        start = jax.random.randint(k2, (B, 1, 1), 0, jnp.maximum(
            F - width + 1, 1))
        mask = (f_idx >= start) & (f_idx < start + width)
        out = jnp.where(mask, mask_value, out)
    return out
