"""Greedy (best-path) CTC decode, vectorized.

Not present in the reference repo (its only decoder is the beam search),
but required by BASELINE.json config 1 and standard for any CTC stack:
argmax per frame -> collapse repeats -> drop blanks. Entirely on device
with static shapes; compaction via scatter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("blank_id",))
def greedy_decode(log_probs: jax.Array, blank_id: int = 0
                  ) -> Tuple[jax.Array, jax.Array]:
    """log_probs: [T, B, V] -> (tokens [B, T] int32 -1-padded, lengths [B])."""
    T, B, V = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)   # [T, B]
    ids = ids.T                                              # [B, T]
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    keep = (ids != prev) & (ids != blank_id)                 # [B, T]
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1     # write index
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    pos = jnp.where(keep, pos, T)                            # T = discard

    def fill(vals, p):
        out = jnp.full((T + 1,), -1, jnp.int32)
        return out.at[p].set(vals, mode="drop")

    tokens = jax.vmap(fill)(ids, pos)[:, :T]
    return tokens, lengths
