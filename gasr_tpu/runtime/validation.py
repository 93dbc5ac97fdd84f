"""Runtime validation and fault detection.

The reference "handles" errors with printf + exit(0) on any shape or
CUDA error (cuMatrix.cpp:35-42,63-69). Here: typed exceptions with
actionable messages, plus device-side NaN/Inf detection for serving
pipelines (SURVEY.md §5 failure-detection requirement) and a fault
injector used by the bench harness's --fault-inject mode to prove the
detection path fires.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


class ShapeError(ValueError):
    """Input does not match the model/decoder contract."""


class NumericsError(FloatingPointError):
    """Non-finite values detected in a pipeline tensor."""


def check_features(x, feat_size: int) -> None:
    if x.ndim != 3:
        raise ShapeError(
            f"features must be [batch, frames, feat]; got shape {x.shape}")
    if x.shape[-1] != feat_size:
        raise ShapeError(
            f"feature width {x.shape[-1]} != configured feat_size "
            f"{feat_size} (input_size*(1+2*n_context))")


def check_log_probs(lp, vocab_plus_blank: Optional[int] = None) -> None:
    if lp.ndim != 3:
        raise ShapeError(
            f"log_probs must be [T, B, V]; got shape {lp.shape}")
    if vocab_plus_blank is not None and lp.shape[-1] != vocab_plus_blank:
        raise ShapeError(
            f"vocab dim {lp.shape[-1]} != vocab_size+1 ={vocab_plus_blank} "
            "(inconsistent vocabulary size in CTC decoder)")


def assert_finite(x, name: str = "tensor") -> None:
    """Host-synced non-finite check (use at pipeline boundaries, not in
    hot loops — jax.debug_nans covers jit interiors)."""
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise NumericsError(
                    f"non-finite values detected in {name}")


def inject_fault(x, kind: str = "nan", position: int = 0):
    """Corrupt a tensor for failure-detection drills."""
    flat = x.ravel()
    val = {"nan": jnp.nan, "inf": jnp.inf, "neg": -1e30}[kind]
    return flat.at[position].set(val).reshape(x.shape)
