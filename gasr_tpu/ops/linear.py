"""Linear op: y = act(x @ W + b).

Capability twin of the reference's Linear (Linear.h:3, Linear.cu:42-49):
one GEMM + fused broadcast-bias + optional ReLU. Where the reference hand-
launches a 256-thread elementwise kernel after cuBLAS (Linear.cu:3-10,45-47),
we emit one jnp expression and let XLA fuse bias+ReLU into the matmul
epilogue on the MXU. Weight layout matches the reference convention
W:[in, out], b:[out] (Linear.h:21-22 — the transpose of torch.nn.Linear).

The reference applies ReLU unconditionally, even on the final vocab
projection (Linear.cu:47, main.cpp:45); the PyTorch baseline does not
(baseline/model.py:31-35). `activation` is explicit so models can follow
the baseline (the numerics contract) while a compat flag can reproduce the
reference quirk.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> dict:
    """U(-1/sqrt(in), 1/sqrt(in)) init (torch.nn.Linear default; the
    reference uses U(-1,1), Linear.cu:12-21, which explodes at depth —
    we keep torch's scaling and load exact weights for parity tests)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear(params: dict, x: jax.Array, activation: Optional[str] = "relu",
           compute_dtype=None) -> jax.Array:
    """x: [..., in] -> [..., out]. activation in {None, 'relu', 'tanh'}."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    if activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif activation == "tanh":
        y = jnp.tanh(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return y
