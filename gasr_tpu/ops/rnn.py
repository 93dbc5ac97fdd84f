"""Elman RNN: multi-layer tanh recurrence over time.

Capability twin of the reference's RNN_Cell + RNN (RNN_Cell.cu:65-74,
RNN.cu:9-30): h_t = tanh(x_t @ W_ih + h_{t-1} @ W_hh + b_ih + b_hh),
stacked layers, zero initial state, returning the full top-layer hidden
history for the CTC decoder (RNN.cu:29).

TPU-native design (NOT the reference's host double loop with 3 cuBLAS
calls + 1 kernel per (t, layer)):
  - The input projection x @ W_ih for ALL timesteps is one big
    [T*B, in] x [in, H] GEMM outside the recurrence — maximal MXU tiling.
  - The recurrence is a single `lax.scan` over time: per step one
    [B, H] x [H, H] GEMM + fused bias+tanh. One compiled dispatch total.
  - Optionally the scan body is replaced by a Pallas kernel that keeps
    W_hh and h resident in VMEM across steps (ops/pallas/rnn_scan.py).

Weight convention matches the reference (RNN_Cell.h:21-24): W_ih [in, H],
W_hh [H, H], biases [H] — i.e. the transpose of torch.nn.RNN's
weight_ih_l0/weight_hh_l0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def rnn_cell_init(key: jax.Array, input_size: int, hidden_size: int,
                  dtype=jnp.float32) -> dict:
    """torch.nn.RNN default init: U(-1/sqrt(H), 1/sqrt(H)) on all tensors."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / (hidden_size ** 0.5)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (input_size, hidden_size)),
        "w_hh": u(ks[1], (hidden_size, hidden_size)),
        "b_ih": u(ks[2], (hidden_size,)),
        "b_hh": u(ks[3], (hidden_size,)),
    }


def rnn_cell(params: dict, x_t: jax.Array, h_prev: jax.Array) -> jax.Array:
    """One Elman step. x_t: [B, in], h_prev: [B, H] -> [B, H].

    Semantics of RNN_Cell.cu:65-74 (2 GEMMs + matrixAdd + fused
    bias+bias+tanh kernel) in one fused XLA expression.
    """
    pre = (jnp.dot(x_t, params["w_ih"], preferred_element_type=jnp.float32)
           + jnp.dot(h_prev, params["w_hh"], preferred_element_type=jnp.float32)
           + params["b_ih"] + params["b_hh"])
    return jnp.tanh(pre)


def rnn_init(key: jax.Array, input_size: int, hidden_size: int,
             num_layers: int = 1, bidirectional: bool = False,
             dtype=jnp.float32) -> dict:
    """Params pytree: {'layers': [cell, ...], 'layers_rev': [...] if bidir}.

    Layer l>0 input size is H (2H when bidirectional, matching torch).
    """
    n_dir = 2 if bidirectional else 1
    keys = jax.random.split(key, num_layers * n_dir)
    layers, layers_rev = [], []
    for l in range(num_layers):
        in_l = input_size if l == 0 else hidden_size * n_dir
        layers.append(rnn_cell_init(keys[l], in_l, hidden_size, dtype))
        if bidirectional:
            layers_rev.append(
                rnn_cell_init(keys[num_layers + l], in_l, hidden_size, dtype))
    params = {"layers": layers}
    if bidirectional:
        params["layers_rev"] = layers_rev
    return params


def _scan_bidir_fused(cell_f: dict, cell_b: dict, x: jax.Array,
                      h0: jax.Array) -> jax.Array:
    """Both directions in one scan (direction-batched recurrence matmul;
    see ops/lstm.py._scan_bidir_fused). x: [T, B, in] -> [T, B, 2H]."""
    xw_f = (jnp.dot(x, cell_f["w_ih"], preferred_element_type=jnp.float32)
            + cell_f["b_ih"] + cell_f["b_hh"])
    xw_b = (jnp.dot(x, cell_b["w_ih"], preferred_element_type=jnp.float32)
            + cell_b["b_ih"] + cell_b["b_hh"])[::-1]
    xw = jnp.stack([xw_f, xw_b], axis=1)           # [T, 2, B, H]
    w_hh = jnp.stack([cell_f["w_hh"], cell_b["w_hh"]])

    def step(h, xw_t):
        h = jnp.tanh(xw_t + jnp.einsum(
            "dbh,dhk->dbk", h, w_hh, preferred_element_type=jnp.float32))
        return h, h

    _, hs = lax.scan(step, jnp.stack([h0, h0]), xw)
    return jnp.concatenate([hs[:, 0], hs[::-1, 1]], axis=-1)


def _scan_one_direction(cell: dict, x: jax.Array, h0: jax.Array,
                        reverse: bool, return_final: bool = False):
    """Scan one layer/direction. x: [T, B, in] -> [T, B, H].

    The input projection is hoisted out of the scan as one large GEMM;
    the scan body carries only the [B,H] x [H,H] recurrence.
    """
    xw = (jnp.dot(x, cell["w_ih"], preferred_element_type=jnp.float32)
          + cell["b_ih"] + cell["b_hh"])         # [T, B, H]
    w_hh = cell["w_hh"]

    def step(h, xw_t):
        h = jnp.tanh(xw_t + jnp.dot(h, w_hh, preferred_element_type=jnp.float32))
        return h, h

    h_final, hs = lax.scan(step, h0, xw, reverse=reverse)
    if return_final:
        return hs, h_final
    return hs


def rnn_forward(params: dict, x: jax.Array, h0: Optional[jax.Array] = None,
                impl: str = "scan") -> jax.Array:
    """Full multi-layer (optionally bidirectional) RNN.

    x: [T, B, input_size] time-major (the reference's layout, RNN.cu:15-21,
    with the T*B flattening undone). Returns the complete top-layer hidden
    history [T, B, H*n_dir] — the decoder consumes every frame (RNN.cu:29).
    h0 defaults to zeros (RNN.h:16-17).

    impl: 'scan' (XLA) or 'pallas' (fused VMEM-resident kernel, used for
    the forward direction of unidirectional layers when shapes allow).
    """
    layers = params["layers"]
    layers_rev = params.get("layers_rev")
    T, B = x.shape[0], x.shape[1]
    H = layers[0]["w_hh"].shape[0]

    if impl == "pallas":
        from gasr_tpu.ops.pallas.rnn_scan import rnn_scan_pallas
    out = x
    for l, cell in enumerate(layers):
        h_init = (jnp.zeros((B, H), x.dtype) if h0 is None else h0)
        if layers_rev is not None:
            if impl == "pallas":
                fwd = rnn_scan_pallas(cell, out, h_init)
                bwd = rnn_scan_pallas(layers_rev[l], out, h_init,
                                      reverse=True)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = _scan_bidir_fused(cell, layers_rev[l], out, h_init)
        elif impl == "pallas":
            out = rnn_scan_pallas(cell, out, h_init)
        else:
            out = _scan_one_direction(cell, out, h_init, reverse=False)
    return out


def rnn_forward_streaming(params: dict, x: jax.Array,
                          h_stack: Optional[jax.Array] = None):
    """Unidirectional forward carrying hidden state across chunks.

    x: [Tc, B, in]; h_stack: [num_layers, B, H] (None -> zeros).
    Returns (out [Tc, B, H], new h_stack) — chunked calls are exactly
    equivalent to one full-sequence rnn_forward.
    """
    layers = params["layers"]
    if "layers_rev" in params:
        raise ValueError("bidirectional RNNs cannot stream")
    B = x.shape[1]
    H = layers[0]["w_hh"].shape[0]
    if h_stack is None:
        h_stack = jnp.zeros((len(layers), B, H), x.dtype)
    out = x
    finals = []
    for l, cell in enumerate(layers):
        out, h_fin = _scan_one_direction(cell, out, h_stack[l],
                                         reverse=False, return_final=True)
        finals.append(h_fin)
    return out, jnp.stack(finals)
