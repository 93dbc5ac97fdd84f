"""DeepSpeech-1 CTC acoustic model (the reference's flagship topology).

Topology (baseline/model.py:22-35, assembled inline in main.cpp:31-45):
  3 x (Linear + ReLU)  ->  RNN (tanh, unidirectional)  ->  Linear + ReLU
  ->  Linear (no act)  ->  log_softmax over vocab+blank.

Numerics follow the PyTorch baseline (log_softmax, no final ReLU —
baseline/model.py:31-49), which is the parity contract. The CUDA path's
unconditional final ReLU + unnormalized probs (Linear.cu:47, main.cpp:45)
is reproducible via `compat_final_relu=True` for reference-twin testing.

I/O: x [B, T, feat] (baseline layout) -> log-probs [T, B, vocab+1]
time-major, ready for the decoder and CTC loss. Internally everything is
time-major from the start (the permute at baseline/model.py:41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.ops.linear import linear, linear_init
from gasr_tpu.ops.rnn import rnn_forward, rnn_init


def deepspeech_init(key: jax.Array, config: Config, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    feat = config.feat_size
    L = config.linear_size
    H = config.rnn_hidden_size
    n_dir = 2 if config.bidirectional else 1
    return {
        "mlp1": linear_init(ks[0], feat, L, dtype),
        "mlp2": linear_init(ks[1], L, L, dtype),
        "mlp3": linear_init(ks[2], L, H, dtype),
        "rnn": rnn_init(ks[3], H, H, config.rnn_num_layers,
                        config.bidirectional, dtype),
        "mlp5": linear_init(ks[4], H * n_dir, L, dtype),
        "mlp6": linear_init(ks[5], L, config.output_size, dtype),
    }


def deepspeech_apply(params: dict, x: jax.Array, *,
                     compat_final_relu: bool = False,
                     rnn_impl: str = "scan",
                     compute_dtype=None) -> jax.Array:
    """x: [B, T, feat] -> log-probs [T, B, vocab+1]."""
    x = jnp.transpose(x, (1, 0, 2))          # time-major [T, B, F]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    h = linear(params["mlp1"], x, "relu", compute_dtype)
    h = linear(params["mlp2"], h, "relu", compute_dtype)
    h = linear(params["mlp3"], h, "relu", compute_dtype)
    h = rnn_forward(params["rnn"], h, impl=rnn_impl)
    h = linear(params["mlp5"], h, "relu", compute_dtype)
    logits = linear(params["mlp6"], h, None, compute_dtype)
    if compat_final_relu:
        # Reference quirk: final projection is also ReLU-clamped and fed to
        # the decoder as raw "probabilities" (main.cpp:45,64-72).
        return jnp.maximum(logits, 0.0)
    return jax.nn.log_softmax(logits, axis=-1)


def deepspeech_apply_streaming(params: dict, x: jax.Array, rnn_state=None):
    """Chunked forward with carried RNN state.

    x: [B, Tc, feat] -> (log-probs [Tc, B, vocab+1], new rnn_state).
    The MLP stacks are frame-local and the RNN is unidirectional, so
    chunked application with state carry is EXACTLY equivalent to the
    full-utterance forward — the property that makes DeepSpeech a
    streaming-friendly topology.
    """
    from gasr_tpu.ops.rnn import rnn_forward_streaming
    x = jnp.transpose(x, (1, 0, 2))
    h = linear(params["mlp1"], x, "relu")
    h = linear(params["mlp2"], h, "relu")
    h = linear(params["mlp3"], h, "relu")
    h, rnn_state = rnn_forward_streaming(params["rnn"], h, rnn_state)
    h = linear(params["mlp5"], h, "relu")
    logits = linear(params["mlp6"], h, None)
    return jax.nn.log_softmax(logits, axis=-1), rnn_state
