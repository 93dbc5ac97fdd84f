"""DeepSpeech2-style Conv+BiLSTM CTC model (BASELINE.json config 3).

Spectrogram [B, T, F] -> 2x conv2d over (time, freq) with time
subsampling 2x -> flatten (freq', ch) -> 5x BiLSTM -> projection ->
log_softmax. Output is [T', B, vocab+1] with T' = ceil(T/2); use
`ds2_output_length` to map input frame counts to output frame counts for
CTC loss/decoding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.ops.conv import conv2d, conv2d_init
from gasr_tpu.ops.linear import linear, linear_init
from gasr_tpu.ops.lstm import lstm_forward, lstm_init

_CONV1_KERNEL = (11, 41)
_CONV1_STRIDE = (2, 2)
_CONV2_KERNEL = (11, 21)
_CONV2_STRIDE = (1, 2)
_CHANNELS = 32


def ds2_output_length(input_length):
    """Frames out for frames in (SAME padding, stride-2 then stride-1)."""
    return -(-input_length // _CONV1_STRIDE[0])


def ds2_init(key: jax.Array, config: Config, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    F = config.feat_size
    f1 = -(-F // _CONV1_STRIDE[1])
    f2 = -(-f1 // _CONV2_STRIDE[1])
    lstm_in = f2 * _CHANNELS
    H = config.rnn_hidden_size
    n_dir = 2 if config.bidirectional else 1
    return {
        "conv1": conv2d_init(k1, 1, _CHANNELS, _CONV1_KERNEL, dtype),
        "conv2": conv2d_init(k2, _CHANNELS, _CHANNELS, _CONV2_KERNEL, dtype),
        "lstm": lstm_init(k3, lstm_in, H, config.rnn_num_layers,
                          config.bidirectional, dtype),
        "proj": linear_init(k4, H * n_dir, config.output_size, dtype),
    }


def ds2_apply(params: dict, x: jax.Array, rnn_impl: str = "scan",
              **_) -> jax.Array:
    """x: [B, T, F] -> log-probs [T', B, vocab+1]."""
    B, T, F = x.shape
    h = x[:, :, :, None]                               # NHWC: [B, T, F, 1]
    h = conv2d(params["conv1"], h, _CONV1_STRIDE)
    h = conv2d(params["conv2"], h, _CONV2_STRIDE)      # [B, T', F'', C]
    Bt, Tp, Fp, C = h.shape
    h = h.reshape(B, Tp, Fp * C)
    h = jnp.transpose(h, (1, 0, 2))                    # [T', B, F''*C]
    h = lstm_forward(params["lstm"], h, impl=rnn_impl)
    logits = linear(params["proj"], h, activation=None)
    return jax.nn.log_softmax(logits, axis=-1)
