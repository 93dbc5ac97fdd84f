"""BiLSTM-CTC acoustic model (BASELINE.json config 2: BiLSTM-2x256).

Log-mel features -> N-layer (bi)LSTM -> linear projection to vocab+blank
-> log_softmax. Same I/O contract as the DeepSpeech model:
x [B, T, feat] -> log-probs [T, B, vocab+1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.ops.linear import linear, linear_init
from gasr_tpu.ops.lstm import lstm_forward, lstm_init


def bilstm_init(key: jax.Array, config: Config, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    H = config.rnn_hidden_size
    n_dir = 2 if config.bidirectional else 1
    return {
        "lstm": lstm_init(k1, config.feat_size, H, config.rnn_num_layers,
                          config.bidirectional, dtype),
        "proj": linear_init(k2, H * n_dir, config.output_size, dtype),
    }


def bilstm_apply(params: dict, x: jax.Array, rnn_impl: str = "scan",
                 **_) -> jax.Array:
    x = jnp.transpose(x, (1, 0, 2))                  # [T, B, F]
    h = lstm_forward(params["lstm"], x, impl=rnn_impl)
    logits = linear(params["proj"], h, activation=None)
    return jax.nn.log_softmax(logits, axis=-1)
