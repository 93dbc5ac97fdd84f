"""End-to-end learning proof: the framework can actually learn to
transcribe. Train DeepSpeech with CTC on a small synthetic mapping
(each symbol has a characteristic feature signature) until greedy
decode reproduces the labels. This exercises model forward, CTC loss
gradients, the optimizer, and the decoder as one system."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.decoder import greedy_decode
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.train import make_optimizer, make_train_step


def make_task(rng, n_examples=32, n_symbols=4, label_len=4,
              frames_per_symbol=5, feat=8):
    """Deterministic symbol->feature-signature mapping + noise."""
    signatures = rng.standard_normal((n_symbols + 1, feat)).astype(
        np.float32) * 2.0
    # avoid adjacent repeats (CTC repeats need blank insertions — keep
    # the task cleanly learnable in a few hundred steps)
    labels = np.zeros((n_examples, label_len), np.int64)
    for i in range(n_examples):
        prev = 0
        for j in range(label_len):
            c = rng.integers(1, n_symbols + 1)
            while c == prev:
                c = rng.integers(1, n_symbols + 1)
            labels[i, j] = c
            prev = c
    T = label_len * frames_per_symbol
    feats = np.zeros((n_examples, T, feat), np.float32)
    for i in range(n_examples):
        for j, sym in enumerate(labels[i]):
            s = j * frames_per_symbol
            feats[i, s:s + frames_per_symbol] = signatures[sym]
    feats += rng.standard_normal(feats.shape).astype(np.float32) * 0.1
    return feats, labels.astype(np.int32), T


@pytest.mark.slow
def test_model_learns_synthetic_transcription():
    rng = np.random.default_rng(0)
    feats, labels, T = make_task(rng)
    B, label_len = labels.shape
    cfg = Config(batch_size=B, input_size=feats.shape[-1], n_context=0,
                 linear_size=32, rnn_hidden_size=32, vocab_size=4,
                 seg_len=T)
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(learning_rate=3e-3)
    step = jax.jit(make_train_step(cfg, opt))
    opt_state = opt.init(params)
    batch = {
        "inputs": jnp.asarray(feats),
        "labels": jnp.asarray(labels),
        "input_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), label_len, jnp.int32),
    }
    first = last = None
    for i in range(500):
        params, opt_state, m = step(params, opt_state, batch)
        if i == 0:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first * 0.2, (first, last)

    lp = model_apply(cfg, params, jnp.asarray(feats))
    tokens, lengths = greedy_decode(lp)
    exact = 0
    for b in range(B):
        if (np.asarray(tokens)[b, :lengths[b]].tolist()
                == labels[b].tolist()):
            exact += 1
    assert exact >= int(0.9 * B), f"only {exact}/{B} exact transcripts"
