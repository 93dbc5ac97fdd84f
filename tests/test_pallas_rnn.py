"""Pallas fused RNN recurrence vs the XLA scan (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gasr_tpu.ops.rnn import _scan_one_direction, rnn_cell_init
from gasr_tpu.ops.pallas.rnn_scan import rnn_scan_pallas, rnn_scan_pallas_raw


def make_cell(F, H, key=0):
    return rnn_cell_init(jax.random.PRNGKey(key), F, H)


def test_pallas_raw_matches_scan_f32():
    T, B, H = 6, 8, 128
    key = jax.random.PRNGKey(1)
    xw = jax.random.normal(key, (T, B, H))
    w_hh = jax.random.normal(jax.random.PRNGKey(2), (H, H)) * 0.2
    h0 = jnp.zeros((B, H))
    got = rnn_scan_pallas_raw(xw, w_hh, h0, interpret=True,
                              weight_dtype=jnp.float32)

    def step(h, xt):
        h = jnp.tanh(xt + h @ w_hh)
        return h, h
    _, want = jax.lax.scan(step, h0, xw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_cell_path_matches_scan_bf16_tolerance():
    T, B, F, H = 5, 8, 16, 128
    cell = make_cell(F, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, F))
    h0 = jnp.zeros((B, H))
    got = rnn_scan_pallas(cell, x, h0)           # bf16 weights
    want = _scan_one_direction(cell, x, h0, reverse=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.02)


def test_pallas_fallback_unsupported_shape():
    """H not a multiple of 128 silently uses the XLA scan."""
    T, B, F, H = 4, 3, 5, 7
    cell = make_cell(F, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (T, B, F))
    h0 = jnp.zeros((B, H))
    got = rnn_scan_pallas(cell, x, h0)
    want = _scan_one_direction(cell, x, h0, reverse=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_model_rnn_impl_pallas():
    """deepspeech_apply(rnn_impl='pallas') end-to-end on aligned dims."""
    from gasr_tpu.config import Config
    from gasr_tpu.models import model_apply, model_init
    cfg = Config(batch_size=8, input_size=10, n_context=1, linear_size=128,
                 rnn_hidden_size=128, vocab_size=6, seg_len=9)
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (8, 9, cfg.feat_size))
    ref = model_apply(cfg, params, x, rnn_impl="scan")
    got = model_apply(cfg, params, x, rnn_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)
