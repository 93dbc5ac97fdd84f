"""Validation/fault-detection, LSTM importer, LSTM pallas kernel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gasr_tpu.runtime.validation import (
    NumericsError, ShapeError, assert_finite, check_features,
    check_log_probs, inject_fault)


def test_shape_validation():
    with pytest.raises(ShapeError):
        check_features(jnp.zeros((2, 3)), 4)
    with pytest.raises(ShapeError):
        check_features(jnp.zeros((2, 5, 3)), 4)
    check_features(jnp.zeros((2, 5, 4)), 4)
    with pytest.raises(ShapeError):
        check_log_probs(jnp.zeros((5, 2, 7)), 8)
    check_log_probs(jnp.zeros((5, 2, 8)), 8)


def test_fault_injection_detected():
    x = jnp.zeros((3, 4))
    assert_finite(x)
    with pytest.raises(NumericsError):
        assert_finite(inject_fault(x, "nan"), "logits")
    with pytest.raises(NumericsError):
        assert_finite(inject_fault(x, "inf"))


def test_pipeline_rejects_bad_features():
    from gasr_tpu.config import Config
    from gasr_tpu.infer import Pipeline
    cfg = Config(batch_size=2, input_size=4, n_context=0, linear_size=8,
                 rnn_hidden_size=8, vocab_size=3, seg_len=5)
    pipe = Pipeline(cfg)
    with pytest.raises(ShapeError):
        pipe.transcribe(jnp.zeros((2, 5, 7)))


def test_import_torch_lstm_helper():
    torch = pytest.importorskip("torch")
    from gasr_tpu.runtime.checkpoint import import_torch_lstm
    from gasr_tpu.ops.lstm import lstm_forward
    torch.manual_seed(1)
    m = torch.nn.LSTM(4, 6, num_layers=2, bidirectional=True)
    x = torch.rand(5, 2, 4)
    with torch.no_grad():
        want, _ = m(x)
    params = import_torch_lstm(m.state_dict(), num_layers=2,
                               bidirectional=True)
    got = lstm_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-6)


def test_lstm_pallas_matches_scan():
    from gasr_tpu.ops.lstm import lstm_cell_init, lstm_forward
    key = jax.random.PRNGKey(0)
    T, B, F, H = 5, 8, 16, 128
    params = {"layers": [lstm_cell_init(key, F, H)]}
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    want = lstm_forward(params, x, impl="scan")
    got = lstm_forward(params, x, impl="pallas")      # interpret on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.02)


def test_rnn_pallas_bidirectional():
    from gasr_tpu.ops.rnn import rnn_forward, rnn_init
    key = jax.random.PRNGKey(0)
    T, B, F, H = 4, 8, 16, 128
    params = rnn_init(key, F, H, num_layers=1, bidirectional=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, F))
    want = rnn_forward(params, x, impl="scan")
    got = rnn_forward(params, x, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.02)
