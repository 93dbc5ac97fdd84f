"""LSTM op parity vs torch; BiLSTM and DeepSpeech2 model contracts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gasr_tpu.config import Config  # noqa: E402
from gasr_tpu.models import model_apply, model_init  # noqa: E402
from gasr_tpu.ops.lstm import lstm_forward  # noqa: E402


def import_torch_lstm(sd, num_layers, bidirectional):
    def t(a):
        return jnp.asarray(np.ascontiguousarray(a.numpy().T))

    layers, layers_rev = [], []
    for l in range(num_layers):
        layers.append({
            "w_ih": t(sd[f"weight_ih_l{l}"]), "w_hh": t(sd[f"weight_hh_l{l}"]),
            "b_ih": jnp.asarray(sd[f"bias_ih_l{l}"].numpy()),
            "b_hh": jnp.asarray(sd[f"bias_hh_l{l}"].numpy()),
        })
        if bidirectional:
            layers_rev.append({
                "w_ih": t(sd[f"weight_ih_l{l}_reverse"]),
                "w_hh": t(sd[f"weight_hh_l{l}_reverse"]),
                "b_ih": jnp.asarray(sd[f"bias_ih_l{l}_reverse"].numpy()),
                "b_hh": jnp.asarray(sd[f"bias_hh_l{l}_reverse"].numpy()),
            })
    p = {"layers": layers}
    if bidirectional:
        p["layers_rev"] = layers_rev
    return p


@pytest.mark.parametrize("bidir,layers", [(False, 1), (True, 2)])
def test_lstm_matches_torch(bidir, layers):
    T, B, F, H = 7, 3, 5, 6
    torch.manual_seed(0)
    m = torch.nn.LSTM(F, H, num_layers=layers, bidirectional=bidir)
    x = torch.rand(T, B, F)
    with torch.no_grad():
        want, _ = m(x)
    params = import_torch_lstm(m.state_dict(), layers, bidir)
    got = lstm_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-6)


def test_bilstm_model_contract():
    cfg = Config(model="bilstm", batch_size=2, input_size=8, n_context=0,
                 rnn_hidden_size=16, rnn_num_layers=2, bidirectional=True,
                 vocab_size=5, seg_len=11)
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jnp.ones((2, 11, cfg.feat_size))
    out = model_apply(cfg, params, x)
    assert out.shape == (11, 2, 6)
    s = np.exp(np.asarray(out)).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_ds2_model_contract():
    from gasr_tpu.models.deepspeech2 import ds2_output_length
    cfg = Config(model="deepspeech2", batch_size=2, input_size=32,
                 n_context=0, rnn_hidden_size=16, rnn_num_layers=2,
                 bidirectional=True, vocab_size=5, seg_len=20)
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 20, 32))
    out = model_apply(cfg, params, x)
    Tp = ds2_output_length(20)
    assert out.shape == (Tp, 2, 6)
    s = np.exp(np.asarray(out)).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_ds2_trains():
    """One CTC training step over DS2 must produce finite loss+grads."""
    from gasr_tpu.train import make_optimizer, make_train_step
    from gasr_tpu.models.deepspeech2 import ds2_output_length
    cfg = Config(model="deepspeech2", batch_size=2, input_size=16,
                 n_context=0, rnn_hidden_size=8, rnn_num_layers=1,
                 bidirectional=True, vocab_size=5, seg_len=16)
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer()
    step = make_train_step(cfg, opt)
    Tp = int(ds2_output_length(16))
    batch = {
        "inputs": jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16)),
        "labels": jnp.array([[1, 2], [3, 4]], jnp.int32),
        "input_lengths": jnp.full((2,), Tp, jnp.int32),
        "label_lengths": jnp.full((2,), 2, jnp.int32),
    }
    _, _, metrics = jax.jit(step)(params, opt.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))
