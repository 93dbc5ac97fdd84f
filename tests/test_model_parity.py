"""DeepSpeech model parity vs a PyTorch twin (the numerics oracle).

The PyTorch model here re-states the baseline topology contract
(baseline/model.py:22-49): 3x(Linear+ReLU) -> nn.RNN(tanh) ->
Linear+ReLU -> Linear -> log_softmax, with the [B,T,F] -> time-major
flattening. Weights are exported via state_dict and imported through
gasr_tpu.runtime.checkpoint.import_torch_deepspeech; logits must allclose.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gasr_tpu.config import Config  # noqa: E402
from gasr_tpu.models import model_apply  # noqa: E402
from gasr_tpu.runtime.checkpoint import import_torch_deepspeech  # noqa: E402


def make_torch_deepspeech(cfg: Config, bidirectional=False):
    feat = cfg.feat_size
    H = cfg.rnn_hidden_size
    L = cfg.linear_size

    class TorchDS(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp123 = nn.Sequential(
                nn.Linear(feat, L), nn.ReLU(),
                nn.Linear(L, L), nn.ReLU(),
                nn.Linear(L, H), nn.ReLU(),
            )
            self.rnn = nn.RNN(H, H, num_layers=cfg.rnn_num_layers,
                              bidirectional=bidirectional)
            n_dir = 2 if bidirectional else 1
            self.mlp56 = nn.Sequential(
                nn.Linear(H * n_dir, L), nn.ReLU(),
                nn.Linear(L, cfg.output_size),
            )

        def forward(self, x):
            b, t = x.size(0), x.size(1)
            x = x.permute(1, 0, 2).reshape(t * b, -1)
            x = self.mlp123(x).reshape(t, b, -1)
            x, _ = self.rnn(x)
            x = self.mlp56(x.reshape(t * b, -1))
            return x.reshape(t, b, -1).log_softmax(2)

    return TorchDS()


@pytest.mark.parametrize("bidir,layers", [(False, 1), (True, 2)])
def test_deepspeech_logits_match_torch(bidir, layers):
    cfg = Config(batch_size=3, input_size=10, n_context=1, linear_size=24,
                 rnn_hidden_size=16, vocab_size=8, seg_len=12,
                 rnn_num_layers=layers, bidirectional=bidir)
    torch.manual_seed(0)
    tm = make_torch_deepspeech(cfg, bidirectional=bidir)
    x = torch.rand(cfg.batch_size, cfg.seg_len, cfg.feat_size)
    with torch.no_grad():
        want = tm(x).numpy()            # [T, B, V+1] log-probs

    params = import_torch_deepspeech(tm.state_dict(), num_layers=layers,
                                     bidirectional=bidir)
    got = model_apply(cfg, params, jnp.asarray(x.numpy()))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_compat_final_relu_mode():
    """Reference quirk mode: unnormalized ReLU-clamped outputs
    (Linear.cu:47, main.cpp:45)."""
    cfg = Config(batch_size=2, input_size=4, n_context=0, linear_size=8,
                 rnn_hidden_size=8, vocab_size=3, seg_len=5)
    import jax
    from gasr_tpu.models import model_init
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jnp.ones((2, 5, cfg.feat_size))
    out = model_apply(cfg, params, x, compat_final_relu=True)
    assert out.shape == (5, 2, 4)
    assert (np.asarray(out) >= 0).all()
