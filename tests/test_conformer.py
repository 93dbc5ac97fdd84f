"""Conformer: rel-shift correctness, model contract, trainability."""

import numpy as np
import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.ops.attention import _rel_shift, _sinusoid_pos, mhsa_rel


def test_rel_shift_matches_gather():
    rng = np.random.default_rng(0)
    B, H, T = 2, 3, 5
    x = rng.standard_normal((B, H, T, 2 * T - 1)).astype(np.float32)
    got = np.asarray(_rel_shift(jnp.asarray(x)))
    want = np.empty((B, H, T, T), np.float32)
    for i in range(T):
        for j in range(T):
            # column l of x encodes relative offset (T-1-l); we want i-j
            want[:, :, i, j] = x[:, :, i, (T - 1) - (i - j)]
    np.testing.assert_allclose(got, want)


def test_sinusoid_shape():
    p = _sinusoid_pos(7, 16)
    assert p.shape == (13, 16)
    assert np.isfinite(np.asarray(p)).all()


def test_mhsa_mask():
    """Masked frames must not influence outputs of valid frames."""
    from gasr_tpu.ops.attention import mhsa_rel_init
    key = jax.random.PRNGKey(0)
    T, B, D, H = 6, 2, 16, 4
    params = mhsa_rel_init(key, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    mask = jnp.ones((B, T), bool).at[:, 4:].set(False)
    out1 = mhsa_rel(params, x, H, mask)
    x2 = x.at[4:].set(99.0)                 # corrupt masked frames
    out2 = mhsa_rel(params, x2, H, mask)
    np.testing.assert_allclose(np.asarray(out1[:4]), np.asarray(out2[:4]),
                               atol=1e-5)


def conformer_cfg():
    return Config(model="conformer_s", batch_size=2, input_size=16,
                  n_context=0, linear_size=32, vocab_size=7, seg_len=16,
                  num_blocks=2)


def test_conformer_contract():
    cfg = conformer_cfg()
    # shrink block count via a quick monkeypatch-free path: full preset is
    # 16 blocks at d=32 — small enough to run on CPU
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16))
    out = model_apply(cfg, params, x)
    assert out.shape == (4, 2, 8)            # T/4, B, vocab+1
    s = np.exp(np.asarray(out)).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_conformer_trains():
    from gasr_tpu.train import make_optimizer, make_train_step
    cfg = conformer_cfg()
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer()
    step = make_train_step(cfg, opt)
    batch = {
        "inputs": jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16)),
        "labels": jnp.array([[1, 2], [3, 4]], jnp.int32),
        "input_lengths": jnp.full((2,), 4, jnp.int32),
        "label_lengths": jnp.full((2,), 1, jnp.int32),
    }
    p2, _, metrics = jax.jit(step)(params, opt.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
    assert max(jax.tree.leaves(d)) > 0
