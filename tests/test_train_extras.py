"""SpecAugment, remat, mixed precision, LM shallow fusion."""

import numpy as np
import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.data.augment import spec_augment
from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.decoder.beam_search import decode_to_lists
from gasr_tpu.models import model_init
from gasr_tpu.train import make_optimizer, make_train_step, synthetic_batch


def small_cfg():
    return Config(batch_size=2, input_size=6, n_context=0, linear_size=16,
                  rnn_hidden_size=16, vocab_size=5, seg_len=12)


def test_spec_augment_masks():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((3, 50, 20))
    y = spec_augment(key, x, num_time_masks=2, max_time_frac=0.2,
                     num_freq_masks=2, max_freq=8)
    assert y.shape == x.shape
    zeros = float((np.asarray(y) == 0).mean())
    assert 0.0 < zeros < 0.9            # masked something, not everything
    # different key -> different mask
    y2 = spec_augment(jax.random.PRNGKey(1), x, num_time_masks=2,
                      max_time_frac=0.2, num_freq_masks=2, max_freq=8)
    assert not np.array_equal(np.asarray(y), np.asarray(y2))


def test_remat_and_mixed_precision_step():
    cfg = small_cfg()
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer()
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1), max_label_len=4)

    base_step = jax.jit(make_train_step(cfg, opt))
    _, _, m0 = base_step(params, opt.init(params), batch)

    remat_step = jax.jit(make_train_step(cfg, opt, remat=True))
    _, _, m1 = remat_step(params, opt.init(params), batch)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)   # remat is numerics-neutral

    bf16_step = jax.jit(make_train_step(cfg, opt,
                                        compute_dtype=jnp.bfloat16))
    _, _, m2 = bf16_step(params, opt.init(params), batch)
    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m2["loss"]), float(m0["loss"]),
                               rtol=0.05)   # bf16 within tolerance


def test_augmented_step_runs():
    cfg = small_cfg()
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer()
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1), max_label_len=4)
    step = jax.jit(make_train_step(cfg, opt, augment=True))
    _, _, m = step(params, opt.init(params), batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["loss"]))


def rand_logprobs(rng, T, B, V):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_lm_bias_zero_is_identity():
    rng = np.random.default_rng(0)
    lp = rand_logprobs(rng, 12, 2, 5)
    base = ctc_beam_search(jnp.asarray(lp), beam_width=4, max_len=16)
    biased = ctc_beam_search(jnp.asarray(lp), beam_width=4, max_len=16,
                             lm_bias=jnp.zeros((6, 5)))
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(biased.tokens))
    np.testing.assert_allclose(np.asarray(base.scores),
                               np.asarray(biased.scores), rtol=1e-6)


def test_lm_bias_steers_transcripts():
    """A strong bigram bonus for '2 after 1' must promote that bigram."""
    rng = np.random.default_rng(1)
    lp = rand_logprobs(rng, 15, 1, 4)
    bias = jnp.zeros((5, 4)).at[2, 2].set(8.0)   # after char 1, boost 2
    base, _ = decode_to_lists(
        ctc_beam_search(jnp.asarray(lp), beam_width=4, max_len=16))[0]
    steered, _ = decode_to_lists(
        ctc_beam_search(jnp.asarray(lp), beam_width=4, max_len=16,
                        lm_bias=bias))[0]
    def count_12(ids):
        return sum(1 for a, b in zip(ids, ids[1:]) if a == 1 and b == 2)
    assert count_12(steered) >= count_12(base)
    assert 1 in steered and 2 in steered


def test_lm_bias_insertion_penalty_shortens():
    rng = np.random.default_rng(2)
    lp = rand_logprobs(rng, 20, 2, 5)
    penalty = jnp.full((6, 5), -5.0)             # flat per-append penalty
    base = ctc_beam_search(jnp.asarray(lp), beam_width=4, max_len=32)
    short = ctc_beam_search(jnp.asarray(lp), beam_width=4, max_len=32,
                            lm_bias=penalty)
    assert int(short.lengths[:, 0].sum()) <= int(base.lengths[:, 0].sum())
