"""Sanitizer-style CI modes (SURVEY.md §5 race-detection equivalent):
the functional design means races are designed out; these gates run the
numerics under jax_debug_nans and disable_jit and validate generic TP
specs for the non-DeepSpeech families."""

import numpy as np
import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.models import model_apply, model_init


def test_forward_and_loss_under_debug_nans():
    cfg = Config(batch_size=2, input_size=6, n_context=0, linear_size=16,
                 rnn_hidden_size=16, vocab_size=5, seg_len=10)
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 10, 6))
    with jax.debug_nans(True):
        out = model_apply(cfg, params, x)
        assert np.isfinite(np.asarray(out)).all()
        from gasr_tpu.ops.ctc_loss import ctc_loss
        loss = ctc_loss(out, jnp.array([[1, 2], [3, 4]], jnp.int32),
                        jnp.full((2,), 10, jnp.int32),
                        jnp.full((2,), 2, jnp.int32))
        assert np.isfinite(np.asarray(loss)).all()


def test_decoder_under_disable_jit():
    """The beam search must be correct in op-by-op (eager) mode too."""
    from gasr_tpu.decoder import ctc_beam_search
    from gasr_tpu.decoder.beam_search import decode_to_lists
    from gasr_tpu.decoder.numpy_oracle import prefix_beam_search_np
    rng = np.random.default_rng(0)
    lp = rng.standard_normal((8, 1, 4)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    with jax.disable_jit():
        res = ctc_beam_search(jnp.asarray(lp), beam_width=3, max_len=16)
    ids, score = decode_to_lists(res)[0]
    want_ids, want_score = prefix_beam_search_np(lp[:, 0], 3, 0)
    assert ids == want_ids
    np.testing.assert_allclose(score, want_score, rtol=1e-4)


def test_generic_tp_specs_shard_large_weights():
    from gasr_tpu.parallel import make_mesh, shard_tree
    from gasr_tpu.parallel.sharding import generic_param_specs
    from jax.sharding import PartitionSpec as P
    cfg = Config(model="bilstm", batch_size=2, input_size=8, n_context=0,
                 rnn_hidden_size=64, rnn_num_layers=1, bidirectional=True,
                 vocab_size=5, seg_len=6)
    params = model_init(cfg, jax.random.PRNGKey(0))
    specs = generic_param_specs(params, min_dim=64)
    # lstm w_ih has last dim 4H=256 -> sharded; proj bias replicated
    assert specs["lstm"]["layers"][0]["w_ih"] == P(None, "model")
    assert specs["proj"]["b"] == P()

    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_tree(params, specs, mesh)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 6, 8))
    want = model_apply(cfg, params, x)
    with mesh:
        got = jax.jit(lambda p, x: model_apply(cfg, p, x))(sp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
