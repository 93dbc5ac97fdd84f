"""Streaming (chunked) decode must equal full-utterance decode."""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.decoder.beam_search import (
    decode_to_lists, streaming_init, streaming_step)


def rand_logprobs(rng, T, B, V):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("algorithm", ["prefix", "reference"])
@pytest.mark.parametrize("chunks", [[5, 5, 5], [1, 7, 4, 3], [15]])
def test_streaming_equals_batch(algorithm, chunks):
    rng = np.random.default_rng(sum(chunks) * 7 + len(chunks))
    T, B, V, W = sum(chunks), 3, 5, 6
    lp = rand_logprobs(rng, T, B, V)

    full = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=32,
                           algorithm=algorithm)

    state = streaming_init(B, W, max_len=32)
    t = 0
    for i, c in enumerate(chunks):
        state, snap = streaming_step(
            state, jnp.asarray(lp[t:t + c]), algorithm=algorithm,
            is_final=(i == len(chunks) - 1))
        t += c

    np.testing.assert_array_equal(np.asarray(snap.lengths),
                                  np.asarray(full.lengths))
    np.testing.assert_allclose(np.asarray(snap.scores),
                               np.asarray(full.scores), rtol=1e-5)
    for b in range(B):
        for w in range(W):
            n = int(full.lengths[b, w])
            assert (np.asarray(snap.tokens)[b, w, :n].tolist()
                    == np.asarray(full.tokens)[b, w, :n].tolist())


def test_streaming_intermediate_snapshots_valid():
    """Every intermediate snapshot is a valid decode of the prefix seen."""
    rng = np.random.default_rng(0)
    T, B, V, W = 12, 2, 4, 4
    lp = rand_logprobs(rng, T, B, V)
    state = streaming_init(B, W, max_len=16)
    for t_end in (4, 8):
        state2, snap = streaming_step(state, jnp.asarray(lp[t_end - 4:t_end]))
        want = ctc_beam_search(jnp.asarray(lp[:t_end]), beam_width=W,
                               max_len=16)
        got = decode_to_lists(snap)
        exp = decode_to_lists(want)
        assert [g[0] for g in got] == [w[0] for w in exp]
        state = state2
