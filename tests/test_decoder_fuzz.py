"""Randomized property tests for the decoder (fuzz harness).

Machine-checked invariants over many random instances — the kind of
coverage the reference entirely lacks (SURVEY.md §4: golden prints only).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.decoder import ctc_beam_search, greedy_decode
from gasr_tpu.decoder.beam_search import (
    decode_to_lists, streaming_init, streaming_step)


def rand_logprobs(rng, T, B, V, peaky=False):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    if peaky:
        x = x * 4.0
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", [0] + [
    pytest.param(s, marks=pytest.mark.slow) for s in range(1, 5)])
def test_fuzz_streaming_random_chunking(seed):
    rng = np.random.default_rng(seed)
    T = int(rng.integers(6, 25))
    B = int(rng.integers(1, 4))
    V = int(rng.integers(3, 12))
    W = int(rng.integers(2, 10))
    lp = rand_logprobs(rng, T, B, V)
    full = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=40)

    # random chunk split
    cuts = sorted(rng.choice(np.arange(1, T), size=min(3, T - 1),
                             replace=False).tolist())
    bounds = [0] + cuts + [T]
    state = streaming_init(B, W, max_len=40)
    for i in range(len(bounds) - 1):
        state, snap = streaming_step(state,
                                     jnp.asarray(lp[bounds[i]:bounds[i + 1]]))
    for b in range(B):
        n = int(full.lengths[b, 0])
        assert (np.asarray(snap.tokens)[b, 0, :n].tolist()
                == np.asarray(full.tokens)[b, 0, :n].tolist()), seed


@pytest.mark.parametrize("seed", [0] + [
    pytest.param(s, marks=pytest.mark.slow) for s in range(1, 5)])
def test_fuzz_beam_score_bounds(seed):
    """Invariants: scores sorted desc; top beam score >= greedy
    alignment log-prob (prefix score sums over >= that one alignment);
    all scores <= 0 (log-probabilities)."""
    rng = np.random.default_rng(100 + seed)
    T, B, V, W = 15, 2, 6, 8
    lp = rand_logprobs(rng, T, B, V, peaky=bool(seed % 2))
    res = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=32)
    scores = np.asarray(res.scores)
    for b in range(B):
        live = scores[b] > -1e29
        s = scores[b][live]
        assert (np.diff(s) <= 1e-5).all()
        assert (s <= 1e-5).all()
        # greedy alignment bound
        ids = lp[:, b].argmax(-1)
        align_lp = lp[np.arange(T), b, ids].sum()
        # greedy alignment collapses to some prefix; that prefix's total
        # prob >= the alignment's prob; top beam >= that prefix's score
        # ONLY if the prefix survived the beam — with W=8 on V=6 it
        # essentially always does; tolerate rare prune by inequality on
        # the best beam vs alignment only when the collapsed prefix is
        # the top beam's prefix.
        from gasr_tpu.decoder.numpy_oracle import greedy_decode_np
        gprefix = greedy_decode_np(lp[:, b])
        top_prefix = np.asarray(res.tokens)[b, 0,
                                            :res.lengths[b, 0]].tolist()
        if gprefix == top_prefix:
            assert s[0] >= align_lp - 1e-4


def test_long_sequence_stability():
    """T=500 log-space decode stays finite and sane (the reference's
    prob-domain scoring underflows to 0 well before this — reproduced
    and documented via prob_domain=True)."""
    rng = np.random.default_rng(0)
    T, B, V, W = 500, 2, 6, 4
    lp = rand_logprobs(rng, T, B, V)
    res = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=600)
    s = np.asarray(res.scores)
    assert np.isfinite(s[s > -1e29]).all()
    assert (np.asarray(res.lengths) <= 600).all()

    # reference prob-domain underflow reproduction (capability parity
    # with CTCBeamSearch.cu:429's f32 multiplication)
    probs = np.exp(lp[:100])
    ref = ctc_beam_search(jnp.asarray(probs), beam_width=W, max_len=600,
                          algorithm="reference", prob_domain=True)
    assert float(np.asarray(ref.scores).max()) < 1e-20  # underflowed


@pytest.mark.parametrize("blank_id", [0, 2, 5])
def test_nonzero_blank_id(blank_id):
    """blank need not be id 0 (ctcdecode allows arbitrary blank_id)."""
    from gasr_tpu.decoder.numpy_oracle import prefix_beam_search_np
    rng = np.random.default_rng(blank_id)
    T, V, W = 12, 6, 5
    lp = rand_logprobs(rng, T, 1, V)
    res = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=16,
                          blank_id=blank_id)
    ids, score = decode_to_lists(res)[0]
    want_ids, want_score = prefix_beam_search_np(lp[:, 0], W, blank_id)
    assert ids == want_ids
    np.testing.assert_allclose(score, want_score, rtol=1e-4)
