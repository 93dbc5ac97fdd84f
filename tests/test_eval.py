"""eval.py scoring-path coverage: evaluate_batch / wer / parity_check
execute on synthetic corpora (no external corpus in this environment;
evaluate_librispeech stays the real-corpus hook, its reader is covered
by tests/test_data.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.data.dataset import DEFAULT_CHARS, wer
from gasr_tpu.eval import evaluate_batch, parity_check

from test_lm import V, _logits_for_text


def test_evaluate_batch_scores_synthetic_corpus():
    texts = ["the cat", "a fat rat", "nap time"]
    lps = [_logits_for_text(t) for t in texts]
    T = max(l.shape[0] for l in lps)
    # pad shorter utterances with deterministic-blank frames (transcript
    # invariant, same identity input_lengths padding uses)
    blank_row = np.full((V,), np.log(1e-8), np.float32)
    blank_row[0] = 0.0
    lp = jnp.concatenate(
        [jnp.concatenate(
            [l, jnp.broadcast_to(jnp.asarray(blank_row),
                                 (T - l.shape[0], 1, V))], axis=0)
         for l in lps], axis=1)
    r = evaluate_batch(lp, texts, beam_width=8)
    assert r["n"] == 3
    assert r["wer"] == 0.0
    assert r["hyps"] == texts


def test_wer_counts_word_edits():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert wer("the cat", "the") == pytest.approx(1 / 2)
    assert wer("", "anything") >= 1.0


def test_parity_check_jax_vs_native():
    pytest.importorskip("gasr_tpu.native")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((30, 6, 29)).astype(np.float32)
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    out = parity_check(lp, beam_width=8)
    assert out["match_rate"] == 1.0, out["mismatches"]
