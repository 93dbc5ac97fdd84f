"""Character-LM shallow fusion: loaders + end-to-end WER movement.

The lm_bias capability gets its INPUT FORMATS here (text corpus + ARPA),
and the eval scoring path (eval.evaluate_batch -> wer) executes on a
synthetic corpus — closing the two seams round 2 left: a producer for
the [V+1, V] table, and a machine-checked demonstration that shallow
fusion moves WER.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.data.dataset import DEFAULT_CHARS, text_to_ids
from gasr_tpu.decoder.lm import (bigram_bias_from_arpa,
                                 bigram_bias_from_text)
from gasr_tpu.eval import evaluate_batch

V = len(DEFAULT_CHARS) + 1          # 28 chars + blank


def _logits_for_text(text, corrupt=None, p_main=0.9):
    """[T, 1, V] log-probs spelling `text`: per char one strong frame +
    one blank frame. corrupt: {pos: (wrong_id, p_wrong, p_true)} makes
    the acoustics prefer a wrong char at that char position."""
    ids = text_to_ids(text)
    rows = []
    eps_fill = lambda p_used, n: (1.0 - p_used) / (V - n)
    for pos, i in enumerate(ids):
        row = np.full(V, eps_fill(p_main, 1), np.float64)
        row[i] = p_main
        if corrupt and pos in corrupt:
            wrong, p_w, p_t = corrupt[pos]
            row = np.full(V, eps_fill(p_w + p_t, 2), np.float64)
            row[wrong] = p_w
            row[i] = p_t
        blank = np.full(V, eps_fill(p_main, 1), np.float64)
        blank[0] = p_main
        rows += [row, blank]
    lp = np.log(np.stack(rows))[:, None, :].astype(np.float32)
    return jnp.asarray(lp)


CORPUS = ["the cat sat on a mat", "a cat ate the meal",
          "that cat is fat", "my cat and their cat nap"] * 3


def test_bigram_from_text_is_normalized():
    bias = bigram_bias_from_text(CORPUS, V)
    assert bias.shape == (V + 1, V)
    p = np.exp(bias[:, 1:])                 # char columns
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-5)
    assert (bias[:, 0] == 0).all()          # blank column untouched
    c = DEFAULT_CHARS.index("c") + 1
    a = DEFAULT_CHARS.index("a") + 1
    q = DEFAULT_CHARS.index("q") + 1
    assert bias[c + 1, a] > bias[c + 1, q] + 1.0   # seen >> unseen


def test_shallow_fusion_moves_wer():
    """Acoustically-ambiguous frames ('cat' vs 'cqt') decode wrong
    without the LM and right with it — corpus WER strictly improves."""
    q = DEFAULT_CHARS.index("q") + 1
    texts = ["the cat", "a fat cat"]
    # corrupt the 'a' of each 'cat' toward 'q' (c->q unseen in corpus)
    lps = [_logits_for_text(texts[0], corrupt={5: (q, 0.46, 0.44)}),
           _logits_for_text(texts[1], corrupt={7: (q, 0.46, 0.44)})]
    bias = jnp.asarray(bigram_bias_from_text(CORPUS, V, weight=0.3))
    wers = {}
    for name, lm in [("no_lm", None), ("lm", bias)]:
        tot = 0.0
        for lp, ref in zip(lps, texts):
            r = evaluate_batch(lp, [ref], beam_width=8, lm_bias=lm)
            tot += r["wer"]
        wers[name] = tot / len(texts)
    assert wers["no_lm"] > 0.0              # acoustics alone fail
    assert wers["lm"] == 0.0                # fusion recovers the truth
    assert wers["lm"] < wers["no_lm"]


def test_arpa_loader_bigram_and_backoff(tmp_path):
    arpa = r"""
\data\
ngram 1=4
ngram 2=2

\1-grams:
-0.5	<s>	-0.30103
-0.60206	a	-0.30103
-0.60206	b	-0.1
-1.0	c	0.0

\2-grams:
-0.30103	a b
-0.69897	<s> a

\end\
"""
    p = tmp_path / "tiny.arpa"
    p.write_text(arpa)
    bias = bigram_bias_from_arpa(str(p), V, weight=1.0)
    a = DEFAULT_CHARS.index("a") + 1
    b = DEFAULT_CHARS.index("b") + 1
    c = DEFAULT_CHARS.index("c") + 1
    ln10 = np.log(10.0)
    # explicit bigram: P(b|a) = 10^-0.30103
    np.testing.assert_allclose(bias[a + 1, b], -0.30103 * ln10, rtol=1e-5)
    # backoff: P(c|a) = bo(a) * P(c) = 10^(-0.30103 + -1.0)
    np.testing.assert_allclose(bias[a + 1, c], (-0.30103 - 1.0) * ln10,
                               rtol=1e-5)
    # start row: explicit <s> bigram for a, backoff for b
    np.testing.assert_allclose(bias[0, a], -0.69897 * ln10, rtol=1e-5)
    np.testing.assert_allclose(bias[0, b], (-0.30103 - 0.60206) * ln10,
                               rtol=1e-5)
    # blank column untouched
    assert (bias[:, 0] == 0).all()


def test_arpa_fusion_decodes(tmp_path):
    """An ARPA table rides the full decode path (bf16 quantization,
    kernel/matched dispatch) without shape or dtype complaints."""
    arpa_lines = ["\\data\\", "ngram 1=%d" % len(DEFAULT_CHARS), "",
                  "\\1-grams:"]
    for ch in DEFAULT_CHARS:
        tok = "<space>" if ch == " " else ch
        arpa_lines.append(f"-1.5\t{tok}\t-0.3")
    arpa_lines += ["", "\\end\\"]
    p = tmp_path / "uni.arpa"
    p.write_text("\n".join(arpa_lines))
    bias = jnp.asarray(bigram_bias_from_arpa(str(p), V, weight=0.2))
    lp = _logits_for_text("a cab")
    r = evaluate_batch(lp, ["a cab"], beam_width=8, lm_bias=bias)
    assert r["wer"] == 0.0
