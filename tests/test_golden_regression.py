"""Frozen decoder regression fixtures.

Guards decoder refactors (future Pallas kernels!) against silent
semantic drift: outputs must match the committed .npz fixtures bit-for-
bit on tokens/lengths/timesteps and tightly on scores. Regenerate ONLY
for intentional semantic changes via tests/make_golden.py.
"""

import glob
import os

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.decoder import ctc_beam_search, greedy_decode
from tests.make_golden import CASES

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["name"])
def test_golden(case):
    path = os.path.join(GOLDEN, case["name"] + ".npz")
    assert os.path.exists(path), "run tests/make_golden.py"
    with np.load(path) as g:
        kw = {}
        if "lens" in case:
            kw["input_lengths"] = jnp.asarray(case["lens"])
        res = ctc_beam_search(jnp.asarray(g["log_probs"]),
                              beam_width=case["W"], max_len=32,
                              algorithm=case["algorithm"], **kw)
        np.testing.assert_array_equal(np.asarray(res.tokens), g["tokens"])
        np.testing.assert_array_equal(np.asarray(res.lengths),
                                      g["lengths"])
        np.testing.assert_array_equal(np.asarray(res.timesteps),
                                      g["timesteps"])
        np.testing.assert_allclose(np.asarray(res.scores), g["scores"],
                                   rtol=1e-5, atol=1e-5)
        gt, gl = greedy_decode(jnp.asarray(g["log_probs"]))
        np.testing.assert_array_equal(np.asarray(gt), g["greedy_tokens"])
        np.testing.assert_array_equal(np.asarray(gl), g["greedy_lengths"])
