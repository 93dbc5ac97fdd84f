"""Tensor-parallel decode == single-chip decode, on the 8-device mesh."""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.parallel import make_mesh
from gasr_tpu.parallel.decode_tp import ctc_beam_search_tp


def rand_logprobs(rng, T, B, V):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("n_tp,W,V,T,B", [
    (4, 8, 12, 15, 3),     # V divisible by shards
    (8, 6, 29, 10, 2),     # V=29 not divisible -> padded slice
    (2, 16, 7, 20, 2),
])
def test_tp_decode_equals_single_chip(n_tp, W, V, T, B):
    rng = np.random.default_rng(n_tp * 100 + V)
    lp = rand_logprobs(rng, T, B, V)
    mesh = make_mesh({"model": n_tp})

    want = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=32,
                           algorithm="prefix", merge_impl="matched")
    got = ctc_beam_search_tp(jnp.asarray(lp), beam_width=W, mesh=mesh,
                             max_len=32)

    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(want.lengths))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), rtol=1e-5,
                               atol=1e-5)
    for b in range(B):
        for w in range(W):
            n = int(want.lengths[b, w])
            assert (np.asarray(got.tokens)[b, w, :n].tolist()
                    == np.asarray(want.tokens)[b, w, :n].tolist()), (b, w)
