"""Pallas exact top-k vs lax.top_k (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from gasr_tpu.ops.pallas.topk import pallas_topk


@pytest.mark.parametrize("B,N,k", [(4, 512, 100), (2, 1280, 100),
                                   (2, 300, 16), (1, 128, 128),
                                   (5, 1000, 7)])
def test_pallas_topk_bit_equals_lax(B, N, k):
    rng = np.random.default_rng(B * 1000 + N + k)
    x = rng.standard_normal((B, N)).astype(np.float32) * 10
    v, i = pallas_topk(jnp.asarray(x), k, interpret=True)
    wv, wi = lax.top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))


def test_pallas_topk_ties_stable():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 640)).astype(np.float32)
    x[:, 50:60] = x[:, 40:50]            # duplicated blocks
    x[:, 100:140] = 2.5                  # massive tie at the boundary
    x[:, 200:240] = 2.5
    v, i = pallas_topk(jnp.asarray(x), 64, interpret=True)
    wv, wi = lax.top_k(jnp.asarray(x), 64)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))


def test_pallas_topk_negative_and_extreme():
    x = np.array([[-1e30, -5.0, 0.0, 3.0, -0.5, 7.25, -1e30, 2.0]],
                 np.float32)
    x = np.tile(x, (2, 16))              # [2, 128]
    v, i = pallas_topk(jnp.asarray(x), 10, interpret=True)
    wv, wi = lax.top_k(jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))


def test_pallas_topk_k_above_limit_falls_back():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 400),
                                                             ).astype(
        np.float32))
    v, i = pallas_topk(x, 200)           # k > 128 -> lax.top_k path
    wv, wi = lax.top_k(x, 200)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))
