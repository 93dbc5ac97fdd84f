"""Flash rel-pos MHSA kernel vs the XLA mhsa_rel path (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gasr_tpu.ops.attention import mhsa_rel, mhsa_rel_init


def _params(D, H, seed=0):
    p = mhsa_rel_init(jax.random.PRNGKey(seed), D, H)
    # nonzero content/position biases so the u/v paths are exercised
    p["u"] = jax.random.normal(jax.random.PRNGKey(seed + 5),
                               p["u"].shape) * 0.1
    p["v"] = jax.random.normal(jax.random.PRNGKey(seed + 6),
                               p["v"].shape) * 0.1
    return p


@pytest.mark.parametrize("T,B,D,H", [
    (16, 2, 32, 4),        # tiny, Tp == 128
    (37, 3, 72, 2),        # odd T, odd D/2 (sin/cos halves pad)
    pytest.param(300, 2, 64, 8, marks=pytest.mark.slow),  # conformer_l T'
])
def test_flash_mhsa_matches_xla(T, B, D, H):
    """The factorized-position kernel (angle-addition matmuls instead
    of the Transformer-XL gather/shift) must match the XLA rel-shift
    path within bf16 resolution — the math is the same sum
    reassociated."""
    p = _params(D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    ref = mhsa_rel(p, x, H, impl="xla", compute_dtype=jnp.bfloat16)
    got = mhsa_rel(p, x, H, impl="pallas", compute_dtype=jnp.bfloat16)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(ref - got).max()) < 0.02 * max(scale, 1.0)


def test_flash_mhsa_lengths_mask():
    """Prefix-length masking in the kernel == boolean-mask XLA path on
    every valid query row; and the XLA fallback honors `lengths` too."""
    T, B, D, H = 24, 3, 32, 4
    p = _params(D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    lens = jnp.array([24, 10, 17], jnp.int32)
    mask = jnp.arange(T)[None, :] < lens[:, None]
    ref = mhsa_rel(p, x, H, mask=mask, impl="xla",
                   compute_dtype=jnp.bfloat16)
    got = mhsa_rel(p, x, H, lengths=lens, impl="pallas",
                   compute_dtype=jnp.bfloat16)
    for b in range(B):
        L = int(lens[b])
        assert float(jnp.abs(ref[:L, b] - got[:L, b]).max()) < 0.02
    # XLA fallback with lengths == XLA with the equivalent mask
    a = mhsa_rel(p, x, H, mask=mask, impl="xla")
    b2 = mhsa_rel(p, x, H, lengths=lens, impl="xla")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_flash_auto_dispatch_rules():
    """auto never silently drops an f32 model to the bf16 kernel, and
    boolean masks fall back to XLA (kernel masks are prefix lengths)."""
    from gasr_tpu.ops.pallas.flash_mhsa import flash_eligible
    assert flash_eligible(300, 64, 512)
    assert not flash_eligible(2000, 64, 512)      # VMEM bound
    assert not flash_eligible(300, 200, 512)      # dh > 128
    assert not flash_eligible(300, 64, 511)       # odd D
    # on CPU, auto must take the XLA path (f32-exact); results with
    # impl='auto' and impl='xla' are identical
    T, B, D, H = 12, 2, 16, 2
    p = _params(D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    np.testing.assert_array_equal(
        np.asarray(mhsa_rel(p, x, H, impl="auto")),
        np.asarray(mhsa_rel(p, x, H, impl="xla")))
