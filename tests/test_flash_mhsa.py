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


def test_flash_ref_matches_kernel():
    """flash_ref (the XLA twin used as the custom_vjp recompute) must
    agree with the kernel forward — same factorized math, rounding
    differences only."""
    from gasr_tpu.ops.pallas.flash_mhsa import flash_mhsa_rel, flash_ref
    B, H, T, dh = 2, 4, 40, 16
    D = H * dh
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    q, k, v = (jax.random.normal(ks[i], (B, H, T, dh)) for i in range(3))
    wr = jax.random.normal(ks[3], (D, D)) * 0.2
    u = jax.random.normal(ks[4], (H, dh)) * 0.1
    vb = jax.random.normal(ks[5], (H, dh)) * 0.1
    lens = jnp.array([T, 23], jnp.int32)
    got = flash_mhsa_rel(q, k, v, wr, u, vb, lens, out_f32=True,
                         interpret=True)
    ref = flash_ref(q, k, v, wr, u, vb, lens, out_f32=True)
    for b in range(2):
        L = int(lens[b])
        d = float(jnp.abs(got[b, :, :L] - ref[b, :, :L]).max())
        assert d < 0.03, d


def test_flash_grad_is_ref_vjp():
    """jax.grad through the kernel must EQUAL jax.grad of flash_ref —
    the custom_vjp contract (backward = recompute VJP), exact up to
    jit scheduling."""
    from gasr_tpu.ops.pallas.flash_mhsa import flash_mhsa_rel, flash_ref
    B, H, T, dh = 2, 2, 24, 8
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    q, k, v = (jax.random.normal(ks[i], (B, H, T, dh)) for i in range(3))
    wr = jax.random.normal(ks[3], (D, D)) * 0.2
    u = jax.random.normal(ks[4], (H, dh)) * 0.1
    vb = jax.random.normal(ks[5], (H, dh)) * 0.1
    lens = jnp.array([T, 15], jnp.int32)
    cot = jax.random.normal(ks[6], (B, H, T, dh))

    def loss_kernel(q, k, v, wr, u, vb):
        o = flash_mhsa_rel(q, k, v, wr, u, vb, lens, out_f32=True,
                           interpret=True)
        return jnp.sum(o * cot)

    def loss_ref(q, k, v, wr, u, vb):
        return jnp.sum(flash_ref(q, k, v, wr, u, vb, lens,
                                 out_f32=True) * cot)

    # both sides jitted: XLA:CPU rewrites f32 dots whose operands are
    # bf16 converts, so eager vs jit grads differ at bf16 resolution —
    # the contract is jit(grad(kernel)) == jit(grad(flash_ref)) BIT-
    # EXACTLY (the realistic path: train steps are always jitted)
    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5)))(
        q, k, v, wr, u, vb)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5)))(
        q, k, v, wr, u, vb)
    for a, b in zip(gk, gr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_grad_chunked_bwd_equals_unchunked(monkeypatch):
    """The lax.map batch-chunked backward (compile-helper guard for
    conformer_l-scale score tiles) must match the single-shot VJP."""
    from gasr_tpu.ops.pallas import flash_mhsa as fm
    B, H, T, dh = 4, 2, 16, 8
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(9), 7)
    q, k, v = (jax.random.normal(ks[i], (B, H, T, dh)) for i in range(3))
    wr = jax.random.normal(ks[3], (D, D)) * 0.2
    u = jax.random.normal(ks[4], (H, dh)) * 0.1
    vb = jax.random.normal(ks[5], (H, dh)) * 0.1
    lens = jnp.array([T, 9, T, 5], jnp.int32)
    cot = jax.random.normal(ks[6], (B, H, T, dh))

    def loss(q, k, v, wr, u, vb):
        o = fm.flash_mhsa_rel(q, k, v, wr, u, vb, lens, out_f32=True,
                              interpret=True)
        return jnp.sum(o * cot)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))
    g_one = jax.jit(grad)(q, k, v, wr, u, vb)
    monkeypatch.setattr(fm, "_BWD_SCORE_BYTES", 1)   # force max chunking
    g_chk = jax.jit(grad)(q, k, v, wr, u, vb)
    for a, b in zip(g_one, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_flash_grad_matches_xla_path():
    """End-to-end: grads of the full mhsa_rel (projections + wo) via
    impl='pallas' vs impl='xla', both at bf16 compute — same math up to
    bf16 resolution."""
    T, B, D, H = 20, 2, 32, 4
    p = _params(D, H)
    x = jax.random.normal(jax.random.PRNGKey(11), (T, B, D))

    def loss(params, impl):
        return jnp.sum(mhsa_rel(params, x, H, impl=impl,
                                compute_dtype=jnp.bfloat16) ** 2)

    gp = jax.grad(lambda p_: loss(p_, "pallas"))(p)
    gx = jax.grad(lambda p_: loss(p_, "xla"))(p)
    flat_p, _ = jax.tree.flatten(gp)
    flat_x, _ = jax.tree.flatten(gx)
    for a, b in zip(flat_p, flat_x):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 0.05 * scale + 0.02


def test_conformer_trains_through_flash():
    """A bf16 conformer train step with attn_impl='pallas' (the path
    TPU auto-dispatch takes) runs under jax.grad and decreases loss —
    the r4 grad-crash regression test."""
    import optax
    from gasr_tpu.config import Config
    from gasr_tpu.models import model_init
    from gasr_tpu.train import make_train_step, synthetic_batch
    cfg = Config(model="conformer_s", batch_size=2, seg_len=32,
                 input_size=40, n_context=0, vocab_size=12,
                 linear_size=32, num_blocks=2)
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(3e-3)
    step = jax.jit(make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                                   attn_impl="pallas"))
    opt_state = opt.init(params)
    losses = []
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1), max_label_len=4)
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


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
