"""Fused parity-plane conformer stem (ops/pallas/stem.py) vs the XLA
conv2d path — correctness, gradients, and model-level dispatch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gasr_tpu.ops.pallas.stem import (fused_stem, stem_eligible,
                                      stem_ref)


def _weights(F, d, dout, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    return (jax.random.normal(ks[0], (3, 3, 1, d)) * 0.2,
            jax.random.normal(ks[1], (d,)) * 0.1,
            jax.random.normal(ks[2], (3, 3, d, d)) * 0.05,
            jax.random.normal(ks[3], (d,)) * 0.1,
            jax.random.normal(ks[4], (F // 4 * d, dout)) * 0.05,
            jax.random.normal(ks[5], (dout,)) * 0.1)


@pytest.mark.parametrize("B,T,F,d,dout", [
    (2, 16, 8, 128, 128),
    (1, 24, 16, 128, 256),          # T2 not a block multiple; F2=4
])
def test_fused_stem_matches_ref(B, T, F, d, dout):
    """Parity-plane kernel == conv2d+conv2d+sub_proj at bf16
    resolution (same math: every tap is the same MAC, reassociated)."""
    assert stem_eligible(T, F, d, dout)
    w = _weights(F, d, dout)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, F))
    got = fused_stem(x, *w, interpret=True, out_dtype=jnp.float32)
    ref = stem_ref(x, *w, out_dtype=jnp.float32)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) < 0.02 * max(scale, 1.0)


def test_fused_stem_grad_is_ref_vjp():
    """custom_vjp contract: jit(grad(fused)) == jit(grad(stem_ref))
    bit-exactly (the backward IS the ref recompute VJP)."""
    B, T, F, d, dout = 2, 16, 8, 128, 128
    w = _weights(F, d, dout)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, T, F))
    cot = jax.random.normal(jax.random.PRNGKey(2), (B, T // 4, dout))

    def lk(x, *w):
        return jnp.sum(fused_stem(x, *w, interpret=True,
                                  out_dtype=jnp.float32) * cot)

    def lr(x, *w):
        return jnp.sum(stem_ref(x, *w, out_dtype=jnp.float32) * cot)

    gk = jax.jit(jax.grad(lk, argnums=tuple(range(7))))(x, *w)
    gr = jax.jit(jax.grad(lr, argnums=tuple(range(7))))(x, *w)
    for a, b in zip(gk, gr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stem_eligibility():
    assert stem_eligible(1200, 80, 512, 512)      # conformer_l
    assert not stem_eligible(1202, 80, 512, 512)  # T % 4
    assert not stem_eligible(1200, 82, 512, 512)  # F % 4
    assert not stem_eligible(1200, 80, 144, 144)  # d % 128


def test_conformer_stem_dispatch():
    """stem_impl='pallas' at the model level matches the default XLA
    stem within bf16 resolution; 'auto' on CPU stays XLA-exact."""
    from gasr_tpu.config import Config
    from gasr_tpu.models import model_init
    from gasr_tpu.models.conformer import conformer_apply
    cfg = Config(model="conformer_s", batch_size=2, seg_len=16,
                 input_size=8, n_context=0, vocab_size=12,
                 linear_size=128, num_blocks=1)
    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (2, 16, cfg.feat_size))
    ref = conformer_apply(cfg, params, x, compute_dtype=jnp.bfloat16,
                          stem_impl="xla")
    got = conformer_apply(cfg, params, x, compute_dtype=jnp.bfloat16,
                          stem_impl="pallas")
    assert float(jnp.abs(ref - got).max()) < 0.05
    auto = conformer_apply(cfg, params, x, compute_dtype=jnp.bfloat16,
                           stem_impl="auto")
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))


def test_conformer_trains_through_stem_kernel():
    """bf16 conformer train step with stem_impl='pallas' (+ flash
    attention) runs under jax.grad and decreases loss."""
    import optax
    from gasr_tpu.config import Config
    from gasr_tpu.models import model_init
    from gasr_tpu.train import make_train_step, synthetic_batch
    cfg = Config(model="conformer_s", batch_size=2, seg_len=16,
                 input_size=8, n_context=0, vocab_size=12,
                 linear_size=128, num_blocks=1)
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(3e-3)
    step = jax.jit(make_train_step(cfg, opt,
                                   compute_dtype=jnp.bfloat16,
                                   attn_impl="pallas",
                                   stem_impl="pallas"))
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1), max_label_len=3)
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
