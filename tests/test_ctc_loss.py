"""CTC loss vs torch.nn.functional.ctc_loss (the independent oracle)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gasr_tpu.ops.ctc_loss import ctc_loss  # noqa: E402


def rand_case(rng, T, B, V, S):
    logits = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    labels = rng.integers(1, V, (B, S)).astype(np.int32)
    input_lengths = rng.integers(max(2 * S + 1, T // 2), T + 1, B)
    label_lengths = rng.integers(1, S + 1, B)
    return lp, labels, input_lengths.astype(np.int32), label_lengths.astype(np.int32)


@pytest.mark.parametrize("T,B,V,S", [(20, 4, 6, 5), (30, 3, 10, 8),
                                     (15, 2, 29, 4)])
def test_ctc_loss_matches_torch(T, B, V, S):
    rng = np.random.default_rng(T * 1000 + S)
    lp, labels, in_len, lab_len = rand_case(rng, T, B, V, S)
    got = ctc_loss(jnp.asarray(lp), jnp.asarray(labels),
                   jnp.asarray(in_len), jnp.asarray(lab_len), blank_id=0)
    want = torch.nn.functional.ctc_loss(
        torch.tensor(lp), torch.tensor(labels.astype(np.int64)),
        torch.tensor(in_len.astype(np.int64)),
        torch.tensor(lab_len.astype(np.int64)),
        blank=0, reduction="none", zero_infinity=False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=1e-4)


def test_ctc_loss_repeated_labels():
    """Repeats require the blank-mandatory transition (skip disallowed)."""
    rng = np.random.default_rng(0)
    T, B, V = 20, 2, 5
    lp = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    labels = np.array([[1, 1, 2, 2], [3, 3, 3, 3]], dtype=np.int32)
    in_len = np.array([20, 20], dtype=np.int32)
    lab_len = np.array([4, 4], dtype=np.int32)
    got = ctc_loss(jnp.asarray(lp), jnp.asarray(labels),
                   jnp.asarray(in_len), jnp.asarray(lab_len))
    want = torch.nn.functional.ctc_loss(
        torch.tensor(lp), torch.tensor(labels.astype(np.int64)),
        torch.tensor(in_len.astype(np.int64)),
        torch.tensor(lab_len.astype(np.int64)),
        blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4)


def test_ctc_loss_gradient_matches_torch():
    rng = np.random.default_rng(1)
    T, B, V, S = 12, 2, 5, 3
    lp_raw = rng.standard_normal((T, B, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, S)).astype(np.int32)
    in_len = np.full(B, T, np.int32)
    lab_len = np.full(B, S, np.int32)

    def loss_jax(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(lp, jnp.asarray(labels), jnp.asarray(in_len),
                        jnp.asarray(lab_len)).sum()

    g_jax = jax.grad(loss_jax)(jnp.asarray(lp_raw))

    t = torch.tensor(lp_raw, requires_grad=True)
    loss_t = torch.nn.functional.ctc_loss(
        t.log_softmax(-1), torch.tensor(labels.astype(np.int64)),
        torch.tensor(in_len.astype(np.int64)),
        torch.tensor(lab_len.astype(np.int64)),
        blank=0, reduction="sum")
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(g_jax), t.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_ctc_loss_matches_optax():
    import optax
    rng = np.random.default_rng(5)
    T, B, V, S = 16, 3, 8, 4
    lp, labels, in_len, lab_len = rand_case(rng, T, B, V, S)
    got = ctc_loss(jnp.asarray(lp), jnp.asarray(labels),
                   jnp.asarray(in_len), jnp.asarray(lab_len))
    # optax wants [B, T, V] logits and padding masks
    logit_pad = (np.arange(T)[None, :] >= in_len[:, None]).astype(np.float32)
    label_pad = (np.arange(S)[None, :] >= lab_len[:, None]).astype(np.float32)
    want = optax.ctc_loss(jnp.asarray(lp.transpose(1, 0, 2)),
                          jnp.asarray(logit_pad), jnp.asarray(labels),
                          jnp.asarray(label_pad), blank_id=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=1e-4)
