"""Machine-checked versions of the reference's golden-value driver.

The reference prints these values for manual eyeballing (nn_test.cpp:29-30,
nn_test.cpp:70-77, weights/inputs at nn_test.cpp:10-17 and :41-60, derived
from PyTorch). Here they are asserted.
"""

import numpy as np
import jax.numpy as jnp

from gasr_tpu.ops import linear, rnn_forward

# --- Linear fixture (nn_test.cpp:10-30) ---
LIN_INP = np.array([0.0932, 0.3362, 0.1910, 0.6148, 0.5331, 0.1238],
                   dtype=np.float32).reshape(2, 3)
LIN_W = np.array([0.5699999928474426, 0.03020000085234642,
                  -0.22759999334812164, 0.1242000013589859,
                  0.34470000863075256, 0.49300000071525574,
                  0.37700000405311584, 0.04749999940395355,
                  0.3377000093460083, -0.4636000096797943,
                  -0.5188999772071838, 0.09910000115633011],
                 dtype=np.float32).reshape(3, 4)
LIN_B = np.array([0.37158000469207764, -0.4036799967288971,
                  0.21911999583244324, 0.0001550900051370263],
                 dtype=np.float32)
LIN_EXPECTED = np.array([[0.6051, 0.0000, 0.2255, 0.0466],
                         [0.9476, 0.0000, 0.2159, 0.1141]], dtype=np.float32)

# --- RNN fixture (nn_test.cpp:37-77): T=4, B=2, in=3, H=5 ---
RNN_INP = np.array([
    0.1321, 0.0296, 0.2351, 0.9742, 0.7064, 0.3638,
    0.8129, 0.8474, 0.7844, 0.9279, 0.9768, 0.7575,
    0.5693, 0.9383, 0.6537, 0.1245, 0.9113, 0.5213,
    0.2325, 0.2616, 0.2558, 0.0063, 0.3980, 0.8896,
], dtype=np.float32).reshape(4, 2, 3)
RNN_W_IH = np.array([
    0.0269, -0.1896, 0.0500, 0.1968, -0.2331,
    -0.1524, -0.1069, -0.3821, 0.3744, -0.0753,
    -0.0177, 0.1578, -0.1543, 0.0330, 0.2318,
], dtype=np.float32).reshape(3, 5)
RNN_W_HH = np.array([
    0.0964, 0.3816, 0.1670, 0.2344, -0.0322,
    -0.3150, 0.2676, 0.1690, 0.1398, 0.0135,
    -0.4383, -0.1151, 0.0135, 0.2061, -0.0159,
    0.2352, -0.3320, -0.2943, 0.0488, -0.0794,
    0.2098, -0.0613, 0.3000, 0.2912, -0.0485,
], dtype=np.float32).reshape(5, 5)
RNN_B_IH = np.array([-0.1762, 0.1190, 0.3201, -0.2779, -0.0340],
                    dtype=np.float32)
RNN_B_HH = np.array([-0.1449, -0.0929, 0.0448, -0.0617, 0.4359],
                    dtype=np.float32)
RNN_EXPECTED = np.array([
    [-0.3151, 0.0350, 0.3130, -0.2865, 0.3998],
    [-0.3876, -0.1749, 0.0873, 0.1279, 0.2031],
    [-0.5402, -0.1695, 0.1219, 0.2557, 0.3270],
    [-0.3853, -0.3751, -0.1476, 0.1991, 0.2695],
    [-0.3659, -0.4214, -0.1590, 0.1271, 0.3159],
    [-0.2134, -0.3147, -0.1635, -0.0416, 0.3850],
    [-0.0956, -0.2925, 0.1586, -0.2606, 0.3544],
    [-0.1743, -0.0339, 0.1121, -0.1758, 0.5128],
], dtype=np.float32).reshape(4, 2, 5)


def test_linear_golden():
    params = {"w": jnp.asarray(LIN_W), "b": jnp.asarray(LIN_B)}
    out = linear(params, jnp.asarray(LIN_INP), activation="relu")
    np.testing.assert_allclose(np.asarray(out), LIN_EXPECTED, atol=1e-4)


def test_linear_no_activation():
    params = {"w": jnp.asarray(LIN_W), "b": jnp.asarray(LIN_B)}
    out = linear(params, jnp.asarray(LIN_INP), activation=None)
    expected = LIN_INP @ LIN_W + LIN_B
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_rnn_golden():
    params = {"layers": [{
        "w_ih": jnp.asarray(RNN_W_IH), "w_hh": jnp.asarray(RNN_W_HH),
        "b_ih": jnp.asarray(RNN_B_IH), "b_hh": jnp.asarray(RNN_B_HH),
    }]}
    out = rnn_forward(params, jnp.asarray(RNN_INP))
    assert out.shape == (4, 2, 5)
    np.testing.assert_allclose(np.asarray(out), RNN_EXPECTED, atol=1e-4)


def test_rnn_matches_numpy_reference():
    """Property: scan RNN == straightforward NumPy recurrence."""
    rng = np.random.default_rng(0)
    T, B, F, H = 7, 3, 6, 5
    x = rng.standard_normal((T, B, F)).astype(np.float32)
    w_ih = rng.standard_normal((F, H)).astype(np.float32) * 0.3
    w_hh = rng.standard_normal((H, H)).astype(np.float32) * 0.3
    b_ih = rng.standard_normal(H).astype(np.float32) * 0.1
    b_hh = rng.standard_normal(H).astype(np.float32) * 0.1

    h = np.zeros((B, H), np.float32)
    want = np.zeros((T, B, H), np.float32)
    for t in range(T):
        h = np.tanh(x[t] @ w_ih + h @ w_hh + b_ih + b_hh)
        want[t] = h

    params = {"layers": [{"w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh),
                          "b_ih": jnp.asarray(b_ih), "b_hh": jnp.asarray(b_hh)}]}
    got = rnn_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_rnn_bidirectional_shapes_and_reverse():
    rng = np.random.default_rng(1)
    T, B, F, H = 5, 2, 4, 3
    x = rng.standard_normal((T, B, F)).astype(np.float32)

    import jax
    from gasr_tpu.ops import rnn_init
    params = rnn_init(jax.random.PRNGKey(0), F, H, num_layers=2,
                      bidirectional=True)
    out = rnn_forward(params, jnp.asarray(x))
    assert out.shape == (T, B, 2 * H)

    # Backward direction of a 1-layer net == forward direction on reversed input.
    p1 = {"layers": [params["layers"][0]], "layers_rev": [params["layers_rev"][0]]}
    out1 = rnn_forward(p1, jnp.asarray(x))
    p_rev_only = {"layers": [params["layers_rev"][0]]}
    rev = rnn_forward(p_rev_only, jnp.asarray(x[::-1]))
    np.testing.assert_allclose(np.asarray(out1[:, :, H:]),
                               np.asarray(rev)[::-1], atol=1e-6)
