"""2D convolution frontend ops (DeepSpeech2-style time/freq subsampling).

The reference has no convolutions; DeepSpeech2 (BASELINE.json config 3)
opens with two conv layers over (time, freq) that subsample time 2x.
Implemented with lax.conv_general_dilated in NHWC (TPU-native layout:
channels last feeds the MXU as the contraction dim) with clipped-ReLU
(the DS2 paper's min(max(x,0),20)).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv_mixed(x: jax.Array, w: jax.Array, stride, padding, dn,
               feature_group_count: int) -> jax.Array:
    """lax.conv_general_dilated with reduced-dtype operands and f32
    accumulation (preferred_element_type) that is SAFE UNDER jax.grad.

    Plain lax.conv with bf16 operands + f32 preferred type crashes in
    its transpose rule (the f32 cotangent meets bf16 operands and lax
    demands matching dtypes) — the r4 bug that made bf16 conformer
    training nonexistent. The fix keeps the fast mixed-dtype conv as
    the forward and defines the backward as the VJP of the f32-cast
    twin (bit-identical math: operands are already rounded; casting to
    f32 before an f32-accumulating conv changes nothing), which
    transposes cleanly. Cotangents come back at the operands' dtypes.
    """
    return lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=dn, feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32)


def _conv_mixed_fwd(x, w, stride, padding, dn, fgc):
    return conv_mixed(x, w, stride, padding, dn, fgc), (x, w)


def _conv_mixed_bwd(stride, padding, dn, fgc, res, g):
    x, w = res

    def f32_twin(x_, w_):
        return lax.conv_general_dilated(
            x_.astype(jnp.float32), w_.astype(jnp.float32),
            window_strides=stride, padding=padding,
            dimension_numbers=dn, feature_group_count=fgc,
            preferred_element_type=jnp.float32)

    _, pull = jax.vjp(f32_twin, x, w)
    return pull(g)


conv_mixed.defvjp(_conv_mixed_fwd, _conv_mixed_bwd)


def conv2d_init(key: jax.Array, in_ch: int, out_ch: int,
                kernel: Tuple[int, int], dtype=jnp.float32) -> dict:
    fan_in = in_ch * kernel[0] * kernel[1]
    bound = (1.0 / fan_in) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, kernel + (in_ch, out_ch), dtype,
                                -bound, bound),   # HWIO
        "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def conv2d(params: dict, x: jax.Array, stride: Tuple[int, int],
           padding="SAME", compute_dtype=None) -> jax.Array:
    """x: [B, H(time), W(freq), C] NHWC -> clipped-ReLU conv output.

    compute_dtype (e.g. bfloat16): conv inputs run at the reduced dtype
    (MXU-native), accumulation stays f32, and the clipped-ReLU output is
    emitted at the reduced dtype so downstream HBM traffic halves.

    Differentiable at reduced dtype via conv_mixed (r5): the mixed
    bf16-operand/f32-accumulate conv crashes lax's transpose rule, so
    grads route through the f32-cast twin's VJP — same math, same fast
    forward.
    """
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = conv_mixed(x, w, stride, padding, ("NHWC", "HWIO", "NHWC"), 1)
    y = y + params["b"]
    y = jnp.clip(y, 0.0, 20.0)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y
