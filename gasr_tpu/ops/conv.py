"""2D convolution frontend ops (DeepSpeech2-style time/freq subsampling).

The reference has no convolutions; DeepSpeech2 (BASELINE.json config 3)
opens with two conv layers over (time, freq) that subsample time 2x.
Implemented with lax.conv_general_dilated in NHWC (TPU-native layout:
channels last feeds the MXU as the contraction dim) with clipped-ReLU
(the DS2 paper's min(max(x,0),20)).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


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
    """
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + params["b"]
    y = jnp.clip(y, 0.0, 20.0)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y
