"""Conformer-CTC (BASELINE.json configs 4-5: Conformer-S ~10M params,
Conformer-L sharded multi-chip).

Conv subsampling (4x time reduction) -> N Conformer blocks
(half-step FFN -> rel-pos MHSA -> conv module -> half-step FFN -> LN)
-> projection -> log_softmax.

TPU-first notes: everything time-major [T, B, D]; depthwise conv via
lax.conv_general_dilated with feature_group_count=D; normalization is
LayerNorm throughout (including the conv module, where the paper uses
BatchNorm — a documented deviation that keeps the model pure-functional
with no running statistics to plumb).

Presets: conformer_s (d=144, 16 blocks, 4 heads), conformer_l (d=512,
17 blocks, 8 heads), scaled via Config.linear_size when it differs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gasr_tpu.config import Config
from gasr_tpu.ops.attention import mhsa_rel, mhsa_rel_init
from gasr_tpu.ops.conv import conv2d, conv2d_init
from gasr_tpu.ops.linear import linear, linear_init

_PRESETS = {
    "conformer_s": dict(d_model=144, num_blocks=16, num_heads=4,
                        ff_mult=4, conv_kernel=31),
    "conformer_l": dict(d_model=512, num_blocks=17, num_heads=8,
                        ff_mult=4, conv_kernel=31),
}


def _preset(config: Config) -> dict:
    p = dict(_PRESETS.get(config.model, _PRESETS["conformer_s"]))
    # allow config override of width/depth for testing/sharding experiments
    if config.linear_size and config.linear_size != p["d_model"]:
        p["d_model"] = config.linear_size
    if config.num_blocks is not None:
        p["num_blocks"] = config.num_blocks
    return p


def _ln_init(d: int) -> dict:
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _ln(p: dict, x: jax.Array) -> jax.Array:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _ffn_init(key, d: int, mult: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"ln": _ln_init(d),
            "w1": linear_init(k1, d, d * mult),
            "w2": linear_init(k2, d * mult, d)}


def _ffn(p: dict, x: jax.Array) -> jax.Array:
    h = _ln(p["ln"], x)
    h = linear(p["w1"], h, activation=None)
    h = h * jax.nn.sigmoid(h)                     # swish
    return linear(p["w2"], h, activation=None)


def _convmod_init(key, d: int, kernel: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 1.0 / (d ** 0.5)
    return {
        "ln": _ln_init(d),
        "pw1": linear_init(k1, d, 2 * d),
        "dw": jax.random.normal(k2, (kernel, 1, d)) * s,  # [K, 1, D] HIO
        "dw_b": jnp.zeros((d,)),
        "ln2": _ln_init(d),
        "pw2": linear_init(k3, d, d),
    }


def _convmod(p: dict, x: jax.Array, kernel: int) -> jax.Array:
    """Conformer conv module. x: [T, B, D]."""
    h = _ln(p["ln"], x)
    h = linear(p["pw1"], h, activation=None)      # [T, B, 2D]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)                     # GLU
    # depthwise conv along time: NWC layout [B, T, D]
    hw = jnp.transpose(h, (1, 0, 2))
    D = hw.shape[-1]
    hw = lax.conv_general_dilated(
        hw, p["dw"], window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=D,
        preferred_element_type=jnp.float32) + p["dw_b"]
    h = jnp.transpose(hw, (1, 0, 2))
    h = _ln(p["ln2"], h)
    h = h * jax.nn.sigmoid(h)                     # swish
    return linear(p["pw2"], h, activation=None)


def _block_init(key, d: int, heads: int, ff_mult: int, kernel: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "ff1": _ffn_init(ks[0], d, ff_mult),
        "mhsa_ln": _ln_init(d),
        "mhsa": mhsa_rel_init(ks[1], d, heads),
        "conv": _convmod_init(ks[2], d, kernel),
        "ff2": _ffn_init(ks[3], d, ff_mult),
        "ln_out": _ln_init(d),
    }


def _block(p: dict, x: jax.Array, heads: int, kernel: int,
           mask=None) -> jax.Array:
    x = x + 0.5 * _ffn(p["ff1"], x)
    x = x + mhsa_rel(p["mhsa"], _ln(p["mhsa_ln"], x), heads, mask)
    x = x + _convmod(p["conv"], x, kernel)
    x = x + 0.5 * _ffn(p["ff2"], x)
    return _ln(p["ln_out"], x)


def conformer_output_length(input_length):
    """4x time subsampling (two stride-2 convs, SAME padding)."""
    return -(-(-(-input_length // 2)) // 2)


def conformer_init(key: jax.Array, config: Config,
                   dtype=jnp.float32) -> dict:
    hp = _preset(config)
    d = hp["d_model"]
    ks = jax.random.split(key, hp["num_blocks"] + 4)
    F = config.feat_size
    f_sub = -(-(-(-F // 2)) // 2)                  # freq also /4
    return {
        "sub1": conv2d_init(ks[0], 1, d, (3, 3), dtype),
        "sub2": conv2d_init(ks[1], d, d, (3, 3), dtype),
        "sub_proj": linear_init(ks[2], d * f_sub, d, dtype),
        "blocks": [
            _block_init(ks[3 + i], d, hp["num_heads"], hp["ff_mult"],
                        hp["conv_kernel"])
            for i in range(hp["num_blocks"])],
        "proj": linear_init(ks[-1], d, config.output_size, dtype),
    }


def conformer_apply(config: Config, params: dict, x: jax.Array, mask=None,
                    **_) -> jax.Array:
    """x: [B, T, F] -> log-probs [T//4, B, vocab+1]."""
    hp = _preset(config)
    d, heads, kernel = hp["d_model"], hp["num_heads"], hp["conv_kernel"]
    B, T, F = x.shape
    h = x[:, :, :, None]                           # [B, T, F, 1]
    h = conv2d(params["sub1"], h, (2, 2))
    h = conv2d(params["sub2"], h, (2, 2))          # [B, T/4, F/4, d]
    Bt, Tp, Fp, C = h.shape
    h = h.reshape(B, Tp, Fp * C)
    h = linear(params["sub_proj"], h, activation=None)
    h = jnp.transpose(h, (1, 0, 2))                # [T', B, d]
    for blk in params["blocks"]:
        h = _block(blk, h, heads, kernel, mask)
    logits = linear(params["proj"], h, activation=None)
    return jax.nn.log_softmax(logits, axis=-1)
