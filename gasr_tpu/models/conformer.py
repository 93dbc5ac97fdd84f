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
from gasr_tpu.ops.conv import conv2d, conv2d_init, conv_mixed
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
    """LayerNorm. Statistics always accumulate in f32 (bf16 mean/var is
    the classic mixed-precision footgun); output returns at x.dtype so a
    bf16 activation stream stays bf16."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + 1e-5) * p["g"] + p["b"]
    return y.astype(x.dtype)


def _ffn_init(key, d: int, mult: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"ln": _ln_init(d),
            "w1": linear_init(k1, d, d * mult),
            "w2": linear_init(k2, d * mult, d)}


def _lin(p: dict, x: jax.Array, cd) -> jax.Array:
    """linear() at the block compute dtype: matmul inputs at cd, f32
    accumulate, output re-emitted at cd so the activation stream (and
    therefore every fusion-boundary HBM buffer) stays half-width."""
    y = linear(p, x, activation=None, compute_dtype=cd)
    return y if cd is None else y.astype(cd)


def _ffn(p: dict, x: jax.Array, cd=None) -> jax.Array:
    h = _ln(p["ln"], x)
    h = _lin(p["w1"], h, cd)
    h = h * jax.nn.sigmoid(h)                     # swish
    return _lin(p["w2"], h, cd)


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


def _convmod(p: dict, x: jax.Array, kernel: int, cd=None) -> jax.Array:
    """Conformer conv module. x: [T, B, D]."""
    h = _ln(p["ln"], x)
    h = _lin(p["pw1"], h, cd)                     # [T, B, 2D]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)                     # GLU
    # depthwise conv along time: NWC layout [B, T, D]
    hw = jnp.transpose(h, (1, 0, 2))
    D = hw.shape[-1]
    dw = p["dw"] if cd is None else p["dw"].astype(cd)
    # conv_mixed: grad-safe mixed-dtype conv (ops/conv.py, r5) — plain
    # lax.conv with bf16 operands + f32 preferred type crashes under
    # jax.grad, which is why bf16 conformer training didn't exist in r4
    hw = conv_mixed(hw, dw, (1,), "SAME", ("NWC", "WIO", "NWC"),
                    D) + p["dw_b"]
    if cd is not None:
        hw = hw.astype(cd)
    h = jnp.transpose(hw, (1, 0, 2))
    h = _ln(p["ln2"], h)
    h = h * jax.nn.sigmoid(h)                     # swish
    return _lin(p["pw2"], h, cd)


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
           mask=None, cd=None, attn_impl: str = "auto") -> jax.Array:
    half = jnp.asarray(0.5, x.dtype)
    x = x + half * _ffn(p["ff1"], x, cd)
    a = mhsa_rel(p["mhsa"], _ln(p["mhsa_ln"], x), heads, mask,
                 compute_dtype=cd, impl=attn_impl)
    x = x + (a if cd is None else a.astype(cd))
    x = x + _convmod(p["conv"], x, kernel, cd)
    x = x + half * _ffn(p["ff2"], x, cd)
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
                    compute_dtype=None, attn_impl: str = "auto",
                    stem_impl: str = "auto", **_) -> jax.Array:
    """x: [B, T, F] -> log-probs [T//4, B, vocab+1].

    compute_dtype (e.g. jnp.bfloat16): mixed-precision policy — params
    stay f32, all matmuls/convs take reduced-dtype inputs with f32
    accumulation, the residual stream is carried at the reduced dtype,
    LayerNorm statistics + attention softmax + the final log_softmax
    stay f32. Measured on TPU v5e (conformer_l B=64 T=1200): this is
    the single largest forward-perf lever (halves every HBM pass).
    """
    hp = _preset(config)
    cd = compute_dtype
    if isinstance(cd, str):
        cd = None if cd == "float32" else jnp.dtype(cd)
    d, heads, kernel = hp["d_model"], hp["num_heads"], hp["conv_kernel"]
    B, T, F = x.shape

    use_stem_kernel = False
    if stem_impl == "pallas":
        # OPT-IN ONLY (measured negative result, r5 probes 2-3): the
        # fused parity-plane kernel is exact and differentiable but
        # measured 38.6 ms vs the XLA stem's 19.7 at conformer_l — the
        # XLA-side plane pads/shifts/layout copies move ~5 GB of HBM,
        # and with the mandatory 1.57 GB conv1 intermediate plus conv2's
        # 9.2 ms MXU floor, the stem's true roofline is ~14-15 ms, so
        # at most ~5 ms was ever recoverable from XLA's 19.7. "auto"
        # therefore NEVER selects it; docs/KERNEL_PLAN.md closes the
        # line of inquiry with the numbers.
        from gasr_tpu.ops.pallas.stem import stem_eligible
        use_stem_kernel = stem_eligible(T, F, d, d)
    if use_stem_kernel:
        # fused parity-plane stem (ops/pallas/stem.py): conv2 + clip +
        # sub_proj in one kernel, accumulators VMEM-resident;
        # differentiable via the stem_ref recompute custom_vjp
        from gasr_tpu.ops.pallas.stem import fused_stem
        h = fused_stem(x, params["sub1"]["w"], params["sub1"]["b"],
                       params["sub2"]["w"], params["sub2"]["b"],
                       params["sub_proj"]["w"], params["sub_proj"]["b"],
                       interpret=jax.default_backend() != "tpu",
                       out_dtype=cd if cd is not None else jnp.float32)
    else:
        h = x[:, :, :, None]                       # [B, T, F, 1]
        h = conv2d(params["sub1"], h, (2, 2), compute_dtype=cd)
        h = conv2d(params["sub2"], h, (2, 2), compute_dtype=cd)
        Bt, Tp, Fp, C = h.shape                    # [B, T/4, F/4, d]
        h = h.reshape(B, Tp, Fp * C)
        h = _lin(params["sub_proj"], h, cd)
    h = jnp.transpose(h, (1, 0, 2))                # [T', B, d]
    for blk in params["blocks"]:
        h = _block(blk, h, heads, kernel, mask, cd, attn_impl)
    logits = linear(params["proj"], h, activation=None, compute_dtype=cd)
    return jax.nn.log_softmax(logits, axis=-1)
