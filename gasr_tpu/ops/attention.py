"""Multi-head self-attention with Transformer-XL relative positions.

For the Conformer models (BASELINE.json configs 4-5). The reference has
no attention at all (SURVEY.md §2.3); this is written TPU-first: one
fused einsum per projection, attention scores in f32 on the MXU, the
rel-shift via reshape (no gathers), and shapes kept [T, B, ...]
time-major to match the rest of the stack.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _sinusoid_pos(n: int, d: int) -> jax.Array:
    """Sinusoidal embeddings for relative positions [n-1 .. -(n-1)]."""
    pos = jnp.arange(n - 1, -n, -1.0)                  # [2n-1]
    inv = jnp.exp(-jnp.arange(0, d, 2) * (math.log(10000.0) / d))
    ang = pos[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [2n-1, d]


def mhsa_rel_init(key: jax.Array, d_model: int, num_heads: int,
                  dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    dh = d_model // num_heads
    s = 1.0 / (d_model ** 0.5)
    n = lambda k, shape: jax.random.normal(k, shape, dtype) * s
    return {
        "wq": n(ks[0], (d_model, d_model)),
        "wk": n(ks[1], (d_model, d_model)),
        "wv": n(ks[2], (d_model, d_model)),
        "wo": n(ks[3], (d_model, d_model)),
        "wr": n(ks[4], (d_model, d_model)),     # rel-pos projection
        "u": jnp.zeros((num_heads, dh), dtype),  # content bias
        "v": jnp.zeros((num_heads, dh), dtype),  # position bias
    }


def _rel_shift(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] (cols = rel offsets T-1 .. -(T-1)) -> [B, H, T, T]
    where out[..., i, j] = x[..., i, (T-1) - (i - j)] = rel offset (i-j).
    Classic Transformer-XL shift via pad+reshape."""
    B, H, T, L = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))     # [B,H,T,2T]
    x = x.reshape(B, H, 2 * T * T)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, T - 1)))
    x = x.reshape(B, H, T + 1, 2 * T - 1)
    return x[:, :, :T, T - 1:]


def mhsa_rel(params: dict, x: jax.Array, num_heads: int,
             mask: Optional[jax.Array] = None,
             compute_dtype=None, impl: str = "auto",
             lengths: Optional[jax.Array] = None) -> jax.Array:
    """x: [T, B, D] -> [T, B, D]. mask: [B, T] True for valid frames.

    compute_dtype (e.g. bfloat16) is the mixed-precision policy for the
    O(T^2) tensors: projections, the score matmuls and the attn@V ride
    the MXU at the reduced dtype with f32 accumulation; the softmax
    itself stays f32 (max-subtraction + normalization in f32); the big
    [B, H, T, ~2T] position tensor is shifted at the reduced dtype so
    its pad/reshape passes move half the HBM bytes.

    impl: "xla" | "pallas" | "auto". The pallas path is the fused
    flash-style kernel (ops/pallas/flash_mhsa.py): the whole score tile
    lives in VMEM so NO O(T^2) tensor touches HBM — measured ~7 ms ->
    sub-ms per conformer_l block on TPU v5e. "auto" takes it on TPU
    when compute_dtype is bf16 (the kernel computes at bf16, so auto
    never silently drops an f32 model's precision), the shape is
    eligible, and masking is either absent or expressible as prefix
    `lengths` [B] (the kernel's mask form; an arbitrary boolean mask
    falls back to XLA).

    bf16-compute contract of impl="pallas": EXPLICITLY forcing the
    kernel always computes q/k/v projections of the attention inner
    math at bf16 regardless of compute_dtype — with compute_dtype=None
    only the OUTPUT dtype is restored to f32 (out_f32). Callers who
    need f32 attention math must use impl="xla"/"auto"; "auto" encodes
    exactly that rule.

    Differentiable (r5): the pallas path carries a custom_vjp
    (flash_ref recompute backward), so jax.grad through impl="pallas"
    or the auto->pallas dispatch is supported — conformer bf16 training
    rides the flash forward.
    """
    T, B, D = x.shape
    dh = D // num_heads
    cd = compute_dtype
    c = (lambda a: a.astype(cd)) if cd is not None else (lambda a: a)

    use_pallas = False
    if impl in ("auto", "pallas"):
        from gasr_tpu.ops.pallas.flash_mhsa import flash_eligible
        ok = flash_eligible(T, dh, D) and mask is None
        if impl == "pallas":
            use_pallas = ok
        else:
            use_pallas = (ok and cd == jnp.bfloat16
                          and jax.default_backend() == "tpu")

    # q/k/v in ONE [D, 3D] GEMM: column blocks of a matmul are
    # independent, so this is bit-identical to three separate GEMMs
    # while tripling the N dim the MXU sees (and cutting two kernel
    # launches per block)
    wqkv = jnp.concatenate([params["wq"], params["wk"], params["wv"]],
                           axis=1)
    qkv = c(jnp.einsum("tbd,de->tbe", c(x), c(wqkv),
                       preferred_element_type=jnp.float32))
    q = qkv[:, :, :D].reshape(T, B, num_heads, dh)
    k = qkv[:, :, D:2 * D].reshape(T, B, num_heads, dh)
    v = qkv[:, :, 2 * D:].reshape(T, B, num_heads, dh)

    if use_pallas:
        from gasr_tpu.ops.pallas.flash_mhsa import flash_mhsa_rel
        interp = jax.default_backend() != "tpu"
        lens = (jnp.full((B,), T, jnp.int32) if lengths is None
                else lengths.astype(jnp.int32))
        tb = lambda a: jnp.transpose(a, (1, 2, 0, 3))    # -> [B, H, T, dh]
        out = flash_mhsa_rel(tb(q), tb(k), tb(v), params["wr"],
                             params["u"], params["v"], lens,
                             out_f32=cd is None, interpret=interp)
        out = c(jnp.transpose(out, (2, 0, 1, 3))).reshape(T, B, D)
        return jnp.einsum("tbd,de->tbe", out, c(params["wo"]),
                          preferred_element_type=jnp.float32)

    if lengths is not None and mask is None:
        # prefix lengths are the kernel's mask form; when the XLA path
        # runs instead (ineligible shape / f32 / CPU), honor them as a
        # boolean mask rather than silently decoding unmasked
        mask = jnp.arange(T)[None, :] < lengths[:, None]

    r = _sinusoid_pos(T, D) @ params["wr"]               # [2T-1, D]
    r = c(r).reshape(2 * T - 1, num_heads, dh)

    # content and position terms (Transformer-XL eq. with biases u, v)
    ac = jnp.einsum("tbhd,sbhd->bhts", q + c(params["u"])[None, None], k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("tbhd,lhd->bhtl", q + c(params["v"])[None, None], r,
                    preferred_element_type=jnp.float32)
    bd = _rel_shift(c(bd))                               # [B, H, T, T]

    scores = (ac + bd.astype(jnp.float32)) / math.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    attn = c(jax.nn.softmax(scores, axis=-1))
    out = jnp.einsum("bhts,sbhd->tbhd", attn, v,
                     preferred_element_type=jnp.float32)
    out = c(out).reshape(T, B, D)
    return jnp.einsum("tbd,de->tbe", out, c(params["wo"]),
                      preferred_element_type=jnp.float32)
