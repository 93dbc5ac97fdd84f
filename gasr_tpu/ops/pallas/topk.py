"""Exact, stable top-k built from Mosaic-lowerable primitives.

STATUS — kernel-internals library, NOT a standalone op: as a drop-in
for `lax.top_k` this kernel LOSES (2.87 ms vs 0.77 ms at [256, 4700],
k=100 on TPU v5e — the fori_loop one-hot compaction dominates). Its
value is the machinery (`_monotone_bits`, bit-bisection threshold,
LT-matmul cumsum, `_bitonic_sort_desc`), which ops/pallas/
fused_decode.py composes INSIDE the whole-scan decode kernel, where
lax.top_k does not exist at all and where the compaction is replaced
by the cheaper two-level chunk inverse. The standalone pallas_topk
entry point is kept because its tests pin the machinery bit-exact
against lax.top_k (tests/test_pallas_topk.py).

Mosaic lowers neither sort nor top_k nor cumsum nor scatter (probed;
CLAUDE.md), so selection is built from primitives that DO lower:

  1. order-preserving float->uint32 bit map (lax.bitcast + mask flip);
  2. exact k-th-largest threshold via 32-step binary search on the bit
     pattern (per-row, vectorized compare+count);
  3. tie handling: elements equal to the threshold are admitted in
     index order up to the remaining quota (matches lax.top_k's stable
     tie-break exactly);
  4. compaction of the k winners into 128 slots: positions from a
     chunked lower-triangular-matmul cumsum (MXU), then a chunked
     one-hot-compare einsum (MXU) — no scatter;
  5. final value ordering: in-register bitonic sort of the 128 slots on
     the composite key (u_hi, u_lo, -index), partner exchange via
     reshape/concat lane swaps — no sort primitive.

Requires k <= 128 (the decoder's W=100 fits; callers fall back to
lax.top_k otherwise). Returns (values, indices) bit-identical to
lax.top_k (validated in tests incl. tie cases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128
_SORT_N = 128


def _monotone_bits(x: jax.Array) -> jax.Array:
    """f32 -> uint32 with the same total order (ascending)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    top = u >= jnp.uint32(0x80000000)
    return jnp.where(top, ~u, u | jnp.uint32(0x80000000))


def _inverse_monotone_bits(u: jax.Array) -> jax.Array:
    top = u >= jnp.uint32(0x80000000)
    orig = jnp.where(top, u & jnp.uint32(0x7FFFFFFF), ~u)
    return lax.bitcast_convert_type(orig, jnp.float32)


def _cumsum_chunked(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last dim (multiple of _CHUNK) using
    lower-triangular matmuls — no cumsum primitive needed."""
    B, N = x.shape
    C = N // _CHUNK
    xr = x.reshape(B, C, _CHUNK)
    lt = (lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 0) <=
          lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
          ).astype(jnp.float32)
    within = jax.lax.dot_general(
        xr, lt, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [B, C, CHUNK]
    totals = within[:, :, _CHUNK - 1:_CHUNK][:, :, 0]  # [B, C]
    # (static positive slice — a bare -1 index lowers to dynamic_slice,
    # which Mosaic does not implement)
    slt = (lax.broadcasted_iota(jnp.int32, (C, C), 0) <
           lax.broadcasted_iota(jnp.int32, (C, C), 1)).astype(jnp.float32)
    carry = jax.lax.dot_general(
        totals, slt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [B, C]
    return (within + carry[:, :, None]).reshape(B, N)


def _bitonic_sort_desc(key, idx):
    """Bitonic sort of the last dim (= _SORT_N, power of two) descending
    by int32 `key` with ascending int32 `idx` tie-break.

    Lane-dim partner exchange (partner[i] = x[i XOR d]) uses same-shape
    2D take_along_axis — the one gather form Mosaic DOES lower
    (tpu.dynamic_gather). Comparisons are signed int32; callers encode
    unsigned order by XORing the sign bit beforehand."""
    n = key.shape[-1]
    lanes = lax.broadcasted_iota(jnp.int32, key.shape, key.ndim - 1)
    log_n = int(np.log2(n))

    for kk in range(1, log_n + 1):
        # block direction alternates with bit kk of the lane index;
        # top block descending => overall descending sort
        asc = ((lanes >> kk) & 1) == 1
        for j in range(kk - 1, -1, -1):
            d = 1 << j
            partner = lanes ^ d
            p_key = jnp.take_along_axis(key, partner, axis=1)
            p_idx = jnp.take_along_axis(idx, partner, axis=1)
            is_lower = (lanes & d) == 0
            gt = (key > p_key) | ((key == p_key) & (idx < p_idx))
            # boolean algebra, not where-on-bools (select_n with bool
            # branches fails to compile in Mosaic):
            # asc: keep iff gt XOR is_lower; desc: the complement
            keep_self = (gt ^ is_lower) == asc
            key = jnp.where(keep_self, key, p_key)
            idx = jnp.where(keep_self, idx, p_idx)
    return key, idx


def _topk_kernel(x_ref, vals_ref, idx_ref, pos_scr, hi_scr, lo_scr,
                 idx_scr, *, k: int, n_valid: int):
    x = x_ref[:]                                      # [Bt, N] f32 (padded)
    Bt, N = x.shape
    lanes = lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    valid = lanes < n_valid
    u = jnp.where(valid, _monotone_bits(x), jnp.uint32(0))

    # ---- exact k-th largest threshold: 32-step bit binary search
    th = jnp.zeros((Bt, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        trial = th | (jnp.uint32(1) << bit)
        cnt = jnp.sum((u >= trial).astype(jnp.int32), axis=1,
                      keepdims=True)
        th = jnp.where(cnt >= k, trial, th)

    mask_gt = (u > th) & valid
    mask_eq = (u == th) & valid
    count_gt = jnp.sum(mask_gt.astype(jnp.int32), axis=1, keepdims=True)
    quota = k - count_gt                               # [Bt, 1]
    eq_cum = _cumsum_chunked(mask_eq.astype(jnp.float32))
    eq_rank = eq_cum - mask_eq.astype(jnp.float32)     # exclusive
    sel = mask_gt | (mask_eq & (eq_rank < quota.astype(jnp.float32)))

    # ---- compaction into _SORT_N slots via one-hot reductions, chunked
    # with a fori_loop over VMEM scratch (pl.ds reads) so the chunk body
    # appears ONCE in the program — the 37x-unrolled version SIGABRTs
    # the Mosaic compiler, and large cross-tile gathers don't lower.
    sel_f = sel.astype(jnp.float32)
    pos = _cumsum_chunked(sel_f) - sel_f               # exclusive
    # unselected lanes get an out-of-range position so the one-hot
    # compare drops them without a separate mask operand
    pos_scr[:] = jnp.where(sel, pos, jnp.float32(2.0 * N))
    # payloads (f32-exact 16-bit halves of u, plus source index)
    hi_scr[:] = lax.bitcast_convert_type(
        u >> 16, jnp.int32).astype(jnp.float32)
    lo_scr[:] = lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    idx_scr[:] = lanes.astype(jnp.float32)

    slots = lax.broadcasted_iota(
        jnp.int32, (1, _CHUNK, _SORT_N), 2).astype(jnp.float32)
    C = N // _CHUNK

    def body(j, carry):
        hi_a, lo_a, idx_a = carry
        s = pl.multiple_of(j * _CHUNK, _CHUNK)
        pos_c = jnp.expand_dims(pos_scr[:, pl.ds(s, _CHUNK)], -1)
        oh = (pos_c == slots).astype(jnp.float32)      # [Bt, CHUNK, SORT]

        def acc(a, ref):
            p = jnp.expand_dims(ref[:, pl.ds(s, _CHUNK)], -1)
            return a + jnp.sum(oh * p, axis=1)
        return (acc(hi_a, hi_scr), acc(lo_a, lo_scr), acc(idx_a, idx_scr))

    zero = jnp.zeros((Bt, _SORT_N), jnp.float32)
    hi, lo, idxf = lax.fori_loop(0, C, body, (zero, zero, zero))

    # empty slots (>= k) accumulated nothing => u = 0 => sorts last
    hi_u = lax.bitcast_convert_type(hi.astype(jnp.int32), jnp.uint32)
    lo_u = lax.bitcast_convert_type(lo.astype(jnp.int32), jnp.uint32)
    u_c = (hi_u << 16) | lo_u
    key = lax.bitcast_convert_type(u_c ^ jnp.uint32(0x80000000), jnp.int32)

    # ---- order by value (desc, index tie-break) — bitonic network
    key, idx_sorted = _bitonic_sort_desc(key, idxf.astype(jnp.int32))

    u_sorted = lax.bitcast_convert_type(key, jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    vals = _inverse_monotone_bits(u_sorted)
    vals_ref[:] = vals
    idx_ref[:] = idx_sorted


@functools.partial(jax.jit, static_argnames=("k", "block_b", "interpret"))
def pallas_topk(x: jax.Array, k: int, block_b: int = 32,
                interpret: bool = False):
    """Exact stable top-k: (values [B, k], indices [B, k]) — bit-equal
    to lax.top_k(x, k). Requires k <= 128."""
    if k > _SORT_N:
        return lax.top_k(x, k)
    B, N = x.shape
    n_pad = (-N) % _CHUNK
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)))
    Np = N + n_pad
    b_pad = (-B) % block_b
    if b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, 0)))
    Bp = B + b_pad

    grid = (Bp // block_b,)
    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, n_valid=N),
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, Np), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_b, _SORT_N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, _SORT_N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, _SORT_N), jnp.float32),
            jax.ShapeDtypeStruct((Bp, _SORT_N), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, Np), jnp.float32),   # pos
            pltpu.VMEM((block_b, Np), jnp.float32),   # u_hi
            pltpu.VMEM((block_b, Np), jnp.float32),   # u_lo
            pltpu.VMEM((block_b, Np), jnp.float32),   # idx
        ],
        interpret=interpret,
    )(x)
    return vals[:B, :k], idx[:B, :k]
