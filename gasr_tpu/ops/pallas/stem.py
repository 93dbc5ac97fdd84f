"""Fused conformer subsampling stem: Pallas conv2 + sub_proj kernel
over parity-decomposed conv1 planes.

Why (docs/KERNEL_PLAN.md r4 stem entry): the stem measured 20.3-28.7 ms
bf16 at conformer_l (B=64 T=1200 F=80 d=512) vs a ~12-14 ms roofline,
and both jnp-level GEMM reformulations of conv2 LOST to XLA's conv
emitter — 9 shift-GEMMs cost 48 ms because every tap re-streams a
[B, 300, 20, 512] f32 accumulator through HBM, and im2col patches cost
35 ms moving a 1.77 GB patch tensor. The fix has to keep the
accumulator in VMEM across all 9 taps — a Pallas kernel.

The kernel never does a strided access. Both convs are stride-2, so
conv2's taps land on fixed PARITIES of conv1's output grid:

    out2(t2, f2) = sum_{di,dj in 0..2} w2[di,dj] . h1[2 t2 + di, 2 f2 + dj]

(jax SAME padding for k=3,s=2,even-T pads (0,1), so taps are +0,+1,+2).
Writing h1's grid as four parity planes P[pt][pf][a, b] =
h1[2a + pt, 2b + pf], every tap becomes a UNIT-STRIDE read:
di=0 -> tE@t2, di=1 -> tO@t2, di=2 -> tE@(t2+1), same for freq. The
planes are produced by XLA as four offset stride-4 convs over the raw
input (so conv1 also never materializes its full-resolution output in
the fused layout's way — each plane is written once, read once).

Kernel layout: planes are [B, freq, time, d] — time on SUBLANES,
channels on LANES, freq UNTILED (freq offsets are free; time offsets
are handled by passing pre-shifted copies of the tE planes, so every
in-kernel slice is offset-0 and alignment-clean; Mosaic sublane slices
at odd offsets are relayout hazards). Per (batch, time-block) program:

    for f2:                       # untiled freq loop, static
        acc[blk, d]  = b2         # f32, VMEM-resident across all taps
        for (di, dj) in 9 taps:
            acc += plane_tile[blk, d] @ w2[di, dj]     # MXU, K=d
        h = clip(acc, 0, 20) -> bf16                    # conv2 epilogue
        out[blk, dout] += h @ wp[f2]                    # sub_proj fused
    out += bp

so conv2's intermediate NEVER touches HBM either — the program's only
HBM writes are the [blk, dout] final stem rows. MXU cost at
conformer_l: (9+1) matmuls x 20 freqs x [64, 512]x[512, 512] over 320
time rows x 64 batch = ~8.7 ms analytic vs 9.2 ms conv2-alone
roofline; everything else rides in its shadow.

Differentiable the same way flash-MHSA is (r5): custom_vjp whose
backward is the VJP of the plain XLA stem (conv_mixed twin — identical
math at bf16 resolution), so conformer training keeps the fast stem.

Reference obligation: the reference has no convolutions at all
(SURVEY.md section 2.3); this serves the conformer families'
BASELINE.json configs 4-5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def stem_eligible(T: int, F: int, d: int, dout: int) -> bool:
    """T, F: raw input time/freq. Parity decomposition needs both
    subsample stages to split evenly; lane dims must tile."""
    return (T % 4 == 0 and F % 4 == 0 and T >= 8 and F >= 8
            and d % 128 == 0 and dout % 128 == 0 and d <= 1024)


def _conv1_planes(x, w1, b1):
    """x [B, T, F] f32 -> four parity planes of clip(conv1(x)+b1) in
    [B, F2(+1 for fE), T2, d] bf16 layout (freq, time, channels), plus
    time-shifted copies of the tE planes.

    Plane (pt, pf)[a, b] = h1[2a + pt, 2b + pf]; h1 is the SAME
    stride-2 conv over the zero-hi-padded input, so plane (pt, pf) is
    the VALID stride-4 conv of x shifted by (2 pt, 2 pf). All planes
    are exactly [T2, F2] in-grid entries — conv2's SAME hi-pad taps
    (t2+1 = T2, f2+1 = F2) must read ZERO, not clip(conv(0)+b1), so
    they are supplied by the zero-padding in _fused_stem_fwd, never
    computed here (the r5 first-cut bug).
    """
    from gasr_tpu.ops.conv import conv_mixed
    B, T, F = x.shape
    T2, F2 = T // 4, F // 4
    bf = jnp.bfloat16
    # hi-pad by 3: covers the plane offsets (+2) and conv SAME hi-pad
    xp = jnp.pad(x, ((0, 0), (0, 3), (0, 3)))[..., None].astype(bf)
    w1b = w1.astype(bf)
    planes = {}
    for pt in (0, 1):
        for pf in (0, 1):
            nf, nt = F2, T2
            sl = xp[:, 2 * pt:2 * pt + 4 * nt - 1,
                    2 * pf:2 * pf + 4 * nf - 1]
            p = conv_mixed(sl, w1b, (4, 4), "VALID",
                           ("NHWC", "HWIO", "NWHC"), 1)   # [B,F',T',d]
            p = jnp.clip(p + b1, 0.0, 20.0).astype(bf)
            planes[(pt, pf)] = p
    return planes


def _kernel(pEE, pEE1, pEO, pEO1, pOE, pOO, w2, wp, b2, bp, out,
            *, blk: int, F2: int, d: int, dout: int, out_dtype,
            inner: str = "dot3d"):
    """One (batch, time-block) program; see module docstring.

    pEE/pEO: tE planes [1, F2+1 / F2, blk, d] (time rows t2..t2+blk-1)
    pEE1/pEO1: the same planes shifted by one time row (rows t2+1..)
    pOE/pOO: tO planes (di=1 taps)
    w2: [9, d, d] (tap-major: 3*di+dj); wp: [F2, d, dout]
    b2: [1, d]; bp: [1, dout]

    inner="dot3d": each tap contracts ALL F2 freqs in one 3D
    dot_general ([F2, blk, d] x [d, d] -> 9 big matmuls + one
    [F2, blk, d] x [F2, d, dout] double-contraction). The first cut
    looped f2 and issued 10 small [blk, d] matmuls per freq — 200
    MXU ops per program whose per-op overhead measured ~2x the whole
    roofline (38.6 ms vs 19.9 XLA / ~9 analytic). "loop" keeps the
    per-freq form for A/B.
    """
    f32 = jnp.float32
    bf = jnp.bfloat16

    def tap_src(di, dj):
        src = {
            (0, 0): pEE, (0, 1): pEO,
            (1, 0): pOE, (1, 1): pOO,
            (2, 0): pEE1, (2, 1): pEO1,
        }[(di, dj if dj < 2 else 0)]
        a = 1 if dj == 2 else 0
        return src, a

    if inner == "dot3d":
        acc = jnp.broadcast_to(b2[...].astype(f32), (F2, blk, d))
        for di in range(3):
            for dj in range(3):
                src, a = tap_src(di, dj)
                tile = src[0, a:a + F2]                # [F2, blk, d]
                acc = acc + lax.dot_general(
                    tile, w2[3 * di + dj], (((2,), (0,)), ((), ())),
                    preferred_element_type=f32)
        h = jnp.clip(acc, 0.0, 20.0).astype(bf)        # [F2, blk, d]
        # sub_proj as a per-freq loop: a single [F2,blk,d]x[F2,d,dout]
        # double contraction trips Mosaic ("lhs contracting dims must
        # be of size 1", r5 probe 3); 20 [blk,d]@[d,dout] matmuls — on
        # top of the 9 big tap dots — keep the op count at 29/program
        acc_out = jnp.zeros((blk, dout), f32)
        for f2 in range(F2):
            acc_out = acc_out + lax.dot_general(
                h[f2], wp[f2], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
    else:
        acc_out = jnp.zeros((blk, dout), f32)
        for f2 in range(F2):
            acc = jnp.broadcast_to(b2[...].astype(f32), (blk, d))
            for di in range(3):
                for dj in range(3):
                    src, a = tap_src(di, dj)
                    tile = src[0, a + f2]              # [blk, d] bf16
                    acc = acc + lax.dot_general(
                        tile, w2[3 * di + dj],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
            h = jnp.clip(acc, 0.0, 20.0).astype(bf)
            acc_out = acc_out + lax.dot_general(
                h, wp[f2], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
    out[0] = (acc_out + bp[...].astype(f32)).astype(out_dtype)


def _fused_stem_fwd(x, w1, b1, w2, b2, wproj, bproj,
                    blk: int = 64, interpret: bool = False,
                    out_dtype=jnp.bfloat16, inner: str = "dot3d"):
    """x [B, T, F] -> stem output [B, T//4, dout] (= clip-conv1 ->
    clip-conv2 -> reshape(freq-major) -> sub_proj, all at bf16 operand
    / f32 accumulate resolution)."""
    B, T, F = x.shape
    T2, F2 = T // 4, F // 4
    d = w2.shape[-1]
    dout = wproj.shape[-1]
    bf = jnp.bfloat16
    planes = _conv1_planes(x, w1, b1)
    T2p = _round_up(T2 + 1, blk)

    def padt(p, want_f):
        # pad time (last-but-one... layout [B, F', T', d]) to T2p and
        # freq to want_f
        pb, pf_, pt_, pd_ = p.shape
        return jnp.pad(p, ((0, 0), (0, want_f - pf_),
                           (0, T2p - pt_), (0, 0)))

    pEE = padt(planes[(0, 0)], F2 + 1)
    pEO = padt(planes[(0, 1)], F2)
    pOE = padt(planes[(1, 0)], F2 + 1)
    pOO = padt(planes[(1, 1)], F2)
    # time-shifted copies of the tE planes (tap di=2 -> t2+1): slice
    # then re-pad so every kernel access is offset-0
    pEE1 = jnp.pad(pEE[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    pEO1 = jnp.pad(pEO[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))

    # w2 [3, 3, d, d] HWIO -> [9, d, d]; wproj rows are freq-major
    # (reshape(F2 * d) with f-major index f*d + c) -> [F2, d, dout]
    w2k = w2.astype(bf).reshape(9, d, d)
    wpk = wproj.astype(bf).reshape(F2, d, dout)

    grid = (B, T2p // blk)

    def pspec(nf):
        return pl.BlockSpec((1, nf, blk, d), lambda b, i: (b, 0, i, 0),
                            memory_space=pltpu.VMEM)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, blk=blk, F2=F2, d=d, dout=dout,
                          out_dtype=out_dtype, inner=inner),
        grid=grid,
        in_specs=[
            pspec(F2 + 1), pspec(F2 + 1),      # pEE, pEE1
            pspec(F2), pspec(F2),              # pEO, pEO1
            pspec(F2 + 1), pspec(F2),          # pOE, pOO
            const((9, d, d)), const((F2, d, dout)),
            const((1, d)), const((1, dout)),
        ],
        out_specs=pl.BlockSpec((1, blk, dout), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T2p, dout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(pEE, pEE1, pEO, pEO1, pOE, pOO, w2k, wpk,
      b2.astype(bf).reshape(1, d), bproj.astype(bf).reshape(1, dout))
    return out[:, :T2]


def stem_ref(x, w1, b1, w2, b2, wproj, bproj, out_dtype=jnp.bfloat16):
    """Plain-XLA twin (the current conv2d+conv2d+linear stem at bf16):
    the custom_vjp recompute function and the correctness oracle."""
    from gasr_tpu.ops.conv import conv2d
    from gasr_tpu.ops.linear import linear
    bf = jnp.bfloat16
    h = conv2d({"w": w1, "b": b1}, x[:, :, :, None], (2, 2),
               compute_dtype=bf)
    h = conv2d({"w": w2, "b": b2}, h, (2, 2), compute_dtype=bf)
    B, T2, F2, d = h.shape
    h = h.reshape(B, T2, F2 * d)
    y = linear({"w": wproj, "b": bproj}, h, activation=None,
               compute_dtype=bf)
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _stem_core(interpret, out_dtype, x, w1, b1, w2, b2, wproj, bproj):
    return _fused_stem_fwd(x, w1, b1, w2, b2, wproj, bproj,
                           interpret=interpret, out_dtype=out_dtype)


def _stem_core_fwd(interpret, out_dtype, x, w1, b1, w2, b2, wproj,
                   bproj):
    out = _fused_stem_fwd(x, w1, b1, w2, b2, wproj, bproj,
                          interpret=interpret, out_dtype=out_dtype)
    return out, (x, w1, b1, w2, b2, wproj, bproj)


def _stem_core_bwd(interpret, out_dtype, res, g):
    x, w1, b1, w2, b2, wproj, bproj = res
    _, pull = jax.vjp(
        lambda *a: stem_ref(*a, out_dtype=out_dtype),
        x, w1, b1, w2, b2, wproj, bproj)
    return pull(g)


_stem_core.defvjp(_stem_core_fwd, _stem_core_bwd)


def fused_stem(x, w1, b1, w2, b2, wproj, bproj,
               interpret: bool = False, out_dtype=jnp.bfloat16):
    """Public fused stem; differentiable (recompute backward via
    stem_ref). See module docstring for shapes/eligibility."""
    return _stem_core(interpret, jnp.dtype(out_dtype), x, w1, b1, w2,
                      b2, wproj, bproj)
