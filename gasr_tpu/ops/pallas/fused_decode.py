"""Fused Pallas CTC beam-search frame kernel — the whole decode loop on-chip.

The XLA matched-merge decoder (decoder/beam_search.py::_make_frame_step_fast)
bottoms out at ~2.0 ms/frame on the flagship shape (B=256, W=100, V=47):
bisection shows a fixed ~270 us/step `lax.scan` floor (carry traffic +
fusion boundaries) plus non-fusable top_k / gather / einsum ops. This
kernel runs the ENTIRE per-frame transition — candidate grid, exact
top-W selection, parent-state gathers, beam-state update — inside one
Pallas program with the beam state resident in VMEM scratch across all
T frames (grid = (nB, T), t minor, TPU grid iterations sequential).

Semantics: bit-identical to merge_impl="matched" (algorithm="prefix",
log domain). The proof obligations and how each is met:

  * same candidate VALUES: every score formula is copied expression-for-
    expression from _make_frame_step_fast (same _logaddexp, same masks).
  * same top-W SET including ties: exact k-th-threshold via 32-step bit
    bisection on monotone float bits (ops/pallas/topk.py machinery) with
    quota-based tie admission in candidate-index order — exactly
    lax.top_k's stable tie-break. Grid pads (beam slots >= W, vocab
    lanes >= V) get a key STRICTLY below the XLA DEAD key, so they can
    never displace or reorder a real candidate (there are always
    W*V >= W real entries).
  * same slot ORDER: a 128-lane bitonic sort re-orders the selected
    slots by (score desc, candidate index asc) — lax.top_k's output
    order — so backpointers, dead-slot contents, and downstream
    traceback match the XLA path array-for-array.

Mosaic has no sort/top_k/cumsum/scatter (CLAUDE.md probe notes), so:
  * selection threshold: bit bisection (compare+count), as in topk.py;
  * ranks/offsets: lower-triangular-matmul cumsum (MXU);
  * the winner-index compaction avoids topk.py's dominant one-hot
    chunk loop entirely: with C = N/128 = 128 chunks, the slot->flat-
    index inverse is a two-level lookup — per-chunk offset search
    (compare+count over [Bt,128,128]) followed by ONE same-shape axis-0
    dynamic_gather of chunk rows ([Bt*128, 128], the one gather Mosaic
    lowers) and a one-hot lane select;
  * parent-state gathers: beam state lives in [Bt, 128] lanes, so every
    gather is a same-shape axis-1 dynamic_gather (supported).

Reference behavior twin: CTCBeamSearch.cu decode loop (.cu:519-595)
re-designed as a single resident-state TPU program; see SURVEY.md §2.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gasr_tpu.ops.pallas.topk import (_bitonic_sort_desc, _monotone_bits)

NEG_INF = -1.0e30            # must match beam_search.NEG_INF
DEAD = -3.0e38               # must match beam_search.DEAD_KEY_LOG
PAD = -3.38e38               # strictly below DEAD: grid padding only
M1 = np.int32(1000003)       # hash multipliers (bit-equal to uint32 ops)
M2 = np.int32(16777619)

S = 128                      # beam slot lanes (W <= S)
VP = 128                     # padded vocab lanes (V <= VP)
N = S * VP                   # flattened candidate grid
C = N // 128                 # 128-lane chunks (== S, load-bearing: the
                             # axis-0 row gather needs Bt*C == Bt*S)

# packed beam-state field indices (all int32; floats bitcast)
F_H1, F_H2, F_HP1, F_HP2, F_LAST, F_LEN, F_LIVE, F_S1, F_S2 = range(9)
NF = 9

COARSE_BITS = 24             # hybrid bisection split (swept on TPU:
                             # 16->142ms, 20->139, 24->134, 28->136 at
                             # the flagship shape)


class _TPInputs(NamedTuple):
    """Vocab-sharded (tensor-parallel) frame inputs: this shard owns
    global vocab ids [lo, hi) mapped to local lanes [0, hi-lo). The
    full-vocab values the stay computation needs (f[:, last], f[:,
    blank]) are precomputed OUTSIDE the kernel — the kernel's f operand
    is just the shard's 128-lane slice, which is what makes the fused
    frame V-independent (any vocab size, each shard sees <= 128 lanes;
    cf. parallel/decode_tp.py)."""
    lo: jax.Array        # [] int32 (SMEM scalar)
    hi: jax.Array        # [] int32 (SMEM scalar)
    f_last: jax.Array    # [Bt, S] f32: f[b, last_clip[b, w]] (full vocab)
    f_blank: jax.Array   # [Bt, S] f32: f[b, blank_id] broadcast


class FusedDecodeOut(NamedTuple):
    ys: jax.Array       # [T, B, W] packed backpointers (beam_search._pack_ys)
    h1: jax.Array       # [B, W] uint32
    h2: jax.Array
    hp1: jax.Array
    hp2: jax.Array
    last: jax.Array     # [B, W] int32
    length: jax.Array   # [B, W] int32
    live: jax.Array     # [B, W] bool
    s1: jax.Array       # [B, W] f32
    s2: jax.Array


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _logaddexp(a, b):
    # expression-identical to beam_search._logaddexp (bit parity)
    m = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    return m + jnp.log1p(jnp.exp(jnp.maximum(lo - m, -80.0)) *
                         (lo - m > -80.0))


def _f2i(x):
    return lax.bitcast_convert_type(x, jnp.int32)


def _i2f(x):
    return lax.bitcast_convert_type(x, jnp.float32)


def _take1(x, idx):
    """Same-shape axis-1 dynamic_gather: out[b, k] = x[b, idx[b, k]]."""
    return jnp.take_along_axis(x, idx, axis=1)


def _bitonic_sort_asc_keys(keys, payload):
    """Bitonic sort of the last dim (= 128 lanes) ASCENDING by the
    lexicographic tuple `keys` (list of int32 [Bt, S] arrays; signed
    compares — callers XOR the sign bit for unsigned order), carrying
    `payload` (list of int32 arrays). Returns (keys, payload) sorted.
    Mosaic-safe: same-shape take_along_axis partner exchange + boolean
    algebra (no where-on-bools)."""
    arrs = list(keys) + list(payload)
    nk = len(keys)
    lanes = lax.broadcasted_iota(jnp.int32, arrs[0].shape, 1)
    log_n = int(np.log2(S))
    for kk in range(1, log_n + 1):
        asc = ((lanes >> kk) & 1) == 0
        for j in range(kk - 1, -1, -1):
            d = 1 << j
            partner = lanes ^ d
            p = [_take1(a, partner) for a in arrs]
            is_lower = (lanes & d) == 0
            gt = jnp.zeros(arrs[0].shape, jnp.bool_)
            eq = jnp.ones(arrs[0].shape, jnp.bool_)
            for i in range(nk):
                gt = gt | (eq & (arrs[i] > p[i]))
                eq = eq & (arrs[i] == p[i])
            # ascending block: lower lane keeps the smaller element
            keep = (gt ^ is_lower) == asc
            arrs = [jnp.where(keep, a, pa) for a, pa in zip(arrs, p)]
    return arrs[:nk], arrs[nk:]


def _lower_bound_live(slf, s1, s2, t1, t2):
    """Per-lane branchless lower bound over ASCENDING-sorted rows of
    the composite key (slf, s1, s2): for each (b, k), the first index
    with key >= (0, t1[b,k], t2[b,k]). slf = 1 marks dead entries
    (sorted last; never < a live target on the first key). Steps sum
    to S-1, so pos stays in [0, S-1]; when every element is below the
    target the caller's equality check rejects position S-1."""
    pos = jnp.zeros(t1.shape, jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        probe = pos + (step - 1)
        alf = _take1(slf, probe)
        a1 = _take1(s1, probe)
        a2 = _take1(s2, probe)
        lt = (alf == 0) & ((a1 < t1) | ((a1 == t1) & (a2 < t2)))
        pos = pos + step * lt.astype(jnp.int32)
    return pos


def _frame_math(f, fields, *, W: int, V: int, blank_id: int, Wg: int,
                P: int = 1, VPX: int = VP, debug_stage: int = 99,
                sel_mode: str = "auto", match_impl: str = "grid",
                lm=None, tp=None):
    """One beam-search frame transition on in-register field values.

    fields: tuple of NF [Bt, S] int32 arrays (float fields bitcast).
    Returns (ys_row, new_fields, sidx_row); new_fields is None when a
    debug_stage truncation fired (ys_row then carries the stage
    placeholder). sidx_row is the selected slots' LOCAL lex index
    (w << lexshift | v) — the TP merge decodes winners from it.

    tp: optional _TPInputs for the vocab-sharded frame — lane l then
    represents GLOBAL vocab id lo + (l % Vpk) when < hi (sentinel 2^30
    otherwise), only owned lanes produce candidates, and every identity
    update (hashes, last, ys char) uses the GLOBAL id, so the local
    top-W are exactly the shard's rows of the single-chip candidate
    grid under the same (score desc, lex idx asc) order.

    Wg: trimmed grid-row count (round_up(W, 8) <= 128) — beam slots
    live in S=128 lanes, but candidate-grid ROW axes only need W
    entries, so all [*, S, *] work shrinks to [*, Wg, *].

    P: beam rows PACKED per 128-lane grid row (1, 2, or 4; requires
    V <= 128/P). The kernel is VPU-roofline-bound and at the flagship
    V=47 the vocab occupies only 47 of 128 lanes — P=2 halves every
    flat-phase pass (bisection, ranks, grid construction, compaction)
    by folding beam row r+Rg into the upper 64 lanes of row r:
    lane l -> (w = r + Rg*(l // Vpk), v = l % Vpk), Vpk = 128 / P.
    Flat sizes: Rg = Wg/P grid rows, Ng = Rg*128, Cg = Rg chunks.
    VPX: padded vocab lane width (128 for V <= 128; 256 — two lane
    tiles — for 128 < V <= 256, the conformer vocab case). VPX == 256
    requires P == 1 and Wg <= 64 (so chunk count Cg = Wg*VPX/128 fits
    the 128-lane chunk arrays); vocab-indexed f gathers then split
    into two 128-aligned lane tiles selected by v >= 128 (take_f).

    Exactness notes: grid pads still rank strictly below real
    candidates; the exact-tie path ranks equals in LEX (w, v) order,
    which in packed layout is h-major (see _sel_exact); the bitonic
    payload carries the lex index w*LEXS+v so slot order (and hence
    backpointers and dead-slot contents) matches lax.top_k exactly.
    """
    assert VP % P == 0 and Wg % P == 0
    assert VPX in (VP, 2 * VP)
    assert VPX == VP or P == 1
    Vpk = VP // P
    Rg = Wg // P
    assert Rg % 8 == 0, "sublane slices need 8-aligned Rg"
    Ng = Rg * VPX
    Cg = Ng // 128
    assert Cg <= S
    lexshift = int(np.log2(VPX)) if P == 1 else 7

    if VPX == VP:
        def take_f(f, idx):
            return _take1(f, idx)
    else:
        f_lo = f[:, :VP]            # 128-aligned lane-tile slices
        f_hi = f[:, VP:VPX]

        def take_f(_f, idx):
            lo = _take1(f_lo, idx & (VP - 1))
            hi = _take1(f_hi, idx & (VP - 1))
            return jnp.where(idx >= VP, hi, lo)

    def rows(x2):
        """[Bt, S] lane-array -> [Bt, Wg, 1] grid-row column (full
        unpacked row axis — used by the match/exclusion stages)."""
        return jnp.expand_dims(x2, 2)[:, :Wg]

    def rows_h(x2, h):
        """[Bt, S] -> [Bt, Rg, 1] column of beam rows h*Rg..(h+1)*Rg."""
        return jnp.expand_dims(x2, 2)[:, h * Rg:(h + 1) * Rg]

    def selh(x2):
        """Per-beam value broadcast into the packed grid: out[b, r, l]
        = x2[b, r + Rg*(l // Vpk)]. For P == 1 this is the plain rows()
        column (implicit broadcast, no select)."""
        out = rows_h(x2, 0)
        for h in range(1, P):
            out = jnp.where(l3 >= h * Vpk, rows_h(x2, h), out)
        return out

    # debug_stage: bring-up bisection knob — truncate the frame body
    # after stage N and emit a placeholder so nothing is DCE'd.
    def _emit(val_i32):
        return val_i32, None, None

    Bt = f.shape[0]

    (h1_i, h2_i, hp1_i, hp2_i, last_i32, len_i32, live_i32,
     s1_i, s2_i) = fields
    h1 = h1_i
    h2 = h2_i
    hp1 = hp1_i
    hp2 = hp2_i
    last = last_i32
    length = len_i32
    liveb = live_i32 > 0
    pb = _i2f(s1_i)
    pnb = _i2f(s2_i)

    lane = lax.broadcasted_iota(jnp.int32, (Bt, S), 1)

    total = _logaddexp(pb, pnb)
    last_clip = jnp.clip(last, 0, V - 1)
    f_last = tp.f_last if tp is not None else take_f(f, last_clip)
    if debug_stage <= -3:
        return _emit(_f2i(total + f_last))

    # ---- parent match eq[b, w, w']: candidate parent w extends into the
    # prefix held by stay slot w' (hash + length-offset identity).
    # NOTE: 3D boolean & with broadcast i1 operands crashes the Mosaic
    # compiler (probed) — the equality tests are combined as
    # OR-of-differences (zero iff all equal; int32 wraparound preserves
    # equality exactly), and the parent's live bit + first-true argmax
    # are folded into ONE masked max-reduce of (Wg - w)·live.
    # The length off-by-one test is FOLDED into the h2 lane as
    # k2 = 31*h2 + length (cheap [Bt, S] precompute): equality of
    # (h1, k2) is the same identity up to hash collisions, which the
    # matched merge already accepts on (h1, h2) — and
    # _make_frame_step_fast computes the identical folded predicate,
    # so kernel and XLA path stay bit-equal. Saves 2 of the 8 [Bt, Wg,
    # S] grid passes the three-way compare needed.
    # The stay slot's OWN live bit is folded into has_match after the
    # reduce (one [Bt, S] op instead of a [Bt, Wg, S] grid multiply);
    # a dead stay may then produce spurious eqi hits, but has_match
    # masks every downstream read of `match`.
    live_i = live_i32
    k2 = h2 * 31 + length                           # int32 == uint32 bits
    kp2 = hp2 * 31 + (length - 1)
    if match_impl == "auto":
        # measured crossover (v5e, scripts/tpu_r3_match_probe.py): the
        # sorted join's fixed ~520 [Bt, 128] ops beat the grid's ~6
        # [Bt, Wg, 128] passes once Wg is near full: flagship Wg=112
        # grid 74.8 -> sorted 67.1 ms/scan; small-W presets keep grid
        match_impl = "sorted" if Wg >= 88 else "grid"
    if match_impl == "sorted":
        # ---- sorted-hash join (r3 experiment): instead of the
        # O(Wg*S) compare grid, bitonic-sort the slots' own identities
        # (live-first, (h1, k2) unsigned-ascending, index-ascending)
        # once per frame, then each slot binary-searches its parent
        # identity (hp1, kp2) in 7 branchless gather steps. The
        # lower bound of (0, t1, t2) inside an idx-ascending equal-key
        # run IS the first live match — the grid path's masked
        # (Wg - i)·live argmax — so the two impls are bit-equal
        # (tests/test_pallas_decode.py::test_match_impl_sorted).
        sgn = np.int32(-(2 ** 31))
        skeys, _ = _bitonic_sort_asc_keys(
            [1 - live_i, h1 ^ sgn, k2 ^ sgn, lane], [])
        slf, s1k, s2k, sidx0 = skeys
        t1 = hp1 ^ sgn
        t2 = kp2 ^ sgn
        pos = _lower_bound_live(slf, s1k, s2k, t1, t2)
        g_lf = _take1(slf, pos)
        g1 = _take1(s1k, pos)
        g2 = _take1(s2k, pos)
        g_idx = _take1(sidx0, pos)
        has_match = ((g_lf == 0) & (g1 == t1) & (g2 == t2)
                     & (live_i > 0))
        match = jnp.where(has_match, g_idx, 0)
    else:
        d1 = rows(h1) - jnp.expand_dims(hp1, 1)
        d2 = rows(k2) - jnp.expand_dims(kp2, 1)
        eqb = (d1 | d2) == 0                        # [Bt, Wg, S] i1
        # rev-rank of holder i, zeroed for dead holders: [Bt, Wg, 1]
        wrev1 = rows((Wg - lane) * live_i)
        m = jnp.max(jnp.where(eqb, wrev1, 0), axis=1)   # [Bt, S]
        has_match = (m * live_i) > 0                    # [Bt, S]
        match = jnp.where(has_match, Wg - m, 0)

    pb_m = _take1(pb, match)
    pnb_m = _take1(pnb, match)
    last_m = _take1(last, match)
    if debug_stage <= -2:
        return _emit(match + last_m + _f2i(pb_m + pnb_m))

    # ---- stay candidates (blank column of the grid)
    if tp is not None:
        f_blank = tp.f_blank                        # [Bt, S] broadcast
    else:
        vlane = lax.broadcasted_iota(jnp.int32, (Bt, VPX), 1)
        f_blank = jnp.sum(jnp.where(vlane == blank_id, f, 0.0), axis=1,
                          keepdims=True)            # [Bt, 1]
    stay_pb = total + f_blank
    stay_pnb = jnp.where(length > 0, pnb + f_last, NEG_INF)
    ext_base_m = jnp.where(last_m == last, pb_m, _logaddexp(pb_m, pnb_m))
    ext_contrib = jnp.where(has_match, ext_base_m + f_last, NEG_INF)
    stay_pnb = _logaddexp(stay_pnb, ext_contrib)
    stay_score = jnp.where(liveb, _logaddexp(stay_pb, stay_pnb), DEAD)
    if debug_stage <= -1:
        return _emit(_f2i(stay_score))

    # ---- extend grid [Bt, Rg, VPX] (P beam rows per 128-lane grid row)
    l3 = lax.broadcasted_iota(jnp.int32, (Bt, Rg, VPX), 2)
    r3 = lax.broadcasted_iota(jnp.int32, (Bt, Rg, VPX), 1)
    if P == 1:
        v3, w3 = l3, r3
        f_pk = f
    else:
        v3 = l3 & (Vpk - 1)
        w3 = r3 + Rg * (l3 >> int(np.log2(Vpk)))
        # vocab lane fold: f value at lane l is f[l % Vpk] (same-shape
        # axis-1 dynamic_gather — supported; a one-hot MXU matmul would
        # round the f32 scores to bf16)
        f_pk = _take1(f, lane & (Vpk - 1))
    if tp is not None:
        # global vocab id per lane; unowned lanes -> 2^30 sentinel (>= V,
        # != blank, never equal to a real `last`), so they fall out of
        # in_grid below exactly like single-chip vocab pads.
        vg3 = jnp.where(tp.lo + v3 < tp.hi, tp.lo + v3,
                        jnp.int32(1 << 30))
    else:
        vg3 = v3
    is_rep = vg3 == selh(last)
    ext_pnb3 = jnp.where(is_rep, selh(pb),
                         selh(total)) + jnp.expand_dims(f_pk, 1)
    if lm is not None:
        # shallow-fusion LM bias: + lm[last_w + 1, v] on every extend.
        # lm holds P tables [VP, VPX]: table h carries the bias values
        # in lane half h (zeros elsewhere), so a per-half one-hot row
        # lookup on the MXU lands the packed-layout contribution
        # directly; summing halves adds exact +0.0 outside each half.
        # Table values are bf16-quantized AND -0.0-sanitized by the
        # caller — the MXU one-hot matmul reads bf16, and the XLA
        # matched path applies the identically-quantized table, so the
        # two paths stay bit-equal (see beam_search.ctc_beam_search).
        lmi = last + 1                                  # [Bt, S] in [0, V]
        contrib = None
        if P > 1:
            # pack halves: table h carries half-h's lane shift
            for h in range(P):
                a_h = (lax.broadcasted_iota(jnp.int32, (Bt, Rg, VP), 2)
                       == rows_h(lmi, h)).astype(jnp.float32)
                c_h = lax.dot_general(a_h, lm[h], (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                contrib = c_h if contrib is None else contrib + c_h
        else:
            # row halves (vocab-tiled V + 1 > VP): table r holds rows
            # [r*VP, (r+1)*VP); a row index outside its half one-hots
            # to all-zero, so summing halves is exact (r4: previously
            # V >= 128 + LM silently fell back to the 2x-slower XLA
            # matched path)
            for r in range(len(lm)):
                a_r = (lax.broadcasted_iota(jnp.int32, (Bt, Rg, VP), 2)
                       == (rows_h(lmi, 0) - np.int32(r * VP))
                       ).astype(jnp.float32)
                c_r = lax.dot_general(a_r, lm[r], (((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                contrib = c_r if contrib is None else contrib + c_r
        ext_pnb3 = ext_pnb3 + contrib

    # absorbed-extend exclusion: excl[b,w,v] = exists k with match_k == w,
    # last_k == v. Each stay slot k targets ONE packed grid cell
    # (row r* = match_k - Rg*h*, lane l* = h**Vpk + last_k, where
    # h* = match_k // Rg via compares — Rg is not a power of two); a
    # two-level one-hot contraction over k on the MXU (0/1 values,
    # exact) lands the exclusion mask directly in packed layout. An
    # invalid slot (no match) gets r* = -1, which equals no row.
    h_star = jnp.zeros_like(match)
    for h in range(1, P):
        h_star = h_star + (match >= h * Rg).astype(jnp.int32)
    r_star = jnp.where(has_match, match - h_star * Rg, -1)    # [Bt, S]
    if tp is not None:
        # the absorbed extend's cell exists on the shard owning vocab
        # lane last_k: map to the LOCAL lane, out-of-range on others
        lane_owned = (last_clip >= tp.lo) & (last_clip < tp.hi)
        last_lane = jnp.where(lane_owned, last_clip - tp.lo,
                              jnp.int32(-(VPX + 7)))
    else:
        lane_owned = None
        last_lane = last_clip
    l_star = h_star * Vpk + last_lane                         # [Bt, S]
    a_row = (lax.broadcasted_iota(jnp.int32, (Bt, Rg, S), 1) ==
             jnp.expand_dims(r_star, 1)).astype(jnp.float32)
    a_lane = (lax.broadcasted_iota(jnp.int32, (Bt, S, VPX), 2) ==
              jnp.expand_dims(l_star, 2)).astype(jnp.float32)
    excl_f = lax.dot_general(a_row, a_lane, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    excl_i = (excl_f > 0.5).astype(jnp.int32)      # [Bt, Rg, VPX]
    if debug_stage <= 0:
        return _emit(jnp.pad(jnp.sum(excl_i, axis=2) +
                             _f2i(jnp.sum(ext_pnb3, axis=2)),
                             ((0, 0), (0, S - Rg))))

    valid_ext = ((vg3 != blank_id).astype(jnp.int32) *
                 selh(live_i) * (1 - excl_i))
    cand3 = jnp.where(valid_ext > 0, ext_pnb3, DEAD)
    cand3 = jnp.where(vg3 == blank_id, selh(stay_score), cand3)
    # grid pads (and, under tp, unowned lanes) rank strictly below
    # every XLA candidate
    in_grid = (vg3 < V).astype(jnp.int32) * (w3 < W).astype(jnp.int32)
    cand3 = jnp.where(in_grid > 0, cand3, PAD)
    # chunked canonical layout [Bt, Cg, 128]: identity when VPX == 128
    # (Cg == Rg); a one-time lane-tile split for VPX == 256. All
    # selection work stays 3D — the former [Bt, Ng] flat round-trips
    # were pure relayouts (measured ~2 ms/200 frames at flagship).
    c3 = cand3.reshape(Bt, Cg, 128)
    if debug_stage <= 1:
        return _emit(jnp.pad(_f2i(jnp.sum(cand3, axis=2)),
                             ((0, 0), (0, S - Rg))))

    # ---- per-chunk cumsums (Cg chunks of 128 lanes) via LT matmuls.
    # chunk-indexed lane arrays (cnt/off) are zero-padded to S=128 lanes
    # so the slot-side same-shape gathers/compares keep 128 lanes.
    lt = (lax.broadcasted_iota(jnp.int32, (128, 128), 0) <=
          lax.broadcasted_iota(jnp.int32, (128, 128), 1)
          ).astype(jnp.float32)
    slt = (lax.broadcasted_iota(jnp.int32, (S, S), 0) <
           lax.broadcasted_iota(jnp.int32, (S, S), 1)).astype(jnp.float32)

    def two_level_rank(m3):
        """Exclusive rank (flat candidate order) + per-chunk bits of a
        [Bt, Cg, 128] 0/1 mask. cnt/off returned at S lanes (pad chunks
        count 0)."""
        within = lax.dot_general(m3, lt, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        within_p = within
        if Cg < S:
            # pad BEFORE the column slice: concatenating a sliced
            # 1-lane column trips a Mosaic concat offset limitation
            within_p = jnp.pad(within, ((0, 0), (0, S - Cg), (0, 0)))
        cnt_c = within_p[:, :, 127:128][:, :, 0]        # [Bt, S]
        off_c = lax.dot_general(cnt_c, slt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rank3 = within - m3 + jnp.expand_dims(off_c, 2)[:, :Cg]
        return rank3, within - m3, cnt_c, off_c

    # ---- top-W selection: hybrid coarse/exact bit bisection.
    # 16 coarse steps confine the threshold to the top 16 key bits. If
    # every row then has <= S candidates above it (the common case),
    # select them ALL ("slack" selection): the full-key bitonic below
    # orders them exactly and slots >= W are killed after the sort, so
    # the result is still bit-equal to lax.top_k — while skipping 16
    # bisection passes AND the eq-rank cumsum. Heavy-tie frames (DEAD-
    # dominated early frames, degenerate inputs) take 16 more steps +
    # the index-order tie quota (lax.top_k's stable tie-break).
    u3 = _monotone_bits(c3)

    def count_ge(t):                                # t [Bt, 1] -> [Bt, 1]
        ge = (u3 >= jnp.expand_dims(t, 2)).astype(jnp.int32)
        return jnp.sum(jnp.sum(ge, axis=1), axis=1, keepdims=True)

    if sel_mode == "flag":
        # ---- DEAD de-tie: the dominant tie mass is the constant DEAD
        # key (invalid/dead cells — ALL of them tie). Subtracting each
        # dead cell's lex rank (w*Vpk + v < 2^14, strictly lex-ordered;
        # u(DEAD) - u(PAD) is ~9.5e5 ulps so no collision with PAD)
        # makes dead keys distinct AND descending in exactly lax.top_k's
        # tie order, so a slack selection over de-tied keys IS the exact
        # top-W whenever < S REAL candidates share the threshold window.
        lj3 = lax.broadcasted_iota(jnp.int32, (Bt, Cg, 128), 2)
        cj3 = lax.broadcasted_iota(jnp.int32, (Bt, Cg, 128), 1)
        if P == 1:
            lex_s = cj3 * 128 + lj3
        else:
            wj = cj3 + Rg * (lj3 >> int(np.log2(Vpk)))
            lex_s = wj * Vpk + (lj3 & (Vpk - 1))
        u3 = jnp.where(c3 == DEAD, u3 - lex_s.astype(jnp.uint32), u3)
        # bisection depth so a threshold window of g = 2^(32-bits) keys
        # can never overflow the S slots on de-tied keys: W-1+g <= S
        n_bits = 32 - int(np.floor(np.log2(S - W + 1))) if W < S else 32
        split = 32 - n_bits
    else:
        split = 32 - COARSE_BITS
    th = jnp.zeros((Bt, 1), jnp.uint32)
    for bit in range(31, split - 1, -1):
        trial = th | (jnp.uint32(1) << bit)
        th = jnp.where(count_ge(trial) >= W, trial, th)
    cnt16 = count_ge(th)
    go_exact = jnp.max(cnt16) > S
    if debug_stage <= 2:
        return _emit(jnp.broadcast_to(cnt16, (Bt, S)))

    def _sel_exact(th):
        for bit in range(split - 1, -1, -1):
            trial = th | (jnp.uint32(1) << bit)
            th = jnp.where(count_ge(trial) >= W, trial, th)
        th3 = jnp.expand_dims(th, 2)
        mask_gt = u3 > th3
        mask_eq = u3 == th3
        count_gt = jnp.sum(jnp.sum(mask_gt.astype(jnp.int32), axis=1),
                           axis=1, keepdims=True)
        quota3 = jnp.expand_dims((W - count_gt).astype(jnp.float32), 2)
        if P == 1:
            eq_rank, _, _, _ = two_level_rank(mask_eq.astype(jnp.float32))
        else:
            # lax.top_k admits threshold ties in LEX (w, v) order. In
            # the packed layout lex order is h-MAJOR (w = r + Rg*h), so
            # rank each lane-half separately (within a half, flat order
            # IS (r, v) lex) and offset by the preceding halves' counts.
            # P > 1 implies VPX == 128, so chunk == grid row and the
            # half id is a pure lane predicate.
            j3 = lax.broadcasted_iota(jnp.int32, (Bt, Cg, 128), 2)
            h_n = (j3 >> int(np.log2(Vpk))) & (P - 1)
            eq_rank = jnp.zeros((Bt, Cg, 128), jnp.float32)
            base = jnp.zeros((Bt, 1, 1), jnp.float32)
            for h in range(P):
                m_h = (mask_eq & (h_n == h)).astype(jnp.float32)
                r_h, _, _, _ = two_level_rank(m_h)
                eq_rank = jnp.where(h_n == h, r_h + base, eq_rank)
                base = base + jnp.sum(jnp.sum(m_h, axis=1), axis=1,
                                      keepdims=True)[:, :, None]
        return (mask_gt | (mask_eq & (eq_rank < quota3))
                ).astype(jnp.float32)

    def _sel_slack(th):
        return (u3 >= jnp.expand_dims(th, 2)).astype(jnp.float32)

    # sel_mode: "auto" branches per frame; "exact" always takes the
    # full-bisection tie-quota path (always correct, slower); "slack"
    # skips it entirely (TIMING PROBE ONLY — wrong on heavy-tie frames
    # where cnt16 > S, e.g. the first frames of a fresh decode);
    # "flag" is BRANCH-FREE slack over DEAD-de-tied keys — exact unless
    # > S REAL same-score candidates straddle the threshold window, in
    # which case the frame's ys rows carry bit 31 (ignored by every ys
    # consumer) and the CALLER re-runs the whole scan with
    # sel_mode="exact" (beam_search._pallas_scan). Removes the per-
    # grid-step lax.cond whose mere existence costs ~2 us of scalar/
    # vector sync (~4.3 ms at the flagship r2 profile).
    flag31 = None
    if sel_mode == "exact":
        sel_f3 = _sel_exact(th)
        ksel = jnp.full_like(cnt16, W)
    elif sel_mode == "slack":
        sel_f3 = _sel_slack(th)
        ksel = cnt16
    elif sel_mode == "flag":
        sel_f3 = _sel_slack(th)
        ksel = cnt16
        flag31 = (cnt16 > S).astype(jnp.int32) << 31        # [Bt, 1]
    else:
        sel_f3 = lax.cond(go_exact, _sel_exact, _sel_slack, th)
        # slots beyond the selected count are garbage (W in exact mode)
        ksel = jnp.where(go_exact, jnp.full_like(cnt16, W), cnt16)
    _, lpos3, cnt_c, off_c = two_level_rank(sel_f3)     # per-chunk local pos
    if debug_stage <= 3:
        return _emit(_f2i(off_c))

    # ---- slot k -> flat candidate index, two-level inverse
    # owning chunk: last c with off_c <= k (empty chunks tie-through).
    # The chunk axis is trimmed to the REAL chunk count Cg (sublane
    # axis, so the trim is real VPU savings — 56 vs 128 at the flagship
    # pack=2 shape): a garbage slot k >= ksel then lands in chunk Cg-1
    # with a local rank past that chunk's count, finds no hit, and its
    # sort key is forced to INT_MIN below anyway.
    k_iota = lane                                       # [Bt, S] slot ids
    cmp = (jnp.expand_dims(off_c, 2)[:, :Cg] <=
           jnp.expand_dims(k_iota.astype(jnp.float32), 1))   # [Bt, Cg, S]
    cos = jnp.sum(cmp.astype(jnp.int32), axis=1) - 1    # [Bt, S]
    off_sel = _take1(off_c, cos)
    lk = k_iota.astype(jnp.float32) - off_sel           # local rank

    # fetch the owning chunk's local-pos row per slot with a one-hot
    # batched matmul on the MXU (axis-0 dynamic_gather at [Bt*C, 128]
    # aborts the Mosaic compiler — probed). Exact: each output element
    # is 1.0 * value + zeros.
    oh_cos = (jnp.expand_dims(cos, 2) ==
              lax.broadcasted_iota(jnp.int32, (Bt, S, Cg), 2)
              ).astype(jnp.float32)                 # [Bt, S(k), Cg(c)]
    # mask unselected lanes arithmetically (avoids reshaping an i1 mask)
    lpos_m = lpos3 + (1.0 - sel_f3) * jnp.float32(1e6)

    def chunk_rows(rows3):
        return lax.dot_general(oh_cos, rows3, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)

    z = chunk_rows(lpos_m)                          # [Bt, S, 128]
    hit = z == jnp.expand_dims(lk, 2)
    lane3 = lax.broadcasted_iota(jnp.int32, (Bt, S, 128), 2)
    idx_lane = jnp.sum(jnp.where(hit, lane3, 0), axis=2)    # [Bt, S]
    idx_n = cos * 128 + idx_lane                            # [Bt, S]

    # selected score: RECOMPUTED exactly on the VPU from gathered state
    # (the grid values are ints-free f32; fetching them through a one-hot
    # MXU matmul rounds them to bf16 under Mosaic's default precision,
    # which scrambles near-tie sort order — observed on hardware). The
    # recomputation uses the same expressions as the grid, so it is
    # bit-equal.
    if P == 1:
        w_sel0 = idx_n >> lexshift
        v_sel0 = idx_n & (VPX - 1)
    else:
        # packed flat index: n = r*128 + h*Vpk + v -> w = r + Rg*h.
        # Garbage slots (k >= ksel) can decode past Wg; clamp to keep
        # every same-shape gather in lane range (their sort key is
        # forced to INT_MIN below, so the values never matter).
        w_sel0 = jnp.minimum(
            (idx_n >> 7) + Rg * ((idx_n >> int(np.log2(Vpk))) & (P - 1)),
            S - 1)
        v_sel0 = idx_n & (Vpk - 1)
    live_sel = _take1(live_i, w_sel0)
    # absorbed-exclusion of the selected cells via PAIR CODES: slot k
    # excludes lex cell match_k*LEXS + last_k (injective, v < LEXS);
    # one [Bt, S, S] compare + max replaces the three-compare/two-
    # multiply exk grid of the same shape.
    idx_lex = idx_n if P == 1 else ((w_sel0 << lexshift) | v_sel0)
    if tp is not None:
        p_code = jnp.where(has_match & lane_owned,
                           (match << lexshift) | (last_clip - tp.lo), -1)
        vg_sel0 = jnp.where(tp.lo + v_sel0 < tp.hi, tp.lo + v_sel0,
                            jnp.int32(1 << 30))
    else:
        p_code = jnp.where(has_match, (match << lexshift) | last_clip, -1)
        vg_sel0 = v_sel0
    # stay axis on sublanes, trimmed to Wg (stay slots >= W are dead,
    # p_code == -1): [Bt, Wg, S] instead of [Bt, S, S]
    excl_sel = jnp.max(
        (jnp.expand_dims(p_code, 2)[:, :Wg] == jnp.expand_dims(idx_lex, 1)
         ).astype(jnp.int32), axis=1)                       # [Bt, S]
    pb_s = _take1(pb, w_sel0)
    pnb_s = _take1(pnb, w_sel0)
    last_s = _take1(last, w_sel0)
    total_s = _logaddexp(pb_s, pnb_s)
    f_vs = take_f(f, v_sel0)
    extv = jnp.where(vg_sel0 == last_s, pb_s, total_s) + f_vs
    if lm is not None:
        # same bias value for the selected cells: row lookup via
        # one-hot matmul on table 0 (unshifted: lane == v, and
        # v_sel0 < Vpk == table-0's value lanes) — or on every
        # row-half table when P == 1 and the vocab-tiled table splits
        # rows (out-of-half indices one-hot to zero, sum is exact);
        # lane pick via one-hot multiply+sum (batched dot_general with
        # 2D lhs trips an MLIR bug — CLAUDE.md).
        rows_v = None
        for r, tbl_r in enumerate(lm if P == 1 else lm[:1]):
            b1 = (lax.broadcasted_iota(jnp.int32, (Bt, S, VP), 2) ==
                  jnp.expand_dims(last_s + 1 - np.int32(r * VP), 2)
                  ).astype(jnp.float32)
            rv = lax.dot_general(b1, tbl_r, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            rows_v = rv if rows_v is None else rows_v + rv
        ohv = (lax.broadcasted_iota(jnp.int32, (Bt, S, VPX), 2) ==
               jnp.expand_dims(v_sel0, 2)).astype(jnp.float32)
        extv = extv + jnp.sum(rows_v * ohv, axis=2)
    validv = ((vg_sel0 != blank_id).astype(jnp.int32) * live_sel
              * (1 - excl_sel))
    top_val = jnp.where(validv > 0, extv, DEAD)
    top_val = jnp.where(vg_sel0 == blank_id,
                        _take1(stay_score, w_sel0), top_val)
    # pad slots (k >= W) carry garbage idx_n; their key is forced below
    if debug_stage <= 4:
        return _emit(idx_n + _f2i(top_val))

    # ---- order slots like lax.top_k: desc score, asc candidate index.
    # The tie-break payload is the LEX index w*LEXS+v (order-isomorphic
    # to lax.top_k's w*V+v); for P == 1 that IS the flat grid index.
    key = _f2i(_monotone_bits(top_val) ^ jnp.uint32(0x80000000))
    key = jnp.where(k_iota < ksel, key, jnp.int32(-2147483647 - 1))
    key_s, sidx = _bitonic_sort_desc(key, idx_lex)
    if debug_stage <= 5:
        return _emit(sidx + key_s)
    w_sel = sidx >> lexshift
    v_sel = sidx & ((1 << lexshift) - 1)
    if tp is not None:
        # identity updates use the GLOBAL vocab id. Slots < W always
        # decode an owned lane (>= W real candidates exist on every
        # shard: the dispatcher guarantees hi > lo), and slots >= W are
        # dead (new_live masks them), so the sentinel never leaks into
        # a live identity.
        v_sel = jnp.where(tp.lo + v_sel < tp.hi, tp.lo + v_sel,
                          jnp.int32(1 << 14))

    # ---- state update (mirrors _make_frame_step_fast post-top_k block)
    last_g = _take1(last, w_sel)
    len_g = _take1(length, w_sel)
    h1_g = _take1(h1, w_sel)
    h2_g = _take1(h2, w_sel)
    hp1_g = _take1(hp1, w_sel)
    hp2_g = _take1(hp2, w_sel)
    stay_pb_g = _take1(stay_pb, w_sel)
    stay_pnb_g = _take1(stay_pnb, w_sel)
    # sorted top_val recovered from the sorted key (sort carries only
    # (key, idx); the key IS the monotone-bit image of the score)
    u_sorted = lax.bitcast_convert_type(key_s, jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    top = lax.bitcast_convert_type(
        jnp.where(u_sorted >= jnp.uint32(0x80000000),
                  u_sorted & jnp.uint32(0x7FFFFFFF), ~u_sorted),
        jnp.float32)
    # the W <= k < ksel slack extras must die here (exactness: slots
    # 0..W-1 after the sort ARE lax.top_k's output; the rest is pad)
    new_live = (top > DEAD * 0.5) & (k_iota < W)

    is_stay = v_sel == blank_id
    # an extend slot's ns2 IS its candidate score: the XLA path gathers
    # ext_pnb at the selected index, which equals top_vals bit-for-bit
    # (same grid array), and `top` here is the exact bit roundtrip of
    # the recomputed score — so no second rescore (incl. the LM term)
    # is needed.
    ns1 = jnp.where(new_live & is_stay, stay_pb_g, NEG_INF)
    ns2 = jnp.where(new_live,
                    jnp.where(is_stay, stay_pnb_g, top),
                    NEG_INF)
    vp1 = v_sel + 1
    nh1 = jnp.where(is_stay, h1_g, h1_g * M1 + vp1)
    nh2 = jnp.where(is_stay, h2_g, h2_g * M2 + vp1)
    nhp1 = jnp.where(is_stay, hp1_g, h1_g)
    nhp2 = jnp.where(is_stay, hp2_g, h2_g)
    n_last = jnp.where(is_stay, last_g, v_sel)
    n_len = len_g + jnp.where(is_stay, 0, 1)

    appended = (~is_stay) & new_live
    ys_row = (w_sel | (jnp.maximum(n_last, 0) << 15)
              | (appended.astype(jnp.int32) << 30))
    if flag31 is not None:
        # tie-overflow flag rides the otherwise-unused ys sign bit
        ys_row = ys_row | flag31
    new_fields = (nh1, nh2, nhp1, nhp2, n_last, n_len,
                  new_live.astype(jnp.int32), _f2i(ns1), _f2i(ns2))
    return ys_row, new_fields, sidx


def _kernel(f_ref, init_ref, *rest, W: int, V: int,
            blank_id: int, Wg: int, P: int, VPX: int, TBLK: int,
            T_real: int, debug_stage: int = 99, sel_mode: str = "auto",
            match_impl: str = "grid", has_lm: bool = False):
    if has_lm:
        lm_ref, ys_ref, fin_ref, st = rest
        # table count: pack halves (P > 1, lane-shifted copies) OR
        # row-halves (P == 1 with V + 1 > VP rows — the vocab-tiled
        # V <= 2*VP - 1 case); _frame_math keys on P to tell them apart
        lm = tuple(lm_ref[h] for h in range(lm_ref.shape[0]))
    else:
        ys_ref, fin_ref, st = rest
        lm = None
    # TBLK frames per grid step: the frame body is unrolled in-kernel so
    # the fixed per-grid-step cost (DMA setup + launch) is amortized.
    # Tail frames beyond T_real compute on pad input but their state
    # update is select-masked out, so `fin` is the state after frame
    # T_real-1 exactly.
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        st[...] = init_ref[...]

    fields = tuple(st[i] for i in range(NF))
    for j in range(TBLK):
        ys_row, new_fields, _ = _frame_math(
            f_ref[j], fields, W=W, V=V, blank_id=blank_id, Wg=Wg, P=P,
            VPX=VPX, debug_stage=debug_stage, sel_mode=sel_mode,
            match_impl=match_impl, lm=lm)
        ys_ref[j] = ys_row
        if new_fields is None:      # debug truncation: state untouched
            break
        if T_real % TBLK == 0:      # no tail: every frame is real
            fields = new_fields
        else:
            valid = (t * TBLK + j) < T_real
            fields = tuple(jnp.where(valid, n, o)
                           for n, o in zip(new_fields, fields))
    for i in range(NF):
        st[i] = fields[i]
    fin_ref[...] = st[...]


@functools.partial(jax.jit, static_argnames=(
    "W", "V", "blank_id", "block_b", "interpret", "debug_stage", "pack",
    "tblk", "sel_mode", "match_impl"))
def fused_prefix_decode(log_probs: jax.Array, init_packed: jax.Array,
                        W: int, V: int, blank_id: int = 0,
                        block_b: int = 32,
                        interpret: bool = False,
                        debug_stage: int = 99,
                        pack: int = 0,
                        tblk: int = 1,
                        sel_mode: str = "auto",
                        match_impl: str = "auto",
                        lm_q=None) -> FusedDecodeOut:
    """Run the whole prefix beam-search scan as one Pallas program.

    log_probs: [T, B, V] f32 log-probabilities. Supported shapes:
    V <= 128 with W <= 128, or 128 < V <= 256 with W <= 64 (the
    conformer vocab case — two vocab lane tiles, see _frame_math VPX).
    init_packed: [NF, B, 128] int32 packed initial beam state (see
    pack_state). Returns packed backpointers + final state, array-equal
    to the XLA matched-merge scan.

    pack: beam rows per 128-lane grid row (see _frame_math). 0 = auto
    (2 when V <= 64 — halves the VPU-bound flat phases); 1/2/4 force.

    sel_mode: top-W selection strategy — "auto" (per-frame lax.cond
    between slack and exact-tie paths), "exact" (always-correct full
    bisection + tie quota, branch-free), "flag" (branch-free DEAD-de-
    tied slack; exact unless > S real same-score candidates straddle a
    row's threshold, which raises ys bit 31 for the caller to re-run
    "exact" — see _pallas_scan), "slack" (timing probe only).

    lm_q: optional [V+1, V] shallow-fusion LM bias table, ALREADY
    bf16-quantized and -0.0-sanitized (beam_search quantizes once for
    both paths). V <= 127 rides the pack-half tables; 128 <= V <= 255
    splits the table into row-halves instead (one extra one-hot MXU
    contraction per frame — r4, previously an XLA-matched fallback);
    V = 256 alone is unsupported (257 rows > 2*VP).
    """
    T, B, V_in = log_probs.shape
    assert V_in == V and W <= S and V <= 2 * VP
    assert lm_q is None or V <= 2 * VP - 1
    VPX = VP if V <= VP else 2 * VP
    if pack == 0:
        # auto: pack only when the packed row axis keeps >= 8 sublanes
        pack = 2 if (V <= VP // 2 and W > 8) else 1
    if VPX > VP:
        assert pack == 1, "vocab tiling (V > 128) excludes beam packing"
        assert W <= 64, "V > 128 requires W <= 64 (chunk arrays cap at " \
            "128 lanes: Cg = Wg*VPX/128 <= 128)"
        # grid temporaries double with VPX: halve the batch tile
        # (keeps the footprint near the VPX=128 default's)
        block_b = min(block_b, 8)
    # never pad a small batch up to block_b rows of wasted VPU work —
    # B=16 presets at the default block_b=32 were running 2x the
    # sublane rows on hardware (r5 small-preset audit; previously this
    # clamp was interpret-only)
    block_b = min(block_b, max(8, _round_up(B, 8)))
    # trimmed grid rows, rounded so Rg = Wg/pack stays a multiple of 8
    # (sublane slices at non-8-aligned offsets do not lower in Mosaic)
    Wg = max(8 * pack, _round_up(W, 8 * pack))
    assert pack in (1, 2, 4) and V <= VPX // pack and Wg <= S
    f = log_probs
    if V < VPX:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, VPX - V)))
    b_pad = (-B) % block_b
    if b_pad:
        f = jnp.pad(f, ((0, 0), (0, b_pad), (0, 0)))
        init_packed = jnp.pad(init_packed,
                              ((0, 0), (0, b_pad), (0, 0)))
    Bp = B + b_pad

    # frames per grid step. tblk=1 measured FASTER than 4 on TPU v5e
    # (103 vs 119 ms at flagship: the 4x-unrolled body hurts Mosaic
    # scheduling more than the ~1.6 us/step fixed cost saves); the knob
    # stays for future sweeps. Debug truncation needs one frame/step.
    TBLK = 1 if debug_stage < 99 else min(tblk, T)
    t_pad = (-T) % TBLK
    if t_pad:
        f = jnp.pad(f, ((0, t_pad), (0, 0), (0, 0)))
    Tp = T + t_pad

    grid = (Bp // block_b, Tp // TBLK)
    in_specs = [
        pl.BlockSpec((TBLK, block_b, VPX), lambda b, t: (t, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NF, block_b, S), lambda b, t: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [f, init_packed]
    if lm_q is not None:
        Vpk = VPX // pack
        if V + 1 <= VP:
            # P tables [VP, VPX]: table h holds the bias values in lane
            # half h (see _frame_math); table 0 is the unshifted copy
            # the rescore lookup uses. Constant index_map -> fetched
            # once.
            tbl = jnp.stack([
                jnp.pad(lm_q, ((0, VP - (V + 1)),
                               (h * Vpk, VPX - V - h * Vpk)))
                for h in range(pack)])
        else:
            # row-half tables (V + 1 > VP, pack == 1 by construction):
            # table r holds previous-char rows [r*VP, (r+1)*VP) at
            # unshifted lanes; _frame_math one-hots (idx - r*VP) so
            # out-of-half rows contribute exact zero
            assert pack == 1
            nt = -(-(V + 1) // VP)
            tbl = jnp.stack([
                jnp.pad(lm_q[r * VP:min((r + 1) * VP, V + 1)],
                        ((0, VP - min(VP, V + 1 - r * VP)),
                         (0, VPX - V)))
                for r in range(nt)])
        nt_tbl = tbl.shape[0]
        in_specs.append(pl.BlockSpec((nt_tbl, VP, VPX),
                                     lambda b, t: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(tbl)
    ys, fin = pl.pallas_call(
        functools.partial(_kernel, W=W, V=V, blank_id=blank_id,
                          Wg=Wg, P=pack, VPX=VPX, TBLK=TBLK, T_real=T,
                          debug_stage=debug_stage, sel_mode=sel_mode,
                          match_impl=match_impl,
                          has_lm=lm_q is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((TBLK, block_b, S), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, block_b, S), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Bp, S), jnp.int32),
            jax.ShapeDtypeStruct((NF, Bp, S), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((NF, block_b, S), jnp.int32)],
        # grid temporaries scale ~linearly with the batch tile AND with
        # the vocab tiling (VPX=256 doubles every per-row chunk array);
        # the default 16 MB scoped limit fits block_b=24 at VPX=128
        # (the r2 sweep's OOM at 32 was the LIMIT, not physical VMEM —
        # v5e carries 128 MB), so scale the allowance with the
        # effective tile block_b * VPX/VP (advisor r3: keying on
        # block_b alone left the V>128 path ~9 MB, below the 16 MB it
        # previously compiled under)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 * 2**20,
                                     max(16 * 2**20,
                                         (16 * 2**20)
                                         * (block_b * VPX // VP)
                                         // 24 + 4 * 2**20)))),
        interpret=interpret,
    )(*operands)
    if t_pad:
        ys = ys[:T]

    ys = ys[:, :B, :W]
    fin = fin[:, :B, :W]
    u32 = functools.partial(lax.bitcast_convert_type,
                            new_dtype=jnp.uint32)
    f32 = functools.partial(lax.bitcast_convert_type,
                            new_dtype=jnp.float32)
    return FusedDecodeOut(
        ys=ys,
        h1=u32(fin[F_H1]), h2=u32(fin[F_H2]),
        hp1=u32(fin[F_HP1]), hp2=u32(fin[F_HP2]),
        last=fin[F_LAST], length=fin[F_LEN],
        live=fin[F_LIVE] > 0,
        s1=f32(fin[F_S1]), s2=f32(fin[F_S2]),
    )


def pack_state(beam) -> jax.Array:
    """beam_search._BeamState ([B, W] fields) -> [NF, B, 128] int32."""
    B, W = beam.s1.shape
    i32 = functools.partial(lax.bitcast_convert_type, new_dtype=jnp.int32)
    fields = [None] * NF
    fields[F_H1] = i32(beam.h1)
    fields[F_H2] = i32(beam.h2)
    fields[F_HP1] = i32(beam.hp1)
    fields[F_HP2] = i32(beam.hp2)
    fields[F_LAST] = beam.last
    fields[F_LEN] = beam.length
    fields[F_LIVE] = beam.live.astype(jnp.int32)
    fields[F_S1] = i32(beam.s1)
    fields[F_S2] = i32(beam.s2)
    packed = jnp.stack(fields, axis=0)                  # [NF, B, W]
    if W < S:
        # pad slots: dead, never hash-match (h sentinel / unique, hp 0)
        pad = jnp.zeros((NF, B, S - W), jnp.int32)
        pad = pad.at[F_H1].set(-1)
        pad = pad.at[F_H2].set(
            jnp.arange(W, S, dtype=jnp.int32)[None, :] |
            np.int32(np.int64(0x7F000000)))
        pad = pad.at[F_LAST].set(-1)
        pad = pad.at[F_S1].set(
            lax.bitcast_convert_type(jnp.float32(NEG_INF), jnp.int32))
        pad = pad.at[F_S2].set(
            lax.bitcast_convert_type(jnp.float32(NEG_INF), jnp.int32))
        packed = jnp.concatenate([packed, pad], axis=2)
    return packed


# ----------------------------------------------- TP local frame kernel

def _tp_kernel(lohi_ref, f_ref, flast_ref, fblank_ref, st_ref,
               ys_ref, sidx_ref, fin_ref, *, W: int, V: int,
               blank_id: int, Wg: int, P: int):
    tp = _TPInputs(lo=lohi_ref[0], hi=lohi_ref[1],
                   f_last=flast_ref[...], f_blank=fblank_ref[...])
    fields = tuple(st_ref[i] for i in range(NF))
    ys_row, new_fields, sidx = _frame_math(
        f_ref[...], fields, W=W, V=V, blank_id=blank_id, Wg=Wg, P=P,
        VPX=VP, tp=tp)
    ys_ref[...] = ys_row
    sidx_ref[...] = sidx
    for i in range(NF):
        fin_ref[i] = new_fields[i]


def tp_pack(V: int, n_shards: int, W: int) -> int:
    """Static beam-packing factor for the vocab-sharded frame kernel:
    largest P with Vpk = 128/P >= the widest shard slice (balanced
    slicing: ceil(V/n)) and Wg = round_up(W, 8P) <= 128. Sharding by
    vocab SHRINKS the packed grid (P up to 4 vs 2 single-chip at the
    flagship V=47, n=4), which is the kernel-side win of TP decode."""
    vl_max = -(-V // n_shards)
    for p in (4, 2, 1):
        wg = max(8 * p, _round_up(W, 8 * p))
        if vl_max <= VP // p and wg <= S and (p == 1 or W > 8):
            return p
    return 1


@functools.partial(jax.jit, static_argnames=(
    "W", "V", "blank_id", "pack", "block_b", "interpret"))
def fused_tp_frame(f_loc: jax.Array, f_last: jax.Array,
                   f_blank: jax.Array, state_packed: jax.Array,
                   lo_hi: jax.Array, W: int, V: int, blank_id: int = 0,
                   pack: int = 1, block_b: int = 24,
                   interpret: bool = False):
    """One vocab-sharded beam-search frame transition (local top-W).

    The shard owns global vocab ids [lo_hi[0], lo_hi[1]) — a TRACED
    range (lax.axis_index-derived), passed to the kernel as SMEM
    scalars, so one compiled program serves every shard. Inputs:
    f_loc [B, 128] = f[:, lo:lo+128] (any-V support: the kernel only
    ever sees a 128-lane slice); f_last [B, S] = f[b, last[b, w]];
    f_blank [B, S] = f[b, blank] broadcast; state_packed [NF, B, S].

    Returns (ys [B, S], sidx [B, S], fin [NF, B, S]): slots 0..W-1 hold
    the shard's local top-W candidates in (score desc, lex idx asc)
    order with their ALREADY-UPDATED state fields (global-vocab hashes
    / last / length); parallel/decode_tp.py exchanges the W slots and
    reduces to the global beam. Exactness: the local order equals
    lax.top_k over this shard's rows of the single-chip candidate
    grid, so the union of shard top-Ws contains the global top-W
    (CTCBeamSearch.cu:519-595 re-imagined at pod scale)."""
    B = f_loc.shape[0]
    assert W <= S and f_loc.shape[1] == VP
    Wg = max(8 * pack, _round_up(W, 8 * pack))
    assert pack in (1, 2, 4) and Wg <= S
    if interpret:
        block_b = min(block_b, max(8, _round_up(B, 8)))
    b_pad = (-B) % block_b
    if b_pad:
        pad2 = ((0, b_pad), (0, 0))
        f_loc = jnp.pad(f_loc, pad2)
        f_last = jnp.pad(f_last, pad2)
        f_blank = jnp.pad(f_blank, pad2)
        state_packed = jnp.pad(state_packed, ((0, 0), (0, b_pad), (0, 0)))
    Bp = B + b_pad

    ys, sidx, fin = pl.pallas_call(
        functools.partial(_tp_kernel, W=W, V=V, blank_id=blank_id,
                          Wg=Wg, P=pack),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, VP), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, block_b, S), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, S), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, block_b, S), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, S), jnp.int32),
            jax.ShapeDtypeStruct((Bp, S), jnp.int32),
            jax.ShapeDtypeStruct((NF, Bp, S), jnp.int32),
        ),
        interpret=interpret,
    )(lo_hi.astype(jnp.int32), f_loc, f_last, f_blank, state_packed)
    return ys[:B], sidx[:B], fin[:, :B]


# ------------------------------------- TP whole-scan kernel (RDMA exchange)
#
# The per-frame TP path (fused_tp_frame inside a lax.scan + one XLA
# all_gather per frame) is semantically right but pays ~3.6 ms/frame at
# the flagship shape, of which ~3.1 ms is XLA glue between the kernel
# and the collective (gathers / lax.sort / concats on [B, nW] arrays;
# measured scripts/tpu_r3_breakdown.py: kernel-only scan 452 us/frame
# vs 3.6 ms full). The fix is the same one that took single-chip decode
# from 2.0 ms/frame to 0.36: run the WHOLE T-frame scan as one Pallas
# program per shard (grid (nB, T), beam state resident in VMEM scratch)
# and do the per-frame winner exchange INSIDE the kernel with async
# remote DMAs over ICI — zero per-frame launch cost, zero XLA glue, the
# only cross-chip traffic one (NF+2)-field [Bt, 128] payload broadcast
# per (batch-tile, frame) step. n == 1 meshes statically elide every
# exchange instruction, so the mesh-of-1 hardware instantiation IS the
# single-chip kernel modulo the vocab-window frame math (the timing
# proof this environment can produce; the n > 1 RDMA path is validated
# bit-exactly on a multi-device CPU mesh under Pallas TPU interpret
# mode, which simulates remote DMAs and semaphores).
#
# Cross-shard merge: each shard's local top-W arrives SORTED by
# (score desc, gidx asc) — the bitonic output order, which within a
# shard coincides with global-candidate-index order (both are w-major,
# v-ascending). The global top-W of n sorted lists is computed with a
# fold of (n-1) bitonic TOP-128 MERGES under the composite total order
# (score-bits desc, gidx asc): C[i] = max(A[i], B[127-i]) keeps exactly
# the top-128 multiset and is bitonic, so log2(128) compare-exchange
# stages re-sort it — ~8 cheap [Bt, 128] passes per list instead of an
# O((nW)^2) rank computation. DEAD candidates reconstruct to exactly
# the same f32 on every shard (live=0 -> DEAD), so cross-shard ties
# break on gidx = w*V + v — precisely lax.top_k's single-chip stable
# order, keeping dead-slot contents and backpointers array-equal to
# the single-chip kernel (tests/test_decode_tp.py).
#
# Reference twin: CTCBeamSearch.cu:519-595's decode loop at pod scale —
# the beam state exchanged via collectives at each decode step
# (BASELINE.json config 5), with the collective riding ICI from inside
# the kernel instead of NCCL host calls.

_INT_MIN = np.int32(-2147483647 - 1)
NFX = NF + 2                 # exchanged fields: NF state + ys + gidx


def _cmp_gt(ka, ga, kb, gb):
    """Strict composite order: (key desc, gidx asc) — 'a ranks ahead'."""
    return (ka > kb) | ((ka == kb) & (ga < gb))


def _merge2_top(ka, ga, pa, kb, gb, pb):
    """Top-128 of two desc-sorted 128-lists under (key desc, gidx asc),
    result in the same order; p carries an opaque payload (source id).
    Batcher bitonic merge: max-combine against the reversed second list
    keeps exactly the top-128 multiset and leaves a bitonic sequence,
    which log2(128) compare-exchange stages sort."""
    lanes = lax.broadcasted_iota(jnp.int32, ka.shape, 1)
    rev = (S - 1) - lanes
    kr = _take1(kb, rev)
    gr = _take1(gb, rev)
    pr = _take1(pb, rev)
    agt = _cmp_gt(ka, ga, kr, gr)
    k = jnp.where(agt, ka, kr)
    g = jnp.where(agt, ga, gr)
    p = jnp.where(agt, pa, pr)
    for j in range(int(np.log2(S)) - 1, -1, -1):
        d = 1 << j
        partner = lanes ^ d
        pk = _take1(k, partner)
        pg = _take1(g, partner)
        pp = _take1(p, partner)
        is_lower = (lanes & d) == 0
        gt = _cmp_gt(k, g, pk, pg)
        # boolean algebra, not where-on-bools (select_n on i1 fails in
        # Mosaic): descending merge keeps self iff gt coincides with
        # being the lower partner
        keep = gt == is_lower
        k = jnp.where(keep, k, pk)
        g = jnp.where(keep, g, pg)
        p = jnp.where(keep, p, pp)
    return k, g, p


def _tp_scan_kernel(lohi_ref, f_loc_ref, f_full_ref, init_ref,
                    ys_ref, fin_ref, st, *comm, W: int, V: int,
                    blank_id: int, Wg: int, P: int, VPF: int, n: int,
                    axis: str, mesh_axes, sel_mode: str,
                    match_impl: str):
    """One (batch-tile, frame) grid step of the whole-scan TP decode."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        st[...] = init_ref[...]

    lo = lohi_ref[0]
    hi = lohi_ref[1]
    f_loc = f_loc_ref[0]
    f_full = f_full_ref[0]
    fields = tuple(st[i] for i in range(NF))
    last_clip = jnp.clip(fields[F_LAST], 0, V - 1)
    # full-vocab gathers the stay computation needs, in-kernel (V <= VPF
    # <= 256; the two-lane-tile select mirrors _frame_math's take_f)
    if VPF == VP:
        f_last = _take1(f_full, last_clip)
    else:
        a = _take1(f_full[:, :VP], last_clip & (VP - 1))
        b = _take1(f_full[:, VP:VPF], last_clip & (VP - 1))
        f_last = jnp.where(last_clip >= VP, b, a)
    vlane = lax.broadcasted_iota(jnp.int32, f_full.shape, 1)
    f_blank = jnp.sum(jnp.where(vlane == blank_id, f_full, 0.0), axis=1,
                      keepdims=True)
    tp = _TPInputs(lo=lo, hi=hi, f_last=f_last, f_blank=f_blank)
    ys_row, new_fields, sidx = _frame_math(
        f_loc, fields, W=W, V=V, blank_id=blank_id, Wg=Wg, P=P, VPX=VP,
        sel_mode=sel_mode, match_impl=match_impl, tp=tp)

    if n == 1:
        # degenerate mesh: local top-W IS the global top-W — no
        # exchange instruction exists in the compiled program
        for i in range(NF):
            st[i] = new_fields[i]
        ys_ref[0] = ys_row
        fin_ref[...] = st[...]
        return

    send_buf, recv_buf, send_sem, recv_sem = comm
    lane = lax.broadcasted_iota(jnp.int32, (f_loc.shape[0], S), 1)
    # shard index + flat LOGICAL device id arrive as SMEM scalars
    # (lax.axis_index inside the kernel body would be captured as a
    # trace constant); the model-axis stride is static mesh data
    my_m = lohi_ref[2]
    flat = lohi_ref[3]
    names = [nm for nm, _ in mesh_axes]
    sizes = [sz for _, sz in mesh_axes]
    strides = [int(np.prod(sizes[i + 1:], dtype=np.int64))
               for i in range(len(sizes))]
    stride_m = strides[names.index(axis)]

    # global candidate index (tie-break key): w*V + global v; stays sit
    # at the blank lane on its owner shard, so gidx matches the single-
    # chip flat grid index for every winner kind. Lanes >= W decode
    # garbage — give them unique never-winning ids.
    w_loc = sidx >> 7
    v_loc = sidx & 127
    gidx = w_loc * V + (lo + v_loc)
    gidx = jnp.where(lane < W, gidx, (1 << 28) + my_m * S + lane)

    step = pl.program_id(0) * pl.num_programs(1) + t
    par = lax.rem(step, 2)

    for i in range(NF):
        send_buf[i] = new_fields[i]
    send_buf[NF] = ys_row
    send_buf[NF + 1] = gidx
    for i in range(NFX):
        recv_buf[par, i, my_m] = send_buf[i]

    @pl.when(step == 0)
    def _():
        # start-of-decode barrier: no shard may RDMA into a peer whose
        # kernel has not allocated its buffers yet
        bsem = pltpu.get_barrier_semaphore()
        for off in range(n):
            peer = lax.rem(my_m + off, n)
            pltpu.semaphore_signal(
                bsem, inc=1,
                device_id=flat + (peer - my_m) * stride_m,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(bsem, n)

    def copy_desc(off, peer, dst_slot):
        return pltpu.make_async_remote_copy(
            src_ref=send_buf,
            dst_ref=recv_buf.at[par, :, dst_slot],
            send_sem=send_sem.at[off - 1],
            recv_sem=recv_sem.at[par, dst_slot],
            device_id=flat + (peer - my_m) * stride_m,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    for off in range(1, n):
        peer = lax.rem(my_m + off, n)
        copy_desc(off, peer, my_m).start()
    for off in range(1, n):
        peer = lax.rem(my_m + off, n)
        # wait for peer's payload (its slot = ITS model index); the
        # descriptor only carries shape + the right recv semaphore
        copy_desc(off, peer, peer).wait_recv()

    # ---- merge the n sorted top-W lists (replicated computation:
    # every shard folds the identical recv contents, so the merged
    # state stays replicated without further communication)
    def list_j(j):
        r = [recv_buf[par, i, j] for i in range(NFX)]
        live = r[F_LIVE] > 0
        val = jnp.where(live, _logaddexp(_i2f(r[F_S1]), _i2f(r[F_S2])),
                        DEAD)
        key = _f2i(_monotone_bits(val) ^ jnp.uint32(0x80000000))
        key = jnp.where(lane < W, key, _INT_MIN)
        src = np.int32(j * S) + lane
        return key, r[NF + 1], src

    k, g, p = list_j(0)
    for j in range(1, n):
        k, g, p = _merge2_top(k, g, p, *list_j(j))

    src_j = p >> 7
    src_l = p & (S - 1)
    out_fields = []
    for i in range(NFX):
        acc = jnp.zeros_like(lane)
        for j in range(n):
            got = _take1(recv_buf[par, i, j], src_l)
            acc = jnp.where(src_j == j, got, acc)
        out_fields.append(acc)

    # dead-pad lanes >= W exactly like pack_state's pad block
    neg = int(np.int32(np.frombuffer(
        np.float32(NEG_INF).tobytes(), np.int32)[0]))
    in_w = lane < W
    st[F_H1] = jnp.where(in_w, out_fields[F_H1], -1)
    st[F_H2] = jnp.where(in_w, out_fields[F_H2],
                         lane | np.int32(np.int64(0x7F000000)))
    st[F_HP1] = jnp.where(in_w, out_fields[F_HP1], 0)
    st[F_HP2] = jnp.where(in_w, out_fields[F_HP2], 0)
    st[F_LAST] = jnp.where(in_w, out_fields[F_LAST], -1)
    st[F_LEN] = jnp.where(in_w, out_fields[F_LEN], 0)
    st[F_LIVE] = (in_w & (out_fields[F_LIVE] > 0)).astype(jnp.int32)
    st[F_S1] = jnp.where(in_w, out_fields[F_S1], neg)
    st[F_S2] = jnp.where(in_w, out_fields[F_S2], neg)

    ys_g = out_fields[NF]
    if sel_mode == "flag":
        # a local tie-overflow on ANY shard means the union may be
        # missing true winners — OR every shard's row flag into the
        # output so the caller's exact re-run triggers. The flag lives
        # in lane 0's sign bit; extract it with a masked lane reduce
        # (a [:, 0:1] lane slice is sub-128 along the lane dim and does
        # not lower on hardware — probed Mosaic constraint, CLAUDE.md)
        fr = jnp.zeros(lane.shape, jnp.int32)
        lane0 = lane == 0
        for j in range(n):
            row = recv_buf[par, NF, j]
            fr = fr | jnp.where(lane0, (row >> 31) & 1, 0)
        fr = jnp.max(fr, axis=1, keepdims=True)
        ys_g = ys_g | (fr << 31)
    ys_ref[0] = ys_g
    fin_ref[...] = st[...]

    # send buffer is rewritten next step: ensure this step's outbound
    # DMAs have left it (receives done globally != my sends drained)
    for off in range(1, n):
        peer = lax.rem(my_m + off, n)
        copy_desc(off, peer, my_m).wait_send()


@functools.partial(jax.jit, static_argnames=(
    "W", "V", "blank_id", "n", "axis", "mesh_axes", "pack", "block_b",
    "sel_mode", "match_impl", "interpret"))
def fused_tp_scan(f_loc: jax.Array, f_full: jax.Array,
                  init_packed: jax.Array, lo_hi: jax.Array,
                  W: int, V: int, blank_id: int, n: int, axis: str,
                  mesh_axes, pack: int = 0, block_b: int = 0,
                  sel_mode: str = "auto", match_impl: str = "auto",
                  interpret: bool = False):
    """Whole-scan vocab-sharded beam search: one Pallas program per
    shard, per-frame winner exchange via in-kernel remote DMAs.

    Must be called INSIDE shard_map over the full mesh; lo_hi packs
    the SMEM scalars [lo, hi, model_axis_index, flat_logical_device_id]
    (axis indices are computed by the caller — inside the kernel they
    would trace as captured constants). f_loc [T, B, VP]: this shard's 128-lane
    vocab window f[:, :, lo:lo+VP] (right-padded); f_full [T, B, VPF]:
    the full padded vocab (VPF = 128 or 256) for the in-kernel
    f[b, last] / f[b, blank] gathers — which caps this kernel at
    V <= 256 (the per-frame fused_tp_frame path stays the V-unbounded
    fallback; its f_last is computed outside the kernel).
    Returns (ys [T, B, S], fin [NF, B, S]) — array-equal on every
    shard, and bit-equal to fused_prefix_decode / the matched merge.
    """
    T, B, _ = f_loc.shape
    assert f_loc.shape[2] == VP and f_full.shape[2] in (VP, 2 * VP)
    VPF = f_full.shape[2]
    if pack == 0:
        pack = tp_pack(V, n, W)
    Wg = max(8 * pack, _round_up(W, 8 * pack))
    assert pack in (1, 2, 4) and Wg <= S and W <= S
    if block_b == 0:
        block_b = 32 if n <= 4 else 16
    if interpret:
        block_b = min(block_b, max(8, _round_up(B, 8)))
    b_pad = (-B) % block_b
    if b_pad:
        f_loc = jnp.pad(f_loc, ((0, 0), (0, b_pad), (0, 0)))
        f_full = jnp.pad(f_full, ((0, 0), (0, b_pad), (0, 0)))
        init_packed = jnp.pad(init_packed, ((0, 0), (0, b_pad), (0, 0)))
    Bp = B + b_pad

    scratch = [pltpu.VMEM((NF, block_b, S), jnp.int32)]
    if n > 1:
        scratch += [
            pltpu.VMEM((NFX, block_b, S), jnp.int32),          # send
            pltpu.VMEM((2, NFX, n, block_b, S), jnp.int32),    # recv
            pltpu.SemaphoreType.DMA((n - 1,)),
            pltpu.SemaphoreType.DMA((2, n)),
        ]
    # scoped-VMEM: the default 16 MB fits the frame math at block_b=24
    # (fused_prefix_decode); budget the comm scratch + the extra f_full
    # block on top, with double-buffering headroom (cf. the traceback
    # kernel's r3 lesson: Mosaic double-buffers persistent blocks when
    # inlined into shard_map modules)
    comm_bytes = 4 * block_b * S * (NFX * (1 + 2 * n) if n > 1 else 0)
    io_bytes = 4 * block_b * (VP + VPF + (2 * NF + 2) * S)
    # base allowance scales with the batch tile like fused_prefix_decode
    # (grid temporaries are ~linear in block_b; 16 MB fits 24)
    limit = min((16 << 20) * block_b // 24 + (4 << 20)
                + 2 * comm_bytes + 4 * io_bytes, 96 << 20)

    if interpret and n > 1:
        # remote DMAs need the TPU interpreter (simulated ICI), not the
        # generic Pallas interpreter
        interp = pltpu.InterpretParams()
    else:
        interp = interpret
    ys, fin = pl.pallas_call(
        functools.partial(
            _tp_scan_kernel, W=W, V=V, blank_id=blank_id, Wg=Wg,
            P=pack, VPF=VPF, n=n, axis=axis, mesh_axes=mesh_axes,
            sel_mode=sel_mode, match_impl=match_impl),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_b, VP), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, VPF), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, block_b, S), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, S), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, block_b, S), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, S), jnp.int32),
            jax.ShapeDtypeStruct((NF, Bp, S), jnp.int32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit,
            collective_id=1 if n > 1 else None,
            has_side_effects=n > 1),
        interpret=interp,
    )(lo_hi.astype(jnp.int32), f_loc, f_full, init_packed)
    return ys[:, :B], fin[:, :B]


# ------------------------------------------------------------- traceback
#
# The XLA traceback is a T-step lax.scan of tiny [B, W] gathers plus a
# T*B*W-element flat scatter; the ~270 us/step scan floor makes it
# ~40-55 ms at T=200 and the scatter another ~47 ms. Here the whole
# thing is one Pallas program: the reverse walk runs as a sequential
# grid over frame blocks with (cur, pos) in VMEM scratch, and each
# emission is committed IN-KERNEL into persistent [Bblk, Lp, S] token /
# timestep output blocks via an iota-compare select (Mosaic has no
# scatter; each beam writes at most one distinct position per frame, so
# a one-hot row select is exact). No [T, B, S] intermediates ever reach
# HBM: output is the final token matrix.
#
# VMEM sizing: the two persistent [BBLK, Lp, S] int32 output blocks
# dominate the kernel's scoped-VMEM stack. The round-1 official bench
# OOMed here with BBLK hardcoded to 64 at L=256 (Lp=264): 17.3 MB of
# outputs + ~1.3 MB of input double-buffers/select temporaries > the
# 16 MB scoped limit (BENCH_r01.json). BBLK is now computed from a
# static budget; callers use traceback_vmem_blk() to fall back to the
# XLA scan walk when even BBLK=8 cannot fit (very large max_len).

_TB_OUT_BUDGET = 12 * 2**20     # bytes for the two output blocks; the
                                # measured non-output overhead at
                                # BBLK=64/Lp=264 was ~1.3 MB, so 12 MB
                                # leaves >2.5 MB headroom under 16 MB


def traceback_vmem_blk(L: int) -> int:
    """Largest batch-block (multiple of 8, <= 64) whose persistent
    token/timestep output blocks fit the scoped-VMEM budget at max_len
    L. Returns 0 when the kernel cannot run (callers must use the XLA
    scan traceback)."""
    Lp = _round_up(L + 1, 8)
    per_row = 2 * Lp * S * 4            # two int32 [1, Lp, S] rows
    blk = (_TB_OUT_BUDGET // per_row) // 8 * 8
    return max(0, min(64, blk))

def _tb_kernel(ys_ref, len_ref, *rest, TBLK: int, L: int, Lp: int,
               fused: bool):
    # grid = (batch blocks, frame blocks); frame blocks walk t backwards
    # and are the fast axis, so (cur, pos) scratch and the token output
    # block stay resident in VMEM for a full batch block's walk.
    #
    # fused=True (r5 streaming): two extra inputs — base token /
    # timestep blocks in kernel layout [Bb, Lp, S] plus a [1] SMEM
    # frame-offset — and after the walk's LAST frame block the base
    # beam reorder (lane-dim dynamic_gather by start_parent: S = 128
    # is exactly one lane vreg, the Mosaic-safe gather form) and the
    # overlay merge run IN-KERNEL, so the per-chunk streaming overlay
    # costs zero extra XLA fusions (the r5 stage profile measured the
    # streaming-vs-batch gap as per-op dispatch, not bytes).
    if fused:
        (bt_ref, bts_ref, toff_ref, tok_ref, ts_ref, cur_fin_ref,
         cur_scr, pos_scr) = rest
    else:
        (tok_ref, ts_ref, cur_fin_ref, cur_scr, pos_scr) = rest
    it = pl.program_id(1)
    Bb = len_ref.shape[0]

    @pl.when(it == 0)
    def _():
        cur_scr[:] = lax.broadcasted_iota(jnp.int32, (Bb, S), 1)
        pos_scr[:] = len_ref[:]
        tok_ref[:] = jnp.full((Bb, Lp, S), -1, jnp.int32)
        ts_ref[:] = jnp.full((Bb, Lp, S), -1, jnp.int32)

    nblk = pl.num_programs(1)
    g0 = ((nblk - 1) - it) * TBLK       # padded t of this block's row 0
    cur = cur_scr[:]
    pos = pos_scr[:]
    tok = tok_ref[:]
    ts = ts_ref[:]
    liota = lax.broadcasted_iota(jnp.int32, (Bb, Lp, S), 1)
    for j in range(TBLK - 1, -1, -1):
        packed = jnp.take_along_axis(ys_ref[j], cur, axis=1)
        parent = packed & 0x7FFF
        char = (packed >> 15) & 0x7FFF
        app = (packed >> 30) & 1
        emit = jnp.minimum(pos - 1, L)
        emit = jnp.where(emit < 0, L, emit)
        emit = jnp.where(app > 0, emit, L)          # row L == discard
        hit = liota == jnp.broadcast_to(emit[:, None, :], (Bb, Lp, S))
        tok = jnp.where(hit,
                        jnp.broadcast_to(char[:, None, :], (Bb, Lp, S)),
                        tok)
        ts = jnp.where(hit, g0 + j, ts)
        cur = parent
        pos = pos - app
    cur_scr[:] = cur
    pos_scr[:] = pos
    cur_fin_ref[:] = cur
    if not fused:
        tok_ref[:] = tok
        ts_ref[:] = ts
        return

    @pl.when(it < nblk - 1)
    def _():
        tok_ref[:] = tok
        ts_ref[:] = ts

    @pl.when(it == nblk - 1)
    def _():
        # walk done: cur is the start_parent. Reorder the base buffers
        # by it (gather along the 128-lane slot dim) and merge: chunk
        # emissions (tok >= 0) win, at absolute timestep walk_ts+toff.
        idx = jnp.broadcast_to(cur[:, None, :], (Bb, Lp, S))
        btg = jnp.take_along_axis(
            bt_ref[:].reshape(Bb * Lp, S),
            idx.reshape(Bb * Lp, S), axis=1).reshape(Bb, Lp, S)
        btsg = jnp.take_along_axis(
            bts_ref[:].reshape(Bb * Lp, S),
            idx.reshape(Bb * Lp, S), axis=1).reshape(Bb, Lp, S)
        emitted = tok >= 0
        tok_ref[:] = jnp.where(emitted, tok, btg)
        ts_ref[:] = jnp.where(emitted, ts + toff_ref[0], btsg)


@functools.partial(jax.jit, static_argnames=("L", "interpret", "tblk"))
def traceback_pallas(packed_ys: jax.Array, final_lengths: jax.Array,
                     L: int, interpret: bool = False, tblk: int = 8):
    """Reverse backpointer walk + token materialization on-chip.

    packed_ys: [T, B, S'] (S' <= 128, padded to S lanes here);
    final_lengths: [B, S'] ABSOLUTE prefix lengths at walk start.
    Returns (tokens [B, S', L], trel [B, S', L], start_parent [B, S']):
    tokens/trel are -1 where this walk emitted nothing (streaming
    callers overlay base prefixes there); trel is the 0-based frame
    index within packed_ys. Value-equal to the lax.scan + flat-scatter
    path in decoder/beam_search._traceback."""
    T, B0, Sp = packed_ys.shape
    if Sp < S:
        packed_ys = jnp.pad(packed_ys, ((0, 0), (0, 0), (0, S - Sp)))
        final_lengths = jnp.pad(final_lengths, ((0, 0), (0, S - Sp)))
    TBLK = tblk
    t_pad = (-T) % TBLK
    if t_pad:
        # identity frames (parent = self, no append) prepended at the
        # front: the reverse walk passes through them as no-ops
        ident = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, None, :], (t_pad, B0, S))
        packed_ys = jnp.concatenate([ident, packed_ys], axis=0)
    Tp = T + t_pad

    Lp = _round_up(L + 1, 8)
    BBLK = min(traceback_vmem_blk(L), _round_up(B0, 8))
    if BBLK < 8:
        raise ValueError(
            f"traceback_pallas cannot fit max_len={L} in scoped VMEM "
            f"(needs BBLK >= 8); use the scan traceback "
            f"(gated by traceback_vmem_blk)")
    b_pad = (-B0) % BBLK
    if b_pad:
        # dead rows: zero lengths + zero ys (parent 0, no append)
        packed_ys = jnp.pad(packed_ys, ((0, 0), (0, b_pad), (0, 0)))
        final_lengths = jnp.pad(final_lengths, ((0, b_pad), (0, 0)))
    B = B0 + b_pad
    nB, nT = B // BBLK, Tp // TBLK

    # Scoped-VMEM limit sized from the actual block footprint. Mosaic's
    # stack usage for this kernel is CONTEXT-DEPENDENT: standalone it
    # compiles in ~5 [BBLK, Lp, S] blocks, but inlined into the
    # shard_map TP decode module it double-buffers the persistent
    # output blocks (scripts/tpu_round3_probe.py item 4c), and inlined
    # into jit(streaming_step) the measured stack need was 57.22 MB at
    # BBLK=40/Lp=264 (~10.6 blocks — the r3 streaming-bench OOM). The
    # budget must cover the worst observed context: 14 blocks +
    # inputs + headroom, capped under v5e's 128 MB physical VMEM.
    blk1 = BBLK * Lp * S * 4                # one [BBLK, Lp, S] buffer
    in_bytes = (TBLK * BBLK * S + BBLK * S) * 4
    vmem_budget = min(110 * 2**20,
                      14 * blk1 + 2 * in_bytes + 6 * 2**20)

    tok, trel, cur_fin = pl.pallas_call(
        functools.partial(_tb_kernel, TBLK=TBLK, L=L, Lp=Lp,
                          fused=False),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((TBLK, BBLK, S), lambda b, t: (nT - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, S), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BBLK, Lp, S), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, Lp, S), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, S), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lp, S), jnp.int32),
            jax.ShapeDtypeStruct((B, Lp, S), jnp.int32),
            jax.ShapeDtypeStruct((B, S), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((BBLK, S), jnp.int32),
                        pltpu.VMEM((BBLK, S), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_budget)),
    )(packed_ys, final_lengths)
    # un-pad: drop pad rows/identity frames, [B, Lp, S] -> [B, S', L]
    tok = jnp.transpose(tok[:B0, :L, :Sp], (0, 2, 1))
    trel = jnp.transpose(trel[:B0, :L, :Sp], (0, 2, 1))
    trel = jnp.where(trel >= 0, trel - t_pad, -1)
    return tok, trel, cur_fin[:B0, :Sp]


def traceback_overlay_blk(L: int) -> int:
    """Fused-overlay batch block: the kernel holds 4 persistent
    [BBLK, Lp, S] blocks (2 base inputs + 2 outputs) plus gather
    temporaries, so the per-row budget halves vs the plain walk."""
    Lp = _round_up(L + 1, 8)
    per_row = 4 * Lp * S * 4
    blk = (_TB_OUT_BUDGET // per_row) // 8 * 8
    return max(0, min(64, blk))


@functools.partial(jax.jit, static_argnames=("L", "interpret", "tblk"))
def traceback_overlay_pallas(packed_ys: jax.Array,
                             final_lengths: jax.Array, L: int,
                             base_tok: jax.Array, base_ts: jax.Array,
                             t_offset: jax.Array,
                             interpret: bool = False, tblk: int = 8):
    """Streaming traceback + base reorder + overlay in ONE kernel.

    packed_ys: [Tc, B, S'] chunk backpointers; final_lengths: [B, S']
    ABSOLUTE lengths at chunk end; base_tok/base_ts: [B, Lp, S]
    KERNEL-LAYOUT prefix buffers from the previous chunk (positions on
    sublanes, beam slots on lanes — what this function itself returned
    last chunk); t_offset: [] int32 absolute frame index of the
    chunk's first frame. Returns (tok_k, ts_k [B, Lp, S], start_parent
    [B, S']): the merged buffers in kernel layout (pad lanes/rows
    carry garbage; rows >= L and lanes >= S' are never exposed — the
    streaming caller slices/transposes only for user snapshots).

    Why: the r5 streaming stage profile attributed the whole
    streaming-vs-batch gap (~1.3 ms/chunk) to per-fusion dispatch of
    the XLA reorder einsum + Tc-select overlay, not to bytes. Fusing
    them into the walk kernel makes the per-chunk traceback cost ONE
    launch. The reorder is a lane-dim dynamic_gather (S = 128 = one
    lane vreg — the only Mosaic-safe same-shape gather form, r4).
    """
    Tc, B0, Sp = packed_ys.shape
    if Sp < S:
        packed_ys = jnp.pad(packed_ys, ((0, 0), (0, 0), (0, S - Sp)))
        final_lengths = jnp.pad(final_lengths, ((0, 0), (0, S - Sp)))
    TBLK = tblk
    t_pad = (-Tc) % TBLK
    if t_pad:
        ident = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, None, :],
            (t_pad, B0, S))
        packed_ys = jnp.concatenate([ident, packed_ys], axis=0)
    Tp = Tc + t_pad

    Lp = _round_up(L + 1, 8)
    assert base_tok.shape[1:] == (Lp, S), (base_tok.shape, Lp)
    BBLK = min(traceback_overlay_blk(L), _round_up(B0, 8))
    if BBLK < 8:
        raise ValueError(
            f"traceback_overlay_pallas cannot fit max_len={L}; callers "
            f"must gate on traceback_overlay_blk")
    b_pad = (-B0) % BBLK
    if b_pad:
        packed_ys = jnp.pad(packed_ys, ((0, 0), (0, b_pad), (0, 0)))
        final_lengths = jnp.pad(final_lengths, ((0, b_pad), (0, 0)))
        base_tok = jnp.pad(base_tok, ((0, b_pad), (0, 0), (0, 0)))
        base_ts = jnp.pad(base_ts, ((0, b_pad), (0, 0), (0, 0)))
    B = B0 + b_pad
    nB, nT = B // BBLK, Tp // TBLK

    blk1 = BBLK * Lp * S * 4
    in_bytes = (TBLK * BBLK * S + BBLK * S) * 4
    # 4 persistent blocks + gather temporaries (idx + 2 gathered) and
    # the same context-dependent double-buffering slack as the plain
    # walk kernel
    vmem_budget = min(110 * 2**20,
                      20 * blk1 + 2 * in_bytes + 6 * 2**20)
    # walk timesteps are relative to the PADDED chunk; fold the
    # identity-frame shift into the offset added in-kernel
    toff_adj = (jnp.asarray(t_offset, jnp.int32)
                - jnp.int32(t_pad)).reshape(1)

    tok, ts, cur_fin = pl.pallas_call(
        functools.partial(_tb_kernel, TBLK=TBLK, L=L, Lp=Lp,
                          fused=True),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((TBLK, BBLK, S), lambda b, t: (nT - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, S), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, Lp, S), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, Lp, S), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda b, t: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((BBLK, Lp, S), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, Lp, S), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BBLK, S), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lp, S), jnp.int32),
            jax.ShapeDtypeStruct((B, Lp, S), jnp.int32),
            jax.ShapeDtypeStruct((B, S), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((BBLK, S), jnp.int32),
                        pltpu.VMEM((BBLK, S), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_budget)),
    )(packed_ys, final_lengths, base_tok, base_ts, toff_adj)
    return tok[:B0], ts[:B0], cur_fin[:B0, :Sp]
