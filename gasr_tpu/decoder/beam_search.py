"""Batched CTC beam search as a fixed-shape XLA tensor program.

TPU-native re-imagination of the reference GPU decoder (CTCBeamSearch.cu).
Where the reference launches ~15 kernels + Thrust segmented sorts + a host
pointer-building loop per audio frame (.cu:519-595), this entire decode is
ONE jitted `lax.scan` whose per-frame body is: candidate expansion ->
multi-key sort -> segment merge -> top-k prune. Zero host round trips.

Two algorithms share the machinery:

- "prefix" (default): textbook CTC prefix beam search, log-space,
  (p_blank, p_nonblank) per collapsed prefix — semantics of the
  ctcdecode.CTCBeamDecoder the baseline uses (baseline/main.py:28).
- "reference": the reference's exact algorithm (blank-annotated paths,
  single score per hypothesis, merge-by-sum, post-merge prune,
  final-frame trailing-blank strip — kernelGenNextPaths .cu:404-458).
  Because the extension rules never produce an interior blank, a
  hypothesis is exactly (collapsed prefix, trailing_blank flag); this is
  what makes the fixed-shape formulation possible.

Key design decisions (vs the reference):
  - Hypothesis identity: the reference sorts paths lexicographically on
    device strings to group identical paths (batchSortbyStr .cu:149-172,
    the host loop at .cu:535-541 being its worst hotspot). We use TWO
    independent 32-bit rolling hashes updated incrementally on append —
    prefixes are append-only, so no string storage is needed in the hot
    loop. Simultaneous collision probability is ~2^-64 per candidate
    pair (~1e-12 per frame at W=100, V=47): documented, negligible.
  - Merge: sort candidates by (h1, h2, flag) with `lax.sort`
    (num_keys=3), flag run boundaries, `segment_sum`/logsumexp — a
    deterministic replacement for the reference's nondeterministic
    float atomicAdd merge (.cu:488).
  - Prune: `lax.top_k` AFTER merging (reference order .cu:567-576).
    Tie-break: stable by position in the hash-sorted candidate order
    (the reference inherits thrust::stable_sort order; ours is equally
    deterministic, documented here).
  - Tokens are NOT materialized during the scan. The scan records
    backpointers (parent slot, emitted char, appended?) per frame —
    O(B*W) state — and transcripts are reconstructed afterwards by a
    reverse scan + scatter. The reference instead copies the full
    256-char path per candidate per frame (memcpy in .cu:428).
  - Dead beam slots are masked (flag=2 key space, sentinel scores), not
    counted (reference tracks batchNumPaths on device, .cu:103-135).
  - Overflow: paths longer than max_len set a per-beam overflow flag and
    keep the HEAD (transcript truncated at the end); the reference
    silently corrupts memory at 256 chars (TODO at .cu:403).
  - Streaming: `streaming_init`/`streaming_step` carry beam state (and
    materialized prefixes) across chunks, so T is unbounded — the
    reference must hold the whole [T, B, V] tensor (decode .cu:262).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG_INF = -1.0e30          # finite -inf stand-in (avoids nan arithmetic)
DEAD_KEY_LOG = -3.0e38     # sort key for dead/duplicate slots, log domain
DEAD_KEY_PROB = -1.0       # ... prob domain (below any real prob >= 0)
H_SEED = np.uint32(2166136261)
M1 = np.uint32(1000003)
M2 = np.uint32(16777619)


class BeamSearchResult(NamedTuple):
    tokens: jax.Array    # [B, W, max_len] int32, -1 padded
    lengths: jax.Array   # [B, W] int32 (true prefix length, may exceed
                         # max_len — then overflow is set and tokens hold
                         # the first max_len symbols)
    scores: jax.Array    # [B, W] float32: log(p) ("prefix"/log "reference")
                         # or raw summed prob ("reference" prob_domain)
    overflow: jax.Array  # [B, W] bool
    timesteps: jax.Array # [B, W, max_len] int32 (-1 padded): frame at
                         # which the surviving hypothesis FIRST appended
                         # each token — ctcdecode's first-creation
                         # semantics, completing the baseline's 4-tuple
                         # API (output, scores, timesteps, out_seq_len,
                         # baseline/main.py:46)


class _BeamState(NamedTuple):
    h1: jax.Array        # [B, W] uint32 prefix hash 1
    h2: jax.Array        # [B, W] uint32 prefix hash 2
    hp1: jax.Array       # [B, W] uint32 hash 1 of prefix MINUS last char
    hp2: jax.Array       # [B, W] uint32 hash 2 of prefix MINUS last char
    last: jax.Array      # [B, W] int32 last char (-1 if empty)
    length: jax.Array    # [B, W] int32 collapsed prefix length
    tb: jax.Array        # [B, W] int32 trailing-blank flag (reference mode)
    live: jax.Array      # [B, W] bool
    s1: jax.Array        # [B, W] f32: p_b (prefix) | score (reference)
    s2: jax.Array        # [B, W] f32: p_nb (prefix) | unused


class StreamingState(NamedTuple):
    """Carried across chunks: beam + materialized prefixes.

    Two buffer layouts (r5): the default PUBLIC layout keeps
    tokens/timesteps as [B, W, max_len], meta empty. When the fused
    traceback+overlay kernel drives the stream (TPU pallas path), the
    buffers stay in KERNEL layout [B, Lp, 128] (positions on sublanes,
    beam slots on lanes — no per-chunk transposes) and `meta` is a
    [max_len] dummy whose SHAPE statically records max_len; user
    snapshots returned by streaming_step are always [B, W, max_len].
    """
    beam: _BeamState
    tokens: jax.Array     # [B, W, max_len] int32 (or kernel layout)
    timesteps: jax.Array  # [B, W, max_len] int32 (absolute frame index)
    frames: jax.Array     # [] int32: total frames consumed so far
    meta: jax.Array = np.zeros((0,), np.int32)  # [max_len] iff kernel layout


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    return m + jnp.log1p(jnp.exp(jnp.maximum(lo - m, -80.0)) *
                         (lo - m > -80.0))


def _segment_logsumexp(s, seg, num_segments):
    m = jax.ops.segment_max(s, seg, num_segments=num_segments)
    mc = m[seg]
    contrib = jnp.where(s - mc > -80.0, jnp.exp(jnp.maximum(s - mc, -80.0)),
                        0.0)
    tot = jax.ops.segment_sum(contrib, seg, num_segments=num_segments)
    return jnp.where(m > NEG_INF * 0.5, m + jnp.log(jnp.maximum(tot, 1e-37)),
                     NEG_INF)


def _merge_row(k1, k2, k3, payload_scores, log_domain):
    """Merge one row of N candidates by identity keys. Returns (perm,
    first, merged scores aligned with sorted order)."""
    N = k1.shape[0]
    iota = lax.iota(jnp.int32, N)
    sorted_ops = lax.sort((k1, k2, k3, iota), num_keys=3, is_stable=True)
    perm = sorted_ops[3]
    sk1, sk2, sk3 = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    first = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1]) | (sk3[1:] != sk3[:-1]),
    ])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    merged = []
    for s in payload_scores:
        ss = s[perm]
        if log_domain:
            mseg = _segment_logsumexp(ss, seg, N)
        else:
            mseg = jax.ops.segment_sum(ss, seg, num_segments=N)
        merged.append(mseg[seg])
    return perm, first, merged


def _init_beam(B: int, W: int, log_domain: bool) -> _BeamState:
    zero_score = 0.0 if log_domain else 1.0
    null_score = NEG_INF if log_domain else 0.0
    slot = jnp.arange(W, dtype=jnp.int32)
    return _BeamState(
        h1=jnp.broadcast_to(jnp.where(slot == 0, H_SEED, np.uint32(0)),
                            (B, W)),
        h2=jnp.broadcast_to(jnp.where(slot == 0, H_SEED,
                                      slot.astype(jnp.uint32)), (B, W)),
        hp1=jnp.zeros((B, W), jnp.uint32),
        hp2=jnp.zeros((B, W), jnp.uint32),
        last=jnp.full((B, W), -1, jnp.int32),
        length=jnp.zeros((B, W), jnp.int32),
        tb=jnp.zeros((B, W), jnp.int32),
        live=jnp.broadcast_to(slot == 0, (B, W)),
        s1=jnp.broadcast_to(jnp.where(slot == 0, zero_score, null_score),
                            (B, W)).astype(jnp.float32),
        s2=jnp.full((B, W), NEG_INF if log_domain else 0.0, jnp.float32),
    )


def _make_frame_step(B: int, W: int, V: int, blank_id: int, algorithm: str,
                     log_domain: bool):
    """Build the per-frame transition: (state, (f, is_last)) ->
    (state', (parent, char, appended))."""
    N = W * V
    dead_key = DEAD_KEY_LOG if log_domain else DEAD_KEY_PROB
    null_score = NEG_INF if log_domain else 0.0
    vs = jnp.arange(V, dtype=jnp.int32)
    is_blank_v = (vs == blank_id)

    def frame_step(state: _BeamState, inputs):
        f, is_last = inputs                      # f: [B, V]
        h1 = state.h1[:, :, None]
        h2 = state.h2[:, :, None]
        last = state.last[:, :, None]
        length = state.length[:, :, None]
        tb = state.tb[:, :, None]
        live = state.live[:, :, None]
        fv = f[:, None, :]                       # [B, 1, V]

        vb = is_blank_v[None, None, :]
        v3 = vs[None, None, :]
        vp1 = (vs + 1).astype(jnp.uint32)[None, None, :]

        if algorithm == "reference":
            collapse = (~vb) & (tb == 0) & (last == v3) & (length > 0)
            append = jnp.broadcast_to((~vb) & (~collapse), (B, W, V))
            new_tb = jnp.where(vb & (~is_last), 1, 0).astype(jnp.int32)
            new_tb = jnp.broadcast_to(new_tb, (B, W, V))
            c_s1 = (state.s1[:, :, None] + fv if log_domain
                    else state.s1[:, :, None] * fv)
            c_s2 = jnp.broadcast_to(
                jnp.float32(NEG_INF if log_domain else 0.0), (B, W, V))
        else:
            # "stay" candidates occupy the blank column: blank transition
            # plus the collapse (repeat) contribution.
            total = _logaddexp(state.s1, state.s2)[:, :, None]
            f_last = jnp.take_along_axis(
                f, jnp.clip(state.last, 0, V - 1), axis=1)[:, :, None]
            stay_pb = total + fv                  # valid at blank column
            stay_pnb = state.s2[:, :, None] + f_last
            ext_base = jnp.where(last == v3, state.s1[:, :, None], total)
            ext_pnb = ext_base + fv
            c_s1 = jnp.where(vb, stay_pb, NEG_INF)
            c_s2 = jnp.where(vb, stay_pnb, ext_pnb)
            append = jnp.broadcast_to(~vb, (B, W, V))
            new_tb = jnp.zeros((B, W, V), jnp.int32)

        nh1 = jnp.where(append, h1 * M1 + vp1, h1)
        nh2 = jnp.where(append, h2 * M2 + vp1, h2)
        nhp1 = jnp.where(append, h1, state.hp1[:, :, None])
        nhp2 = jnp.where(append, h2, state.hp2[:, :, None])
        n_last = jnp.where(append, v3, last)
        n_len = length + append.astype(jnp.int32)

        # identity flag: tb (0/1) for live, 2 for dead (disjoint keyspace)
        liveb = jnp.broadcast_to(live, (B, W, V))
        flag = jnp.where(liveb, new_tb, 2)
        cand_idx = lax.broadcasted_iota(jnp.int32, (B, W, V), 1) * V + \
            lax.broadcasted_iota(jnp.int32, (B, W, V), 2)
        nh1 = jnp.where(liveb, nh1, np.uint32(0xFFFFFFFF))
        nh2 = jnp.where(liveb, nh2, cand_idx.astype(jnp.uint32))
        c_s1 = jnp.where(liveb, c_s1, null_score)
        c_s2 = jnp.where(liveb, c_s2, NEG_INF if log_domain else 0.0)

        parent = lax.broadcasted_iota(jnp.int32, (B, W, V), 1)

        def flat(x):
            return x.reshape(B, N)
        k1, k2, k3 = flat(nh1), flat(nh2), flat(flag)
        scores = (flat(c_s1), flat(c_s2))

        perm, first, merged = jax.vmap(
            functools.partial(_merge_row, log_domain=log_domain)
        )(k1, k2, k3, scores)

        def g(x):                                 # gather into sorted order
            return jnp.take_along_axis(flat(x), perm, axis=1)

        live_s = g(liveb)
        if algorithm == "reference":
            rank = merged[0]
        else:
            rank = _logaddexp(merged[0], merged[1])
        topk_key = jnp.where(first & live_s, rank, dead_key)

        _, idx_sel = lax.top_k(topk_key, W)       # [B, W]

        def sel(x_sorted):
            return jnp.take_along_axis(x_sorted, idx_sel, axis=1)

        new_live = sel(first & live_s)
        ns1 = jnp.where(new_live, sel(merged[0]), null_score)
        ns2 = jnp.where(new_live, sel(merged[1]),
                        NEG_INF if log_domain else 0.0)
        new_state = _BeamState(
            h1=sel(g(nh1)), h2=sel(g(nh2)),
            hp1=sel(g(nhp1)), hp2=sel(g(nhp2)),
            last=sel(g(n_last)), length=sel(g(n_len)),
            tb=sel(g(new_tb)),
            live=new_live, s1=ns1, s2=ns2,
        )
        ys = _pack_ys(sel(g(parent)), sel(g(n_last)), sel(g(append)))
        return new_state, ys

    return frame_step


def _make_frame_step_fast(B: int, W: int, V: int, blank_id: int,
                          topk_impl: str = "exact",
                          lm_bias: Optional[jax.Array] = None):
    """Matched-merge frame step for the "prefix" algorithm (log domain).

    Exploits a structural invariant the sort-based path ignores: beam
    prefixes are UNIQUE after every prune, so
      - extend candidates (prefix_w + v) are pairwise distinct, and
      - the only possible merge is extend(w, v) into stay(w') where
        prefix(w') == prefix(w) + v — and each stay has at most ONE such
        partner (the slot holding its parent prefix).
    The W*V-candidate sort + segment reduction therefore collapses to a
    W x W hash match (h_full[w] == h_prefix[w'], lengths off by one)
    plus one lax.top_k over the candidate grid. ~100x less work per
    frame than the sort path at W=100, V=47; bit-identical semantics
    (same dual-hash identity assumptions).
    """
    vs = jnp.arange(V, dtype=jnp.int32)
    DEAD = DEAD_KEY_LOG

    def frame_step(state: _BeamState, inputs):
        f, _is_last = inputs                           # [B, V]
        pb, pnb, live = state.s1, state.s2, state.live
        total = _logaddexp(pb, pnb)                    # [B, W]
        last_clip = jnp.clip(state.last, 0, V - 1)
        f_last = jnp.take_along_axis(f, last_clip, axis=1)   # [B, W]

        # ---- parent match: w (axis 1) is candidate parent, w' (axis 2)
        # the stay slot whose prefix = prefix_w + last_w'. The length
        # off-by-one test is FOLDED into the h2 compare (k2 = 31*h2 +
        # length, mod 2^32): equality of (h1, k2) pairs is the same
        # identity up to hash collisions, which this merge already
        # accepts on (h1, h2) — and the Pallas kernel (fused_decode
        # _frame_math) computes the identical folded predicate, so the
        # two paths stay bit-equal by construction.
        k2 = state.h2 * jnp.uint32(31) + state.length.astype(jnp.uint32)
        kp2 = (state.hp2 * jnp.uint32(31) +
               (state.length - 1).astype(jnp.uint32))
        eq = ((state.h1[:, :, None] == state.hp1[:, None, :]) &
              (k2[:, :, None] == kp2[:, None, :]) &
              live[:, :, None] & live[:, None, :])     # [B, W, W']
        has_match = eq.any(axis=1)                     # [B, W']
        match = jnp.argmax(eq, axis=1).astype(jnp.int32)

        # ---- stay candidates (blank column): blank transition + repeat
        # collapse + absorbed extend from the matched parent.
        # Gathers along the beam axis are packed into ONE take_along_axis
        # each — many small [B, W] gathers dominate the frame cost on TPU
        # (bisected: ~2.6 of 3.4 ms/frame before packing).
        stay_pb = total + f[:, blank_id][:, None]
        stay_pnb = jnp.where(state.length > 0, pnb + f_last, NEG_INF)
        m = jnp.clip(match, 0, W - 1)
        parent_pack = jnp.stack(
            [pb, pnb, state.last.astype(jnp.float32)], axis=-1)  # [B, W, 3]
        sel_parent = jnp.take_along_axis(parent_pack, m[:, :, None],
                                         axis=1)
        pb_m = sel_parent[:, :, 0]
        pnb_m = sel_parent[:, :, 1]
        last_m = sel_parent[:, :, 2].astype(jnp.int32)
        ext_base_m = jnp.where(last_m == state.last, pb_m,
                               _logaddexp(pb_m, pnb_m))
        ext_contrib = jnp.where(has_match, ext_base_m + f_last, NEG_INF)
        stay_pnb = _logaddexp(stay_pnb, ext_contrib)
        stay_score = jnp.where(live, _logaddexp(stay_pb, stay_pnb), DEAD)

        # ---- extend candidates [B, W, V]
        is_rep = vs[None, None, :] == state.last[:, :, None]
        ext_pnb = jnp.where(is_rep, pb[:, :, None], total[:, :, None]) \
            + f[:, None, :]
        if lm_bias is not None:
            # shallow fusion: additive LM score on append, conditioned on
            # the previous character (row 0 = sentence start / empty).
            ext_pnb = ext_pnb + jnp.take(lm_bias, state.last + 1, axis=0)
        # exclude extends absorbed into a stay (their identity already
        # exists in the beam): excl[b, w, v] = any w' with match==w and
        # last_w' == v
        onehot_m = jax.nn.one_hot(
            jnp.where(has_match, match, -1), W, dtype=jnp.float32)
        onehot_v = jax.nn.one_hot(last_clip, V, dtype=jnp.float32) \
            * has_match[..., None].astype(jnp.float32)
        excl = jnp.einsum("bkw,bkv->bwv", onehot_m, onehot_v,
                          preferred_element_type=jnp.float32) > 0.5
        valid_ext = (vs[None, None, :] != blank_id) \
            & live[:, :, None] & (~excl)
        ext_score = jnp.where(valid_ext, ext_pnb, DEAD)

        # ---- combined grid: blank column holds the stay candidate
        cand = jnp.where(vs[None, None, :] == blank_id,
                         stay_score[:, :, None], ext_score)
        if topk_impl == "approx":
            # TPU-optimized partial reduction (lax.approx_max_k,
            # recall ~0.99 at the beam boundary): ~2.8x faster than
            # exact top_k per frame; serving-mode knob, off by default.
            top_vals, idx = lax.approx_max_k(
                cand.reshape(B, W * V), W, recall_target=0.99)
        else:
            top_vals, idx = lax.top_k(cand.reshape(B, W * V), W)
        w_sel = idx // V
        v_sel = idx % V
        is_stay = v_sel == blank_id
        new_live = top_vals > DEAD * 0.5

        # one packed gather for ALL per-beam state fields (int32 lanes;
        # uint32 hashes bitcast through int32)
        state_pack = jnp.stack([
            lax.bitcast_convert_type(state.h1, jnp.int32),
            lax.bitcast_convert_type(state.h2, jnp.int32),
            lax.bitcast_convert_type(state.hp1, jnp.int32),
            lax.bitcast_convert_type(state.hp2, jnp.int32),
            state.last, state.length,
            lax.bitcast_convert_type(stay_pb, jnp.int32),
            lax.bitcast_convert_type(stay_pnb, jnp.int32),
        ], axis=-1)                                   # [B, W, 8]
        g = jnp.take_along_axis(state_pack, w_sel[:, :, None], axis=1)
        h1g = lax.bitcast_convert_type(g[:, :, 0], jnp.uint32)
        h2g = lax.bitcast_convert_type(g[:, :, 1], jnp.uint32)
        hp1g = lax.bitcast_convert_type(g[:, :, 2], jnp.uint32)
        hp2g = lax.bitcast_convert_type(g[:, :, 3], jnp.uint32)
        last_g = g[:, :, 4]
        len_g = g[:, :, 5]
        stay_pb_g = lax.bitcast_convert_type(g[:, :, 6], jnp.float32)
        stay_pnb_g = lax.bitcast_convert_type(g[:, :, 7], jnp.float32)

        sel_ext_pnb = jnp.take_along_axis(
            ext_pnb.reshape(B, W * V), idx, axis=1)
        ns1 = jnp.where(new_live & is_stay, stay_pb_g, NEG_INF)
        ns2 = jnp.where(new_live,
                        jnp.where(is_stay, stay_pnb_g, sel_ext_pnb),
                        NEG_INF)

        vp1 = (v_sel + 1).astype(jnp.uint32)
        new_state = _BeamState(
            h1=jnp.where(is_stay, h1g, h1g * M1 + vp1),
            h2=jnp.where(is_stay, h2g, h2g * M2 + vp1),
            hp1=jnp.where(is_stay, hp1g, h1g),
            hp2=jnp.where(is_stay, hp2g, h2g),
            last=jnp.where(is_stay, last_g, v_sel),
            length=len_g + (~is_stay).astype(jnp.int32),
            tb=jnp.zeros((B, W), jnp.int32),
            live=new_live,
            s1=ns1, s2=ns2,
        )
        ys = _pack_ys(w_sel, jnp.where(is_stay, last_g, v_sel),
                      (~is_stay) & new_live)
        return new_state, ys

    return frame_step


def _pack_ys(parent, char, appended):
    """Backpointer fields -> one int32: parent | char<<15 | appended<<30.

    One packed array means ONE gather per traceback step instead of
    three (the traceback is T sequential steps of [B, W] gathers)."""
    return (parent | (jnp.maximum(char, 0) << 15)
            | (appended.astype(jnp.int32) << 30))


def _unpack_ys(packed):
    parent = packed & 0x7FFF
    char = (packed >> 15) & 0x7FFF
    appended = (packed >> 30) & 1
    return parent, char, appended.astype(jnp.bool_)


def _traceback(packed_ys, final_lengths, L,
               base_tokens: Optional[jax.Array] = None,
               base_timesteps: Optional[jax.Array] = None,
               t_offset=0, impl: str = "scan"):
    """Reconstruct prefixes from per-frame backpointers.

    packed_ys: [Tc, B, W] int32 (see _pack_ys); final_lengths: [B, W]
    (absolute prefix lengths at the end of the chunk). Emissions land at
    their absolute positions (head-keeping on overflow: positions >= L
    drop). base_tokens [B, W, L] are the materialized prefixes at CHUNK
    START, indexed by the chunk's start slots; None for a fresh decode.
    Returns (tokens [B, W, L], start_parent [B, W]).
    """
    Tc, B, W = packed_ys.shape

    def backstep(carry, y):
        cur, pos = carry                          # [B, W] each
        packed, t = y
        packed = jnp.take_along_axis(packed, cur, axis=1)
        p, c, a = _unpack_ys(packed)
        emit_pos = jnp.where(a, jnp.minimum(pos - 1, L), L)  # L = discard
        emit_pos = jnp.where(emit_pos < 0, L, emit_pos)
        new_pos = jnp.where(a, pos - 1, pos)
        return (p, new_pos), (jnp.where(a, c, -1), emit_pos,
                              jnp.where(a, t, -1))

    if impl == "pallas":
        # sequential Pallas grid instead of lax.scan + flat scatter: the
        # ~270 us/step scan floor dominates the XLA walk at [B, W]-sized
        # steps, and the T*B*W scatter costs another ~47 ms at flagship
        # shape. The kernel commits emissions in-kernel and returns the
        # final token matrices; positions not written by this walk are
        # -1, so the streaming base overlay is a select.
        #
        # L trim: a prefix appends at most one token per frame, so after
        # `t_offset + Tc` total frames every emit position is
        # < t_offset + Tc. When the frame count is static (the batch
        # path: t_offset == 0) the kernel runs at L_eff = min(L, frames)
        # and the output is -1-padded back to L — at the flagship bench
        # shape (T=200, max_len=256) that cuts the persistent VMEM
        # token blocks and the per-frame select passes by ~22%.
        #
        # Streaming (traced t_offset): the walk runs CHUNK-RELATIVE.
        # Only the chunk's <= Tc emissions matter and the walk uses
        # `pos` purely through (emit = pos-1, pos -= append), so
        # feeding per-row lengths = Tc yields the same emissions at
        # relative slots rel = abs - (len_final - Tc) in [0, Tc) —
        # a STATIC L_eff = Tc kernel (r3 paid full-L select passes
        # per chunk: 1.56x batch; VERDICT r4 item #3). The absolute
        # overlay below is a shifted gather on the [B, W, L] buffers.
        from gasr_tpu.ops.pallas.fused_decode import (traceback_pallas,
                                                      traceback_vmem_blk)
        traced_off = not isinstance(t_offset, int)
        # the relative path unrolls Tc overlay selects — cap it at
        # streaming-sized chunks; a huge "chunk" takes the absolute
        # walk at full L instead
        streaming_rel = traced_off and Tc <= 128
        L_eff = (Tc if streaming_rel
                 else L if traced_off
                 else min(L, t_offset + Tc))
        if traceback_vmem_blk(L_eff) < 8:
            # max_len too large for the kernel's scoped-VMEM budget:
            # the XLA scan walk below handles any L (round-1 bench
            # lesson — never let a shape turn into a compile error)
            impl = "scan"
    if impl == "pallas":
        interpret = jax.default_backend() != "tpu"
        if streaming_rel:
            assert base_tokens is not None
            k_tok, k_rel, start_parent = traceback_pallas(
                packed_ys, jnp.full_like(final_lengths, Tc), Tc,
                interpret=interpret)
            off = (final_lengths - Tc)[:, :, None]       # [B, W, 1]
            # base-buffer beam reorder as an EXACT one-hot matmul:
            # take_along_axis(axis=1) with per-(b, w) indices lowers to
            # an element gather that measured 5.7 ms / 10 chunks on TPU
            # (r5 stage profile); a [B, W, W] one-hot against the
            # concatenated [B, W, 2L] buffers rides the MXU instead.
            # Precision.HIGHEST splits each f32 operand into 3 bf16
            # limbs (24 mantissa bits), and a one-hot row selects a
            # single column, so int32 values round-trip EXACTLY through
            # f32 while |v| < 2^24 (tokens < 2^15; timesteps < 2^24 =
            # ~46 h of 10 ms frames — checked in tests).
            onehot = (start_parent[:, :, None]
                      == jnp.arange(base_tokens.shape[1],
                                    dtype=jnp.int32)[None, None, :]
                      ).astype(jnp.float32)              # [B, W, Wold]
            cat = jnp.concatenate(
                [base_tokens, base_timesteps], axis=2).astype(jnp.float32)
            cat = jnp.einsum("bvw,bwl->bvl", onehot, cat,
                             precision=lax.Precision.HIGHEST
                             ).astype(jnp.int32)         # [B, W, 2L]
            # commit the <= Tc chunk emissions with one iota-compare
            # select per relative slot, over the SINGLE concatenated
            # buffer (one fused pass). NOT a [B, W, L] take_along_axis:
            # a dynamically-indexed gather of B*W*L elements measured
            # ~135 ms/chunk on TPU (the r4 first cut: streaming 99.7
            # -> 1418 ms).
            relidx = jnp.concatenate(
                [jnp.arange(L, dtype=jnp.int32)] * 2)[None, None, :]
            is_tok = (jnp.arange(2 * L) < L)[None, None, :]
            for j in range(Tc):
                pos_j = off + j                          # [B, W, 1]
                tok_j = k_tok[:, :, j:j + 1]
                t_j = k_rel[:, :, j:j + 1]
                hit = (relidx == pos_j) & (tok_j >= 0)
                val = jnp.where(is_tok, tok_j, t_j + t_offset)
                cat = jnp.where(hit, val, cat)
            return cat[:, :, :L], cat[:, :, L:], start_parent
        k_tok, k_t, start_parent = traceback_pallas(
            packed_ys, final_lengths, L_eff, interpret=interpret)
        if L_eff < L:
            pad = ((0, 0), (0, 0), (0, L - L_eff))
            k_tok = jnp.pad(k_tok, pad, constant_values=-1)
            k_t = jnp.pad(k_t, pad, constant_values=-1)
        k_t = jnp.where(k_t >= 0, k_t + t_offset, -1)
        if base_tokens is None:
            return k_tok, k_t, start_parent

        # same one-hot MXU reorder as the streaming_rel path (exact for
        # |v| < 2^24; take_along_axis here is an element gather on TPU)
        onehot = (start_parent[:, :, None]
                  == jnp.arange(base_tokens.shape[1],
                                dtype=jnp.int32)[None, None, :]
                  ).astype(jnp.float32)
        cat = jnp.concatenate(
            [base_tokens, base_timesteps], axis=2).astype(jnp.float32)
        cat = jnp.einsum("bvw,bwl->bvl", onehot, cat,
                         precision=lax.Precision.HIGHEST
                         ).astype(jnp.int32)
        # mask on k_tok for BOTH buffers: a chunk emission always writes
        # token >= 0 and timestep >= 0 at the same positions
        return (jnp.where(k_tok >= 0, k_tok, cat[:, :, :L]),
                jnp.where(k_tok >= 0, k_t, cat[:, :, L:]), start_parent)

    cur0 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (B, W))
    t_idx = t_offset + jnp.arange(Tc, dtype=jnp.int32)
    (start_parent, _), (tok_vals, tok_pos, tok_t) = lax.scan(
        backstep, (cur0, final_lengths), (packed_ys, t_idx),
        reverse=True)

    # the flat scatter is layout-agnostic: index directly in [Tc, B, W]
    # (transposing three [Tc, B, W] buffers costs more than the scatter)

    def gather_base(buf):
        gathered = jnp.take_along_axis(
            buf, start_parent[:, :, None], axis=1)
        return jnp.concatenate(
            [gathered, jnp.full((B, W, 1), -1, jnp.int32)],
            axis=-1).reshape(-1)

    if base_tokens is None:
        base = jnp.full((B * W * (L + 1),), -1, jnp.int32)
        base_t = base
    else:
        base = gather_base(base_tokens)
        base_t = gather_base(base_timesteps)

    # one flat scatter per output buffer, all (b, w) rows at once
    row = (jnp.arange(B * W, dtype=jnp.int32)
           .reshape(1, B, W)) * (L + 1)
    flat_idx = (row + tok_pos).reshape(-1)

    def fill(b):
        return b.reshape(B, W, L + 1)[:, :, :L]
    tokens = fill(base.at[flat_idx].set(tok_vals.reshape(-1), mode="drop"))
    timesteps = fill(base_t.at[flat_idx].set(tok_t.reshape(-1),
                                             mode="drop"))
    return tokens, timesteps, start_parent


def _result(final: _BeamState, tokens: jax.Array, timesteps: jax.Array,
            L: int, algorithm: str, log_domain: bool) -> BeamSearchResult:
    null_score = NEG_INF if log_domain else 0.0
    scores = (_logaddexp(final.s1, final.s2) if algorithm == "prefix"
              else final.s1)
    scores = jnp.where(final.live, scores, null_score)
    lengths = jnp.where(final.live, final.length, 0)
    overflow = (lengths > L) & final.live
    return BeamSearchResult(tokens=tokens, lengths=lengths,
                            scores=scores, overflow=overflow,
                            timesteps=timesteps)


@functools.partial(jax.jit, static_argnames=(
    "beam_width", "blank_id", "max_len", "algorithm", "prob_domain",
    "merge_impl", "topk_impl"))
def ctc_beam_search(
    log_probs: jax.Array,
    beam_width: int,
    blank_id: int = 0,
    max_len: int = 256,
    algorithm: str = "prefix",
    prob_domain: bool = False,
    merge_impl: str = "auto",
    topk_impl: str = "exact",
    input_lengths: Optional[jax.Array] = None,
    lm_bias: Optional[jax.Array] = None,
) -> BeamSearchResult:
    """Batched CTC beam search.

    log_probs: [T, B, V] time-major log-probabilities — or raw
    probabilities when (algorithm="reference", prob_domain=True), which
    bit-matches the CUDA reference's multiplicative scoring including its
    long-T underflow behavior.

    Returns a BeamSearchResult with the beams sorted best-first per
    example. tokens contain collapsed symbol ids (never blank), -1 padded.

    merge_impl: "auto" (matched-merge for "prefix", sort for
    "reference"), "matched", "sort" (the general path, also the
    cross-check oracle for the matched path), or "pallas" (the fused
    whole-scan TPU kernel, array-equal to "matched"; prefix/log only,
    W <= 128 with V <= 128 or W <= 64 with V <= 256).

    lm_bias: optional [V+1, V] shallow-fusion table added on every
    append, conditioned on the previous character (row 0 = start).
    Applied at bfloat16 resolution on every path — the fused kernel
    reads the table through an MXU one-hot contraction (bf16 by
    construction) and the XLA path quantizes identically so results
    stay bit-equal across implementations.
    """
    if algorithm not in ("prefix", "reference"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if prob_domain and algorithm != "reference":
        raise ValueError("prob_domain is only for algorithm='reference'")
    log_domain = not prob_domain

    T, B, V = log_probs.shape
    W = beam_width
    L = max_len

    if input_lengths is not None:
        # per-utterance lengths (the baseline's out_lens,
        # baseline/main.py:45): frames at t >= length[b] are replaced by
        # a deterministic blank, which leaves every prefix's total
        # probability (and hence transcripts AND scores) unchanged —
        # the same identity the CTC loss padding uses.
        if not log_domain:
            raise ValueError("input_lengths requires log-domain scores")
        if algorithm != "prefix":
            # the reference algorithm's final-frame blank strip interacts
            # with pruning, so padding is not score-exact there; decode
            # per-utterance truncated inputs instead.
            raise ValueError("input_lengths requires algorithm='prefix'")
        t_idx = jnp.arange(T)[:, None]                    # [T, 1]
        pad = t_idx >= input_lengths[None, :]             # [T, B]
        onehot_blank = jnp.where(jnp.arange(V) == blank_id, 0.0, NEG_INF)
        log_probs = jnp.where(pad[:, :, None],
                              onehot_blank[None, None, :], log_probs)

    if lm_bias is not None:
        # bf16 resolution on the LM bias, identically on BOTH decode
        # paths: the fused kernel reads the table through an MXU
        # one-hot contraction (bf16 inputs by construction), so the
        # XLA path quantizes to match and the two stay bit-equal.
        # `+ 0.0` canonicalizes -0.0 -> +0.0 (the kernel's zero-padded
        # half-table sum would otherwise flip a -0.0's sign).
        lm_bias = lm_bias.astype(jnp.bfloat16).astype(jnp.float32) + 0.0

    init = _init_beam(B, W, log_domain)
    tb_impl = "scan"
    if _use_pallas(merge_impl, algorithm, log_domain, W, V, topk_impl,
                   lm_bias):
        final, packed_ys = _pallas_scan(log_probs, init, W, V, blank_id,
                                        lm_bias=lm_bias)
        tb_impl = "pallas"
    else:
        frame_step = _pick_step(B, W, V, blank_id, algorithm, log_domain,
                                merge_impl, topk_impl, lm_bias)

        is_last_arr = jnp.zeros((T,), jnp.bool_)
        if algorithm == "reference" and T > 1:
            # reference strips trailing blanks only on the final frame of
            # the t=1..T-1 loop (.cu:278-281); T==1 never strips.
            is_last_arr = is_last_arr.at[T - 1].set(True)

        final, packed_ys = lax.scan(
            frame_step, init, (log_probs, is_last_arr))

    tokens, timesteps, _ = _traceback(packed_ys, final.length, L,
                                      impl=tb_impl)
    return _result(final, tokens, timesteps, L, algorithm, log_domain)


def _use_pallas(merge_impl, algorithm, log_domain, W, V, topk_impl,
                lm_bias) -> bool:
    """Whole-scan fused Pallas kernel eligibility (see
    ops/pallas/fused_decode.py). Explicit opt-in via
    merge_impl="pallas" (raises if the request can't be honored);
    "auto" picks it on TPU for large candidate grids, where it beats
    the XLA matched-merge scan (measured 1.9x at W=100, V=47)."""
    shape_ok = (W <= 128 and V <= 128) or (W <= 64 and V <= 256)
    # LM shallow fusion rides the kernel for V <= 255: V <= 127 via
    # the pack-half tables, larger vocabularies via row-half tables
    # (r4 — conformer_s V=129 + LM previously fell back to the ~2x
    # slower XLA matched path); V = 256 exactly needs 257 rows > 2*VP.
    lm_ok = lm_bias is None or V <= 255
    eligible = (algorithm == "prefix" and log_domain
                and topk_impl == "exact" and lm_ok
                and shape_ok)
    if merge_impl == "auto":
        # r2 measured a W*V >= 768 crossover (W=10,V=29 lost 0.95x) —
        # but that was WITH the block_b bug that padded small batches
        # to 32 sublane rows (r5 small-preset audit). Post-clamp the
        # kernel wins even at the smallest preset shape (bilstm W=10
        # V=29 B=16: pallas 7.68 ms vs matched 12.08 on TPU v5e), so
        # auto takes the kernel whenever eligible on TPU. Interpret
        # mode (CPU) is test-only/slow.
        return eligible and jax.default_backend() == "tpu"
    if merge_impl != "pallas":
        return False
    if not (algorithm == "prefix" and log_domain):
        raise ValueError("merge_impl='pallas' requires the log-domain "
                         "prefix algorithm")
    if topk_impl != "exact":
        raise ValueError("merge_impl='pallas' is exact-top-k only")
    if not lm_ok:
        raise ValueError("merge_impl='pallas' supports lm_bias only "
                         "for V <= 255; use merge_impl='matched'")
    if not shape_ok:
        raise ValueError("merge_impl='pallas' requires W <= 128 and "
                         "V <= 128, or W <= 64 and V <= 256")
    return True


def _pallas_scan(log_probs, init: _BeamState, W: int, V: int,
                 blank_id: int, lm_bias=None):
    """Fused-kernel replacement for the matched-merge lax.scan; returns
    (final _BeamState, packed_ys) array-equal to the XLA path.

    Runs the sel_mode="auto" kernel: a per-frame lax.cond between the
    slack and exact-tie selection paths. The branch-free "flag" kernel
    (DEAD-de-tied slack + whole-scan exact re-run on ys bit 31) was
    the r3 default for one bench run and is KEPT AS A KNOB, not the
    default — documented negative result: the official bench's logits
    carry real-score tie mass (the reference's final-ReLU quirk emits
    exact-zero logits, compat_final_relu), so the flag kernel's
    whole-scan fallback fired every decode and cost 2x (138.8 ms vs
    the auto kernel's 76 ms at flagship). The flag kernel's ~4 ms win
    exists only on tie-free inputs (73.2 vs 77.0 same-session probe,
    scripts/tpu_r3_breakdown.py); the auto kernel's per-frame cond is
    the robust shape of the same idea and is always exact."""
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  pack_state)
    B = init.s1.shape[0]
    interpret = jax.default_backend() != "tpu"
    packed = pack_state(init)

    def run(sel_mode):
        return fused_prefix_decode(log_probs, packed, W=W, V=V,
                                   blank_id=blank_id, interpret=interpret,
                                   lm_q=lm_bias, sel_mode=sel_mode)

    if interpret:
        # CPU tests: interpret-mode tracing unrolls the grid; the
        # always-exact kernel is single-trace and always correct. The
        # flag pipeline's semantics stay covered by direct-kernel
        # tests (test_pallas_decode.py::test_flag_mode_*).
        out = run("exact")
    else:
        out = run("auto")
    final = _BeamState(
        h1=out.h1, h2=out.h2, hp1=out.hp1, hp2=out.hp2,
        last=out.last, length=out.length,
        tb=jnp.zeros((B, W), jnp.int32),
        live=out.live, s1=out.s1, s2=out.s2)
    return final, out.ys


def _pick_step(B, W, V, blank_id, algorithm, log_domain, merge_impl,
               topk_impl="exact", lm_bias=None):
    if merge_impl not in ("auto", "matched", "sort"):
        raise ValueError(f"unknown merge_impl {merge_impl!r}")
    if topk_impl not in ("exact", "approx"):
        raise ValueError(f"unknown topk_impl {topk_impl!r}")
    use_fast = (algorithm == "prefix" and log_domain
                and merge_impl in ("auto", "matched"))
    if merge_impl == "matched" and not use_fast:
        raise ValueError("matched merge requires algorithm='prefix'")
    if lm_bias is not None and not use_fast:
        raise ValueError("lm_bias requires the matched-merge prefix path")
    if use_fast:
        return _make_frame_step_fast(B, W, V, blank_id, topk_impl, lm_bias)
    if topk_impl != "exact":
        raise ValueError("approx top-k requires the matched-merge path")
    return _make_frame_step(B, W, V, blank_id, algorithm, log_domain)


# ---------------------------------------------------------------- streaming

def streaming_init(batch_size: int, beam_width: int, max_len: int = 256,
                   log_domain: bool = True) -> StreamingState:
    """Fresh streaming decode state for a batch."""
    beam = _init_beam(batch_size, beam_width, log_domain)
    tokens = jnp.full((batch_size, beam_width, max_len), -1, jnp.int32)
    return StreamingState(beam=beam, tokens=tokens,
                          timesteps=jnp.full_like(tokens, -1),
                          frames=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "blank_id", "algorithm", "prob_domain", "is_final", "merge_impl",
    "active_len"))
def streaming_step(
    state: StreamingState,
    chunk_log_probs: jax.Array,          # [Tc, B, V]
    blank_id: int = 0,
    algorithm: str = "prefix",
    prob_domain: bool = False,
    is_final: bool = False,
    merge_impl: str = "auto",
    lm_bias: Optional[jax.Array] = None,
    active_len: Optional[int] = None,
) -> Tuple[StreamingState, BeamSearchResult]:
    """Advance the decode by one chunk; T is unbounded across calls.

    Beam state (hashes, scores) and materialized prefixes carry over;
    per-chunk work is identical to the batch path. `is_final` applies the
    reference algorithm's trailing-blank strip on the chunk's last frame.
    lm_bias follows the batch-path semantics (bf16 resolution, see
    ctc_beam_search). Returns the updated state and the current-best
    result snapshot.

    active_len (static): optional ACTIVE-PREFIX bound — the caller's
    promise that every materialized prefix so far is shorter than it
    (any value >= min(L, frames_so_far + Tc) is safe; a prefix grows
    by at most one token per frame). The per-chunk beam reorder +
    overlay then run on [*, *, :active_len] only and the frozen all-
    (-1) tail is re-attached as a constant pad — early chunks of a
    long-max_len stream skip most of the buffer pass (r5: the reorder
    + overlay were measured as the whole streaming-vs-batch gap).
    Distinct values compile separate programs; round up (e.g. to a
    multiple of 64) to bound the variant count.
    """
    log_domain = not prob_domain
    Tc, B, V = chunk_log_probs.shape
    W = state.beam.s1.shape[1]
    fast_in = state.meta.shape[0] > 0
    L = state.meta.shape[0] if fast_in else state.tokens.shape[2]
    if lm_bias is not None:
        lm_bias = lm_bias.astype(jnp.bfloat16).astype(jnp.float32) + 0.0

    tb_impl = "scan"
    if _use_pallas(merge_impl, algorithm, log_domain, W, V, "exact",
                   lm_bias):
        final, packed_ys = _pallas_scan(chunk_log_probs, state.beam,
                                        W, V, blank_id, lm_bias=lm_bias)
        tb_impl = "pallas"
    else:
        frame_step = _pick_step(B, W, V, blank_id, algorithm, log_domain,
                                merge_impl, lm_bias=lm_bias)
        is_last_arr = jnp.zeros((Tc,), jnp.bool_)
        if algorithm == "reference" and is_final:
            is_last_arr = is_last_arr.at[Tc - 1].set(True)

        final, packed_ys = lax.scan(
            frame_step, state.beam, (chunk_log_probs, is_last_arr))

    from gasr_tpu.ops.pallas.fused_decode import (
        traceback_overlay_blk, traceback_overlay_pallas)
    use_fused_tb = (tb_impl == "pallas"
                    and traceback_overlay_blk(L) >= 8)
    if use_fused_tb:
        # fused traceback + beam reorder + overlay: ONE kernel per
        # chunk, state buffers carried in kernel layout across chunks
        # (the r5 stage profile measured the per-chunk XLA reorder +
        # overlay fusions as the whole streaming-vs-batch gap)
        interpret = jax.default_backend() != "tpu"
        Lp = -(-(L + 1) // 8) * 8
        SK = 128
        if fast_in:
            base_tok, base_ts = state.tokens, state.timesteps
        else:
            def to_kernel(buf):
                t = jnp.transpose(buf, (0, 2, 1))        # [B, L, W]
                return jnp.pad(t, ((0, 0), (0, Lp - L), (0, SK - W)),
                               constant_values=-1)
            base_tok = to_kernel(state.tokens)
            base_ts = to_kernel(state.timesteps)
        tok_k, ts_k, _ = traceback_overlay_pallas(
            packed_ys, final.length, L, base_tok, base_ts,
            state.frames, interpret=interpret)
        tokens = jnp.transpose(tok_k[:, :L, :W], (0, 2, 1))
        timesteps = jnp.transpose(ts_k[:, :L, :W], (0, 2, 1))
        new_state = StreamingState(beam=final, tokens=tok_k,
                                   timesteps=ts_k,
                                   frames=state.frames + Tc,
                                   meta=jnp.zeros((L,), jnp.int32))
        return new_state, _result(final, tokens, timesteps, L,
                                  algorithm, log_domain)

    if fast_in:
        # kernel-layout state but this chunk can't take the fused
        # kernel (e.g. merge_impl changed mid-stream): convert back
        def from_kernel(buf):
            return jnp.transpose(buf[:, :L, :W], (0, 2, 1))
        state = state._replace(tokens=from_kernel(state.tokens),
                               timesteps=from_kernel(state.timesteps),
                               meta=np.zeros((0,), np.int32))

    La = L if active_len is None else max(8, min(L, active_len))
    tokens, timesteps, _ = _traceback(
        packed_ys, final.length, La,
        base_tokens=state.tokens[:, :, :La],
        base_timesteps=state.timesteps[:, :, :La],
        t_offset=state.frames, impl=tb_impl)
    if La < L:
        # the tail is untouched by contract (all -1 sentinels)
        pad = ((0, 0), (0, 0), (0, L - La))
        tokens = jnp.pad(tokens, pad, constant_values=-1)
        timesteps = jnp.pad(timesteps, pad, constant_values=-1)
    new_state = StreamingState(beam=final, tokens=tokens,
                               timesteps=timesteps,
                               frames=state.frames + Tc)
    return new_state, _result(final, tokens, timesteps, L, algorithm,
                              log_domain)


def decode_to_lists(result: BeamSearchResult, top: int = 1):
    """Host-side: result -> list (per example) of (token_list, score)."""
    tokens = np.asarray(result.tokens)
    lengths = np.asarray(result.lengths)
    scores = np.asarray(result.scores)
    L = tokens.shape[2]
    out = []
    for b in range(tokens.shape[0]):
        beams = []
        for w in range(min(top, tokens.shape[1])):
            n = min(int(lengths[b, w]), L)
            beams.append((tokens[b, w, :n].tolist(), float(scores[b, w])))
        out.append(beams if top > 1 else beams[0])
    return out
