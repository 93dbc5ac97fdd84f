"""Fused Pallas decode kernel vs the XLA matched-merge oracle.

Runs in interpret mode on CPU (conftest). The gate is ARRAY EQUALITY:
the kernel replicates the matched-merge scan's candidate formulas, its
exact top-k tie-break (threshold + index-order quota == lax.top_k's
stable order), and its slot ordering (bitonic by (score desc, index
asc)) — so tokens, lengths, scores, backpointers, and even dead-slot
contents must match bit-for-bit."""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.decoder.beam_search import (ctc_beam_search, streaming_init,
                                          streaming_step)


def _logits(rng, T, B, V, quantize=None):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    if quantize is not None:
        x = np.round(x * quantize) / quantize  # tie-heavy
    x = jnp.asarray(x)
    return x - jnp.log(jnp.sum(jnp.exp(x), axis=-1, keepdims=True))


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.lengths),
                                  np.asarray(b.lengths))
    np.testing.assert_array_equal(np.asarray(a.overflow),
                                  np.asarray(b.overflow))
    np.testing.assert_array_equal(np.asarray(a.timesteps),
                                  np.asarray(b.timesteps))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=0, atol=0)


@pytest.mark.parametrize("W,V,T,B", [
    pytest.param(5, 17, 6, 2, marks=pytest.mark.slow),
    (16, 29, 6, 2),
    (100, 47, 6, 2),     # flagship slot/vocab ratios
    (128, 12, 6, 2),     # W == full slot width, W >> V (dead-slot heavy)
])
def test_pallas_equals_matched(W, V, T, B):
    rng = np.random.default_rng(hash((W, V, T, B)) % (2**32))
    lp = _logits(rng, T, B, V)
    ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched",
                          max_len=16)
    got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                          max_len=16)
    _assert_same(got, ref)


@pytest.mark.parametrize("W,V,T,B", [
    (6, 5, 6, 2),        # pack=1 (W <= 8)
    pytest.param(20, 23, 6, 2, marks=pytest.mark.slow),   # pack=2
    (6, 129, 4, 2),      # VPX=256 vocab tiling + row-half LM tables (r4)
    pytest.param(6, 140, 4, 2, marks=pytest.mark.slow),   # uneven rows
])
def test_pallas_lm_bias_equals_matched(W, V, T, B):
    # shallow-fusion LM bias rides the kernel (one-hot MXU table
    # lookups); both paths apply the bf16-quantized table, so the
    # results must still be ARRAY-EQUAL.
    rng = np.random.default_rng(hash(("lm", W, V)) % (2**32))
    lp = _logits(rng, T, B, V)
    lm = jnp.asarray(
        rng.standard_normal((V + 1, V)).astype(np.float32) * 2.0)
    ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched",
                          max_len=16, lm_bias=lm)
    got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                          max_len=16, lm_bias=lm)
    _assert_same(got, ref)
    # and the bias must actually do something vs no-LM decode
    base = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                           max_len=16)
    assert not np.array_equal(np.asarray(base.scores),
                              np.asarray(got.scores))


def test_pallas_tie_heavy():
    # coarsely quantized log-probs force score ties at the beam boundary:
    # exercises the threshold-quota tie admission against lax.top_k
    rng = np.random.default_rng(7)
    lp = _logits(rng, 7, 2, 9, quantize=2)
    ref = ctc_beam_search(lp, beam_width=8, merge_impl="matched",
                          max_len=12)
    got = ctc_beam_search(lp, beam_width=8, merge_impl="pallas",
                          max_len=12)
    _assert_same(got, ref)


def test_pallas_tie_heavy_packed():
    # W >= 16 and V <= 64 engage the pack-2 grid layout; quantized
    # log-probs force threshold ties, exercising the packed exact-tie
    # path whose eq-rank must be LEX (w, v) — h-major — order, not the
    # packed flat order (fused_decode._sel_exact)
    rng = np.random.default_rng(17)
    lp = _logits(rng, 7, 2, 11, quantize=2)
    ref = ctc_beam_search(lp, beam_width=16, merge_impl="matched",
                          max_len=14)
    got = ctc_beam_search(lp, beam_width=16, merge_impl="pallas",
                          max_len=14)
    _assert_same(got, ref)


def test_pallas_pack_forced_equivalence():
    # pack=1 and pack=2 must produce ARRAY-IDENTICAL kernel outputs
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  pack_state)
    from gasr_tpu.decoder.beam_search import _init_beam
    rng = np.random.default_rng(23)
    T, B, V, W = 6, 2, 21, 24
    lp = _logits(rng, T, B, V)
    init = pack_state(_init_beam(B, W, True))
    outs = [fused_prefix_decode(lp, init, W=W, V=V, interpret=True,
                                pack=p) for p in (1, 2)]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_uniform_ties():
    # all-equal frames: maximal degeneracy
    lp = jnp.full((6, 2, 7), -np.log(7.0), jnp.float32)
    ref = ctc_beam_search(lp, beam_width=6, merge_impl="matched",
                          max_len=8)
    got = ctc_beam_search(lp, beam_width=6, merge_impl="pallas",
                          max_len=8)
    _assert_same(got, ref)


def test_pallas_single_frame_and_batch_pad():
    # T=1 and B not a multiple of the kernel batch tile
    rng = np.random.default_rng(3)
    lp = _logits(rng, 1, 5, 11)
    ref = ctc_beam_search(lp, beam_width=4, merge_impl="matched")
    got = ctc_beam_search(lp, beam_width=4, merge_impl="pallas")
    _assert_same(got, ref)


def test_pallas_variable_lengths():
    rng = np.random.default_rng(11)
    lp = _logits(rng, 8, 3, 13)
    lens = jnp.asarray([8, 3, 5], jnp.int32)
    ref = ctc_beam_search(lp, beam_width=6, merge_impl="matched",
                          input_lengths=lens, max_len=16)
    got = ctc_beam_search(lp, beam_width=6, merge_impl="pallas",
                          input_lengths=lens, max_len=16)
    _assert_same(got, ref)


def test_pallas_streaming_matches_batch():
    rng = np.random.default_rng(5)
    T, B, V, W = 8, 2, 9, 5
    lp = _logits(rng, T, B, V)
    full = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                           max_len=16)
    st = streaming_init(B, W, max_len=16)
    for s in range(0, T, 4):
        st, res = streaming_step(st, lp[s:s + 4], merge_impl="pallas")
    _assert_same(res, full)


def test_flag_mode_equals_exact_when_no_overflow():
    """sel_mode='flag' (the TPU default: branch-free DEAD-de-tied slack
    selection) matches the always-exact kernel array-for-array on
    non-degenerate inputs, with no ys bit-31 flags."""
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  pack_state)
    from gasr_tpu.decoder.beam_search import _init_beam
    rng = np.random.default_rng(41)
    T, B, V, W = 6, 2, 17, 12
    lp = _logits(rng, T, B, V)
    init = pack_state(_init_beam(B, W, True))
    a = fused_prefix_decode(lp, init, W=W, V=V, interpret=True,
                            sel_mode="flag")
    b = fused_prefix_decode(lp, init, W=W, V=V, interpret=True,
                            sel_mode="exact")
    assert (np.asarray(a.ys) >= 0).all()          # no overflow flags
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flag_mode_flags_tie_overflow():
    """Uniform logits: > 128 real candidates tie at the threshold, so
    the flag kernel must raise ys bit 31 (the caller then re-runs
    exact — the _pallas_scan fallback contract)."""
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  pack_state)
    from gasr_tpu.decoder.beam_search import _init_beam
    T, B, V, W = 4, 2, 19, 16
    lp = jnp.full((T, B, V), -np.log(float(V)), jnp.float32)
    init = pack_state(_init_beam(B, W, True))
    out = fused_prefix_decode(lp, init, W=W, V=V, interpret=True,
                              sel_mode="flag")
    assert (np.asarray(out.ys) < 0).any()


def test_pallas_rejects_unsupported():
    lp = jnp.zeros((2, 1, 5), jnp.float32)
    with pytest.raises(ValueError):
        ctc_beam_search(lp, beam_width=3, merge_impl="pallas",
                        algorithm="reference")
    with pytest.raises(ValueError):
        # lm_bias is kernel-supported through V <= 255 (row-half
        # tables); V = 256 needs 257 rows > 2*VP and must reject
        ctc_beam_search(jnp.zeros((2, 1, 256), jnp.float32),
                        beam_width=3, merge_impl="pallas",
                        lm_bias=jnp.zeros((257, 256)))
    with pytest.raises(ValueError):
        # V > 256 is out of kernel range entirely
        ctc_beam_search(jnp.zeros((2, 1, 300), jnp.float32),
                        beam_width=3, merge_impl="pallas")
    with pytest.raises(ValueError):
        # 128 < V <= 256 requires W <= 64
        ctc_beam_search(jnp.zeros((2, 1, 200), jnp.float32),
                        beam_width=100, merge_impl="pallas")


@pytest.mark.parametrize("W,V,T,B", [
    (16, 129, 5, 2),      # conformer vocab: one past the 128-lane tile
    pytest.param(8, 256, 4, 2, marks=pytest.mark.slow),  # two-tile width
])
def test_pallas_vocab_tiled(W, V, T, B):
    # V > 128 rides two vocab lane tiles (VPX=256, take_f split gathers)
    rng = np.random.default_rng(hash(("vt", W, V)) % (2**32))
    lp = _logits(rng, T, B, V)
    ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched",
                          max_len=12)
    got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                          max_len=12)
    _assert_same(got, ref)


def test_pallas_vocab_tiled_tie_heavy():
    rng = np.random.default_rng(31)
    lp = _logits(rng, 5, 2, 140, quantize=2)
    ref = ctc_beam_search(lp, beam_width=12, merge_impl="matched",
                          max_len=12)
    got = ctc_beam_search(lp, beam_width=12, merge_impl="pallas",
                          max_len=12)
    _assert_same(got, ref)


@pytest.mark.parametrize("W,V,T,B,tie", [
    (8, 13, 6, 2, False),
    (100, 47, 5, 2, False),    # flagship ratios (pack=2)
    (12, 13, 7, 2, True),      # uniform logits: hash-twin tie mass
])
def test_match_impl_sorted(W, V, T, B, tie):
    """The sorted-hash parent match (bitonic 4-key sort + branchless
    lower-bound join) is bit-equal to the O(Wg*S) compare-grid match
    on every output field, including hash-twin ties (first-live-match
    semantics via the idx-ascending equal-key run)."""
    from gasr_tpu.decoder.beam_search import _init_beam
    from gasr_tpu.ops.pallas.fused_decode import (fused_prefix_decode,
                                                  pack_state)
    rng = np.random.default_rng(hash(("ms", W, V)) % (2**32))
    if tie:
        lp = jnp.asarray(np.full((T, B, V), -np.log(V), np.float32))
    else:
        lp = _logits(rng, T, B, V)
    init = pack_state(_init_beam(B, W, True))
    a = fused_prefix_decode(lp, init, W=W, V=V, interpret=True,
                            sel_mode="exact", match_impl="grid")
    b = fused_prefix_decode(lp, init, W=W, V=V, interpret=True,
                            sel_mode="exact", match_impl="sorted")
    for f in a._fields:
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)),
                                      err_msg=f)
