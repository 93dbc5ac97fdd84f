"""Decode dispatch robustness: no input shape may become a compile error.

Round-1 regression (VERDICT.md): the fused-decode traceback kernel
hardcoded its batch block to 64, whose two persistent [64, Lp, 128]
VMEM output blocks OOM the 16 MB scoped-VMEM limit at max_len=256 —
the flagship bench shape — while the kernel had only been validated at
L=64. These tests pin (a) the static VMEM-budget sizing, (b) the
automatic scan-traceback fallback when the budget cannot fit, and
(c) that the dispatcher produces correct results across the max_len
sweep. A TPU compile probe lives in scripts/tpu_check_traceback.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gasr_tpu.decoder.beam_search import (ctc_beam_search, _init_beam,
                                          _pallas_scan, _traceback)
from gasr_tpu.ops.pallas.fused_decode import (_round_up, traceback_vmem_blk,
                                              S, _TB_OUT_BUDGET)


def test_vmem_blk_budget_math():
    # the sizing rule itself: outputs 2 * BBLK * Lp * S * 4 bytes fit
    # the budget, and BBLK+8 would not (or BBLK is the 64 cap)
    for L in (16, 64, 100, 256, 300, 512, 1000, 1024, 1529):
        blk = traceback_vmem_blk(L)
        Lp = _round_up(L + 1, 8)
        assert blk % 8 == 0
        assert blk >= 8, f"L={L} must be kernel-eligible"
        assert 2 * blk * Lp * S * 4 <= _TB_OUT_BUDGET
        if blk < 64:
            assert 2 * (blk + 8) * Lp * S * 4 > _TB_OUT_BUDGET


def test_vmem_blk_flagship_regression():
    # the exact round-1 failure: L=256 with BBLK=64 needs 17.3 MB of
    # output blocks; the sizer must pick something strictly smaller
    assert traceback_vmem_blk(64) == 64          # round-1 validated shape
    blk = traceback_vmem_blk(256)                # round-1 BROKEN shape
    assert 8 <= blk < 64
    # far past the budget: kernel ineligible, callers must fall back
    assert traceback_vmem_blk(4096) == 0


@pytest.mark.parametrize("max_len", [64, 256, 1024, 4096])
def test_traceback_dispatch_sweep(max_len):
    """impl="pallas" must work (kernel or silent scan fallback) and be
    bit-equal to the scan walk at every max_len."""
    B, T, V, W = 4, 10, 13, 8
    rng = np.random.default_rng(max_len)
    lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
    lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
    final, ys = _pallas_scan(lp, _init_beam(B, W, True), W, V, 0)
    tok_p, ts_p, sp_p = _traceback(ys, final.length, max_len, impl="pallas")
    tok_s, ts_s, sp_s = _traceback(ys, final.length, max_len, impl="scan")
    np.testing.assert_array_equal(np.asarray(tok_p), np.asarray(tok_s))
    np.testing.assert_array_equal(np.asarray(ts_p), np.asarray(ts_s))
    np.testing.assert_array_equal(np.asarray(sp_p), np.asarray(sp_s))


@pytest.mark.parametrize("max_len", [64, 1024])
def test_e2e_decode_max_len_sweep(max_len):
    """Full ctc_beam_search through merge_impl="pallas" at max_lens on
    both sides of the kernel-eligibility boundary."""
    B, T, V, W = 2, 8, 11, 6
    rng = np.random.default_rng(max_len + 1)
    lp = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
    lp = lp - jax.scipy.special.logsumexp(lp, axis=-1, keepdims=True)
    ref = ctc_beam_search(lp, beam_width=W, merge_impl="matched",
                          max_len=max_len)
    got = ctc_beam_search(lp, beam_width=W, merge_impl="pallas",
                          max_len=max_len)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=0, atol=0)
