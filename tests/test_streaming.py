"""Streaming (chunked) decode must equal full-utterance decode."""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.decoder.beam_search import (
    decode_to_lists, streaming_init, streaming_step)


def rand_logprobs(rng, T, B, V):
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("algorithm", ["prefix", "reference"])
@pytest.mark.parametrize("chunks", [[5, 5, 5], [1, 7, 4, 3], [15]])
def test_streaming_equals_batch(algorithm, chunks):
    rng = np.random.default_rng(sum(chunks) * 7 + len(chunks))
    T, B, V, W = sum(chunks), 3, 5, 6
    lp = rand_logprobs(rng, T, B, V)

    full = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=32,
                           algorithm=algorithm)

    state = streaming_init(B, W, max_len=32)
    t = 0
    for i, c in enumerate(chunks):
        state, snap = streaming_step(
            state, jnp.asarray(lp[t:t + c]), algorithm=algorithm,
            is_final=(i == len(chunks) - 1))
        t += c

    np.testing.assert_array_equal(np.asarray(snap.lengths),
                                  np.asarray(full.lengths))
    np.testing.assert_allclose(np.asarray(snap.scores),
                               np.asarray(full.scores), rtol=1e-5)
    for b in range(B):
        for w in range(W):
            n = int(full.lengths[b, w])
            assert (np.asarray(snap.tokens)[b, w, :n].tolist()
                    == np.asarray(full.tokens)[b, w, :n].tolist())


@pytest.mark.parametrize("chunks", [[5, 1, 7, 2], [8, 8], [1] * 9])
def test_streaming_pallas_relative_traceback_equals_batch(chunks):
    """The fused-kernel streaming path (chunk-relative traceback at
    static L_eff = Tc + shifted-gather overlay, r4) must stay
    array-equal to the batch pallas decode — tokens, timesteps,
    lengths, scores."""
    rng = np.random.default_rng(sum(chunks) * 13 + len(chunks))
    T, B, V, W = sum(chunks), 3, 29, 32
    lp = rand_logprobs(rng, T, B, V)
    full = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=32,
                           merge_impl="pallas")
    state = streaming_init(B, W, max_len=32)
    t = 0
    for c in chunks:
        state, snap = streaming_step(state, jnp.asarray(lp[t:t + c]),
                                     merge_impl="pallas")
        t += c
    np.testing.assert_array_equal(np.asarray(snap.lengths),
                                  np.asarray(full.lengths))
    np.testing.assert_allclose(np.asarray(snap.scores),
                               np.asarray(full.scores), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(snap.tokens),
                                  np.asarray(full.tokens))
    np.testing.assert_array_equal(np.asarray(snap.timesteps),
                                  np.asarray(full.timesteps))


def test_streaming_pallas_relative_overflow_clamp():
    """Chunk emissions whose absolute position lands >= max_len must be
    dropped (head-keeping), exactly like the batch path's overflow
    clamp — exercises the rel-window overlay when final lengths exceed
    L."""
    rng = np.random.default_rng(99)
    T, B, V, W = 24, 2, 29, 16
    # low blank mass -> long outputs that overflow a tiny max_len
    x = rng.standard_normal((T, B, V)).astype(np.float32)
    x[:, :, 0] -= 4.0
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    L = 8
    full = ctc_beam_search(lp, beam_width=W, max_len=L,
                           merge_impl="pallas")
    assert bool(np.asarray(full.overflow).any()), "test needs overflow"
    state = streaming_init(B, W, max_len=L)
    for t0, t1 in ((0, 9), (9, 10), (10, 24)):
        state, snap = streaming_step(state, lp[t0:t1],
                                     merge_impl="pallas")
    np.testing.assert_array_equal(np.asarray(snap.tokens),
                                  np.asarray(full.tokens))
    np.testing.assert_array_equal(np.asarray(snap.lengths),
                                  np.asarray(full.lengths))
    np.testing.assert_array_equal(np.asarray(snap.overflow),
                                  np.asarray(full.overflow))


def test_streaming_lm_bias_equals_batch():
    """LM shallow fusion carries across chunk boundaries identically."""
    rng = np.random.default_rng(11)
    T, B, V, W = 14, 2, 5, 6
    lp = rand_logprobs(rng, T, B, V)
    lm = jnp.asarray(rng.standard_normal((V + 1, V)).astype(np.float32))

    full = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=32,
                           lm_bias=lm)
    state = streaming_init(B, W, max_len=32)
    for t0, t1 in ((0, 6), (6, 9), (9, 14)):
        state, snap = streaming_step(state, jnp.asarray(lp[t0:t1]),
                                     lm_bias=lm)
    np.testing.assert_array_equal(np.asarray(snap.lengths),
                                  np.asarray(full.lengths))
    np.testing.assert_allclose(np.asarray(snap.scores),
                               np.asarray(full.scores), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(snap.tokens),
                                  np.asarray(full.tokens))


def test_streaming_intermediate_snapshots_valid():
    """Every intermediate snapshot is a valid decode of the prefix seen."""
    rng = np.random.default_rng(0)
    T, B, V, W = 12, 2, 4, 4
    lp = rand_logprobs(rng, T, B, V)
    state = streaming_init(B, W, max_len=16)
    for t_end in (4, 8):
        state2, snap = streaming_step(state, jnp.asarray(lp[t_end - 4:t_end]))
        want = ctc_beam_search(jnp.asarray(lp[:t_end]), beam_width=W,
                               max_len=16)
        got = decode_to_lists(snap)
        exp = decode_to_lists(want)
        assert [g[0] for g in got] == [w[0] for w in exp]
        state = state2


def test_pipeline_streaming_equals_batch():
    """End-to-end: chunked model forward (carried RNN state) + chunked
    beam decode == one-shot transcribe."""
    import jax
    from gasr_tpu.config import Config
    from gasr_tpu.infer import Pipeline
    cfg = Config(batch_size=2, input_size=6, n_context=1, linear_size=16,
                 rnn_hidden_size=16, vocab_size=5, seg_len=12,
                 beam_width=4, decode_max_len=16)
    pipe = Pipeline(cfg)
    feats = jax.random.uniform(jax.random.PRNGKey(3),
                               (2, 12, cfg.feat_size))
    want = pipe.transcribe(feats)
    got = pipe.transcribe_streaming(
        [feats[:, :5], feats[:, 5:9], feats[:, 9:]])
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        np.testing.assert_allclose(gs, ws, rtol=1e-5)


def test_pipeline_streaming_rejects_non_streamable():
    import jax
    from gasr_tpu.config import Config
    from gasr_tpu.infer import Pipeline
    cfg = Config(model="bilstm", batch_size=1, input_size=4, n_context=0,
                 rnn_hidden_size=8, bidirectional=True, vocab_size=3,
                 seg_len=6)
    pipe = Pipeline(cfg)
    with pytest.raises(ValueError):
        pipe.transcribe_streaming([jax.numpy.zeros((1, 3, 4))])


def test_transcribe_audio_end_to_end():
    """Raw audio -> native log-mel -> model -> variable-length beam
    decode -> text, with unequal utterance lengths."""
    import numpy as np
    from gasr_tpu.config import Config
    from gasr_tpu.infer import Pipeline
    pytest.importorskip("gasr_tpu.native")
    rng = np.random.default_rng(0)
    cfg = Config(batch_size=2, input_size=13, n_context=1, linear_size=16,
                 rnn_hidden_size=16, vocab_size=27, seg_len=0,
                 beam_width=4, decode_max_len=32)
    pipe = Pipeline(cfg)
    audio = [rng.standard_normal(8000).astype(np.float32),
             rng.standard_normal(4800).astype(np.float32)]
    texts = pipe.transcribe_audio(audio, sample_rate=16000)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


def test_streaming_active_len_equals_default():
    """The active-prefix bound (r5: skips the frozen tail of the
    reorder+overlay pass) must be invisible in results — bit-equal
    states and snapshots vs the default full-L path, across fuzzed
    chunkings and both traceback impls' shapes."""
    rng = np.random.default_rng(42)
    for chunks, B, V, W, L in [([5, 5, 5], 3, 5, 6, 64),
                               ([20, 20, 20, 20], 4, 7, 8, 128),
                               ([1, 9, 2, 8], 2, 6, 4, 96)]:
        T = sum(chunks)
        lp = rand_logprobs(rng, T, B, V)
        sa = streaming_init(B, W, max_len=L)
        sb = streaming_init(B, W, max_len=L)
        t = 0
        for i, c in enumerate(chunks):
            chunk = jnp.asarray(lp[t:t + c])
            la = min(L, -(-(t + c) // 16) * 16)
            sa, ra = streaming_step(sa, chunk, active_len=la)
            sb, rb = streaming_step(sb, chunk)
            t += c
            np.testing.assert_array_equal(np.asarray(sa.tokens),
                                          np.asarray(sb.tokens))
            np.testing.assert_array_equal(np.asarray(sa.timesteps),
                                          np.asarray(sb.timesteps))
            np.testing.assert_array_equal(np.asarray(ra.lengths),
                                          np.asarray(rb.lengths))
            np.testing.assert_allclose(np.asarray(ra.scores),
                                       np.asarray(rb.scores))


def test_streaming_layout_fallback_mid_stream():
    """Kernel-layout state (fused pallas chunks) followed by an XLA
    chunk (merge_impl='matched') must convert back transparently —
    results equal an all-XLA stream bit-for-bit (the pallas scan is
    array-equal to matched by contract)."""
    rng = np.random.default_rng(7)
    T, B, V, W, L = 15, 2, 5, 6, 32
    lp = rand_logprobs(rng, T, B, V)
    sa = streaming_init(B, W, max_len=L)
    sb = streaming_init(B, W, max_len=L)
    impls_a = ["pallas", "pallas", "matched"]   # fallback on chunk 3
    for c in range(3):
        chunk = jnp.asarray(lp[c * 5:(c + 1) * 5])
        sa, ra = streaming_step(sa, chunk, merge_impl=impls_a[c])
        sb, rb = streaming_step(sb, chunk, merge_impl="matched")
    assert sa.meta.shape[0] == 0          # back to public layout
    np.testing.assert_array_equal(np.asarray(sa.tokens),
                                  np.asarray(sb.tokens))
    np.testing.assert_array_equal(np.asarray(ra.timesteps),
                                  np.asarray(rb.timesteps))
    np.testing.assert_array_equal(np.asarray(ra.lengths),
                                  np.asarray(rb.lengths))


def test_streaming_large_chunk_fused():
    """Chunks larger than 128 frames (the old chunk-relative path's
    cap) ride the fused traceback+overlay kernel too — equality vs
    batch for a 150+50 split."""
    rng = np.random.default_rng(11)
    T, B, V, W, L = 200, 2, 5, 6, 64
    lp = rand_logprobs(rng, T, B, V)
    full = ctc_beam_search(jnp.asarray(lp), beam_width=W, max_len=L,
                           merge_impl="pallas")
    st = streaming_init(B, W, max_len=L)
    res = None
    for lo, hi in [(0, 150), (150, 200)]:
        st, res = streaming_step(st, jnp.asarray(lp[lo:hi]),
                                 merge_impl="pallas")
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(full.tokens))
    np.testing.assert_array_equal(np.asarray(res.timesteps),
                                  np.asarray(full.timesteps))
