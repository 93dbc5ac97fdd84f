"""Native library: build, timer, log-mel frontend, CPU beam decoder."""

import numpy as np
import pytest

native = pytest.importorskip("gasr_tpu.native")


def test_build_and_timer():
    t0 = native.current_seconds()
    t1 = native.current_seconds()
    assert t1 >= t0
    assert t1 - t0 < 1.0


def test_logmel_sine():
    """A pure tone must put its energy in the right mel bin."""
    sr, f = 16000, 1000.0
    t = np.arange(sr, dtype=np.float32) / sr            # 1 s
    audio = np.sin(2 * np.pi * f * t).astype(np.float32)
    feats = native.logmel(audio, sample_rate=sr, n_fft=512, hop=160,
                          n_mels=40)
    assert feats.shape == (1 + (sr - 512) // 160, 40)
    assert np.isfinite(feats).all()
    # peak mel bin should be identical across frames and correspond to
    # ~1 kHz (mel 40-band over 0-8 kHz: 1 kHz ~ bin 15 +/- 4)
    peaks = feats.argmax(axis=1)
    assert (peaks == peaks[0]).all()
    assert 8 <= peaks[0] <= 22


def test_logmel_matches_numpy_reference():
    """Cross-check the native FFT+mel path against a NumPy pipeline."""
    rng = np.random.default_rng(0)
    sr, n_fft, hop, n_mels = 8000, 256, 80, 23
    audio = rng.standard_normal(4000).astype(np.float32)
    got = native.logmel(audio, sample_rate=sr, n_fft=n_fft, hop=hop,
                        n_mels=n_mels)

    # NumPy reference with identical conventions
    n_frames = 1 + (len(audio) - n_fft) // hop
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack([audio[i * hop:i * hop + n_fft] * win
                       for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, n=n_fft)) ** 2

    def hz2mel(h):
        return 2595 * np.log10(1 + h / 700)

    def mel2hz(m):
        return 700 * (10 ** (m / 2595) - 1)

    mel_pts = mel2hz(np.linspace(hz2mel(0), hz2mel(sr / 2), n_mels + 2))
    bins = np.floor((n_fft + 1) * mel_pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, c, hi = bins[m], bins[m + 1], bins[m + 2]
        for b in range(lo, c):
            if c > lo:
                fb[m, b] = (b - lo) / (c - lo)
        for b in range(c, min(hi, n_fft // 2 + 1)):
            if hi > c:
                fb[m, b] = (hi - b) / (hi - c)
    want = np.log(spec @ fb.T + 1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cpu_beam_decoder_matches_oracle():
    from gasr_tpu.decoder.numpy_oracle import prefix_beam_search_np
    rng = np.random.default_rng(1)
    T, B, V, W = 15, 4, 6, 8
    lp = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    tokens, lens, scores = native.cpu_beam_decode_batch(
        lp, beam_width=W, blank_id=0, max_len=32, num_threads=2)
    for b in range(B):
        want_ids, want_score = prefix_beam_search_np(lp[:, b], W, 0)
        got = tokens[b, :lens[b]].tolist()
        assert got == want_ids, f"b={b}: {got} != {want_ids}"
        np.testing.assert_allclose(scores[b], want_score, rtol=1e-4)


def test_cpu_beam_decoder_matches_jax():
    import jax.numpy as jnp
    from gasr_tpu.decoder import ctc_beam_search
    from gasr_tpu.decoder.beam_search import decode_to_lists
    rng = np.random.default_rng(2)
    T, B, V, W = 25, 3, 10, 12
    lp = rng.standard_normal((T, B, V)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    tokens, lens, scores = native.cpu_beam_decode_batch(
        lp, beam_width=W, blank_id=0, max_len=64, num_threads=3)
    res = decode_to_lists(ctc_beam_search(jnp.asarray(lp), beam_width=W,
                                          max_len=64))
    for b in range(B):
        assert tokens[b, :lens[b]].tolist() == res[b][0]
