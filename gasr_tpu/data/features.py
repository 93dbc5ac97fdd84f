"""Feature extraction: audio -> log-mel, JAX (device) and native (host).

The reference has no feature pipeline (its inputs are random/hard-coded
tensors, main.cpp:38, baseline/main.py:39). A deployable ASR framework
needs one. Two paths with identical conventions:

  - `logmel_jax`: on-device, jit/vmap-able (framing -> Hann -> rFFT ->
    mel filterbank -> log). Use when audio already sits in HBM or for
    training augmentation pipelines.
  - `gasr_tpu.native.logmel`: C++ host frontend for the data loader
    (see gasr_native.cpp), same math, validated against this one.

Also provides `add_context`: the reference's n_context frame-stacking
(baseline/model.py:23 input_size*(1+2*n_context)).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                    fmin: float, fmax: float) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1], HTK mel scale,
    integer-bin vertices (matches gasr_native.cpp gasr_logmel)."""
    def hz2mel(h):
        return 2595.0 * np.log10(1.0 + h / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    if fmax <= 0:
        fmax = sample_rate / 2.0
    pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for m in range(n_mels):
        lo, c, hi = bins[m], bins[m + 1], bins[m + 2]
        for b in range(lo, c):
            if c > lo:
                fb[m, b] = (b - lo) / (c - lo)
        for b in range(c, min(hi, n_fft // 2 + 1)):
            if hi > c:
                fb[m, b] = (hi - b) / (hi - c)
    return fb


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "n_fft", "hop", "n_mels", "fmin", "fmax"))
def logmel_jax(audio: jax.Array, sample_rate: int = 16000, n_fft: int = 512,
               hop: int = 160, n_mels: int = 80, fmin: float = 0.0,
               fmax: float = 0.0) -> jax.Array:
    """audio [..., n] -> log-mel [..., n_frames, n_mels] (center=False)."""
    n = audio.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])                  # [F, n_fft]
    frames = audio[..., idx]                              # [..., F, n_fft]
    window = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(n_fft) / n_fft)
    spec = jnp.fft.rfft(frames * window, n=n_fft)
    power = jnp.abs(spec).astype(jnp.float32) ** 2
    fb = jnp.asarray(_mel_filterbank(sample_rate, n_fft, n_mels, fmin,
                                     fmax))
    mel = jnp.einsum("...fb,mb->...fm", power, fb,
                     preferred_element_type=jnp.float32)
    return jnp.log(mel + 1e-10)


def cmvn(feats: jax.Array, lengths=None, eps: float = 1e-8) -> jax.Array:
    """Per-utterance cepstral mean/variance normalization over time.

    feats [..., T, F] -> zero-mean unit-variance per (utterance,
    feature). The standard ASR frontend step the reference lacks (its
    inputs are random tensors); enabled via Config.cmvn and applied by
    Pipeline.transcribe_audio. When `lengths` [...] is given, padded
    frames (t >= length) are excluded from the statistics and zeroed.
    """
    if lengths is None:
        m = jnp.mean(feats, axis=-2, keepdims=True)
        v = jnp.var(feats, axis=-2, keepdims=True)
        return (feats - m) / jnp.sqrt(v + eps)
    T = feats.shape[-2]
    mask = (jnp.arange(T)[:, None] <
            jnp.asarray(lengths)[..., None, None]).astype(feats.dtype)
    n = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 1.0)
    m = jnp.sum(feats * mask, axis=-2, keepdims=True) / n
    v = jnp.sum((feats - m) ** 2 * mask, axis=-2, keepdims=True) / n
    return (feats - m) / jnp.sqrt(v + eps) * mask


def add_context(feats: jax.Array, n_context: int) -> jax.Array:
    """Frame stacking: [.., T, F] -> [.., T, F*(1+2*n_context)].

    Reproduces the baseline's context windows (model.py:23): each frame
    is concatenated with n_context frames on each side (edge-padded).
    """
    if n_context == 0:
        return feats
    T = feats.shape[-2]
    pads = [(0, 0)] * (feats.ndim - 2) + [(n_context, n_context), (0, 0)]
    padded = jnp.pad(feats, pads, mode="edge")
    parts = [padded[..., i:i + T, :] for i in range(2 * n_context + 1)]
    return jnp.concatenate(parts, axis=-1)
