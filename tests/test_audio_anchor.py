"""End-to-end ACCURACY anchor for the production audio path.

The reference's main.cpp only fakes its pipeline input with zeros
(main.cpp:38-45); here the full path — raw waveform -> native log-mel
frontend -> context stacking -> model -> variable-length beam decode ->
text — is anchored to ground truth: a tiny model is trained on log-mel
features of deterministic synthetic tone-speech (one sine frequency per
symbol), then Pipeline.transcribe_audio must reproduce the transcripts
on fresh-noise renditions of the same utterances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

SR = 16000
HOP = 160
N_MELS = 13
N_SYMBOLS = 4
LABEL_LEN = 4
FRAMES_PER_SYMBOL = 14
# spread across the mel range so each symbol owns DISTINCT mel bins
# (adjacent low frequencies blur together in a 13-band frontend)
FREQS = np.array([500.0, 1200.0, 2600.0, 5200.0])


def _make_labels(rng, n):
    """values 1..N_SYMBOLS, no adjacent repeats (cleanly learnable)."""
    labels = np.zeros((n, LABEL_LEN), np.int32)
    for i in range(n):
        prev = 0
        for j in range(LABEL_LEN):
            c = int(rng.integers(1, N_SYMBOLS + 1))
            while c == prev:
                c = int(rng.integers(1, N_SYMBOLS + 1))
            labels[i, j] = c
            prev = c
    return labels


def _synth(rng, label):
    """Deterministic tone per symbol + small noise -> waveform."""
    segs = []
    for sym in label:
        n = FRAMES_PER_SYMBOL * HOP
        t = np.arange(n, dtype=np.float64) / SR
        segs.append(np.sin(2 * np.pi * FREQS[sym - 1] * t))
    w = np.concatenate(segs).astype(np.float32)
    return w + rng.standard_normal(w.shape).astype(np.float32) * 0.02


@pytest.mark.slow
def test_audio_to_text_accuracy_anchor():
    pytest.importorskip("gasr_tpu.native")
    from gasr_tpu.config import Config
    from gasr_tpu.data.features import add_context
    from gasr_tpu.infer import Pipeline
    from gasr_tpu.native import logmel
    from gasr_tpu.train import make_optimizer, make_train_step

    from gasr_tpu.data.features import cmvn
    rng = np.random.default_rng(0)
    B = 12
    RENDITIONS = 6     # noise renditions per utterance: with a single
                       # rendition the model memorizes the noise floor
                       # (train wavs decode 16/16, fresh-noise wavs
                       # don't) — diagnosed on the 8-device CPU env
    labels = _make_labels(rng, B)
    train_labels = np.repeat(labels, RENDITIONS, axis=0)
    train_wavs = [_synth(rng, lab) for lab in train_labels]
    feats = np.stack([logmel(w, sample_rate=SR, n_mels=N_MELS)
                      for w in train_wavs])       # [B*R, T, N_MELS]
    T = feats.shape[1]
    Btr = feats.shape[0]

    cfg = Config(batch_size=Btr, input_size=N_MELS, n_context=1,
                 linear_size=48, rnn_hidden_size=48,
                 vocab_size=N_SYMBOLS, seg_len=T, beam_width=4,
                 decode_max_len=16, cmvn=True)
    from gasr_tpu.models import model_init
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(learning_rate=2e-3)
    step = jax.jit(make_train_step(cfg, opt))
    opt_state = opt.init(params)
    # training features go through the SAME frontend as the production
    # path (logmel -> cmvn -> context stacking)
    batch = {
        "inputs": jnp.asarray(add_context(cmvn(jnp.asarray(feats)),
                                          cfg.n_context)),
        "labels": jnp.asarray(train_labels),
        "input_lengths": jnp.full((Btr,), T, jnp.int32),
        "label_lengths": jnp.full((Btr,), LABEL_LEN, jnp.int32),
    }
    for i in range(2500):
        params, opt_state, m = step(params, opt_state, batch)
        if i >= 200 and i % 50 == 0 and float(m["loss"]) < 0.002:
            break

    # ---- the anchor: FULL production path on fresh-noise renditions
    eval_wavs = [_synth(rng, lab) for lab in labels]   # new noise draws
    vocab = ["$"] + [chr(ord("a") + i) for i in range(N_SYMBOLS)]
    pipe = Pipeline(cfg, params=params, vocab=vocab)
    texts = pipe.transcribe_audio(eval_wavs, sample_rate=SR)
    want = ["".join(vocab[s] for s in lab) for lab in labels]
    exact = sum(t == w for t, w in zip(texts, want))
    # generalization to fresh noise, not a convergence benchmark:
    # >= 75% exact proves the path carries real accuracy (measured
    # 11/12 at the loss<0.002 break on the 8-device CPU env)
    assert exact >= int(0.75 * B), (
        f"only {exact}/{B} exact audio->text transcripts; "
        f"got {texts[:4]} want {want[:4]}")
