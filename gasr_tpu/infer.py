"""End-to-end inference pipeline: features -> acoustic model -> decoder.

The TPU-native equivalent of the reference's main.cpp pipeline
(main.cpp:31-75: MLP stack -> RNN -> MLPs -> CTCBeamSearch::decode),
packaged as a reusable object with jit-compiled stages, plus a CLI smoke
run (`python -m gasr_tpu.infer`).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gasr_tpu.config import Config
from gasr_tpu.decoder import ctc_beam_search, greedy_decode
from gasr_tpu.decoder.beam_search import decode_to_lists
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.runtime.timer import Timer

# default character vocabulary: blank + space + a-z (29 incl. apostrophe)
DEFAULT_VOCAB = ["$", " "] + [chr(c) for c in range(ord("a"), ord("z") + 1)] \
    + ["'"]


class Pipeline:
    """features [B, T, F] -> transcripts."""

    def __init__(self, config: Config, params=None,
                 vocab: Optional[Sequence[str]] = None,
                 key: Optional[jax.Array] = None):
        self.config = config
        self.vocab = list(vocab) if vocab is not None else (
            DEFAULT_VOCAB[:config.output_size]
            if config.output_size <= len(DEFAULT_VOCAB) else None)
        if params is None:
            params = model_init(config,
                                key if key is not None
                                else jax.random.PRNGKey(config.seed))
        self.params = params
        self._fwd = jax.jit(
            lambda p, x: model_apply(config, p, x,
                                     rnn_impl=config.rnn_impl))

    def log_probs(self, features: jax.Array) -> jax.Array:
        from gasr_tpu.runtime.validation import check_features
        check_features(features, self.config.feat_size)
        return self._fwd(self.params, features)

    def transcribe(self, features: jax.Array, top: int = 1
                   ) -> List[Tuple[List[int], float]]:
        lp = self.log_probs(features)
        if self.config.decoder == "greedy":
            tokens, lengths = greedy_decode(lp, self.config.blank_id)
            toks = np.asarray(tokens)
            lens = np.asarray(lengths)
            return [(toks[b, :lens[b]].tolist(), 0.0)
                    for b in range(toks.shape[0])]
        algorithm = ("reference" if self.config.decoder == "reference"
                     else "prefix")
        res = ctc_beam_search(
            lp, beam_width=self.config.beam_width,
            blank_id=self.config.blank_id,
            max_len=self.config.decode_max_len, algorithm=algorithm)
        return decode_to_lists(res, top=top)

    def transcribe_streaming(self, feature_chunks,
                             ) -> List[Tuple[List[int], float]]:
        """Decode an iterable of [B, Tc, F] feature chunks with carried
        MODEL state and carried BEAM state — exactly equivalent to a
        full-utterance transcribe, with unbounded total length.

        Requires a streaming-capable topology (deepspeech,
        unidirectional). For incremental partial results use
        decoder.beam_search.streaming_step directly.
        """
        if self.config.model != "deepspeech" or self.config.bidirectional:
            raise ValueError(
                "streaming requires the unidirectional deepspeech model")
        from gasr_tpu.decoder.beam_search import (
            decode_to_lists, streaming_init, streaming_step)
        from gasr_tpu.models.deepspeech import deepspeech_apply_streaming
        fwd = jax.jit(deepspeech_apply_streaming)
        state = rnn_state = None
        chunks = list(feature_chunks)
        for i, chunk in enumerate(chunks):
            lp, rnn_state = fwd(self.params, chunk, rnn_state)
            if state is None:
                state = streaming_init(lp.shape[1], self.config.beam_width,
                                       max_len=self.config.decode_max_len)
            state, snap = streaming_step(
                state, lp, blank_id=self.config.blank_id,
                is_final=(i == len(chunks) - 1))
        return decode_to_lists(snap)

    def to_text(self, ids: Sequence[int]) -> str:
        if self.vocab is None:
            return " ".join(map(str, ids))
        return "".join(self.vocab[i] for i in ids)

    def transcribe_audio(self, audio_batch: Sequence[np.ndarray],
                         sample_rate: int = 16000) -> List[str]:
        """Raw waveforms -> transcripts: native log-mel frontend ->
        n_context stacking -> model -> beam decode. Utterances are
        padded to the longest and decoded with per-utterance lengths."""
        from gasr_tpu.data.features import add_context
        from gasr_tpu.native import logmel
        from gasr_tpu.decoder import ctc_beam_search
        from gasr_tpu.decoder.beam_search import decode_to_lists

        feats = [logmel(a, sample_rate=sample_rate,
                        n_mels=self.config.input_size)
                 for a in audio_batch]
        lengths = np.array([f.shape[0] for f in feats], np.int32)
        T = int(lengths.max())
        padded = np.zeros((len(feats), T, self.config.input_size),
                          np.float32)
        for i, f in enumerate(feats):
            padded[i, :f.shape[0]] = f
        padded = jnp.asarray(padded)
        if self.config.cmvn:
            from gasr_tpu.data.features import cmvn
            padded = cmvn(padded, lengths=jnp.asarray(lengths))
        x = add_context(padded, self.config.n_context)
        lp = self.log_probs(x)
        res = ctc_beam_search(
            lp, beam_width=self.config.beam_width,
            blank_id=self.config.blank_id,
            max_len=self.config.decode_max_len,
            input_lengths=jnp.asarray(lengths))
        return [self.to_text(ids) for ids, _ in decode_to_lists(res)]


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deepspeech")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--beam", type=int, default=10)
    args = ap.parse_args()

    cfg = Config(model=args.model, batch_size=args.batch,
                 input_size=26, n_context=1, linear_size=256,
                 rnn_hidden_size=256, vocab_size=27,
                 seg_len=args.frames, beam_width=args.beam)
    pipe = Pipeline(cfg)
    feats = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch, args.frames, cfg.feat_size))
    timer = Timer()
    out, dt = timer.time("transcribe", pipe.transcribe, feats)
    for b, (ids, score) in enumerate(out):
        print(f"utt {b}: {pipe.to_text(ids)!r}  score={score:.3f}")
    print(f"[{dt:.3f}s compile+run]")


if __name__ == "__main__":
    main()
