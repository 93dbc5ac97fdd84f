"""WER evaluation harness.

The reference computes no WER anywhere (SURVEY.md §0); BASELINE.md's
protocol requires transcript parity and WER deltas. This harness scores
a decoder against reference transcripts:

  - `evaluate_batch`: log-probs + reference texts -> corpus WER;
  - `evaluate_librispeech`: end-to-end (audio -> native log-mel ->
    model -> beam decode -> WER) over a LibriSpeech split when a corpus
    is available locally;
  - `parity_check`: decode parity between two decoders (e.g. our JAX
    beam search vs the native C++ decoder) — the bit-matching transcript
    gate from BASELINE.json.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.data.dataset import DEFAULT_CHARS, ids_to_text, wer
from gasr_tpu.decoder import ctc_beam_search
from gasr_tpu.decoder.beam_search import decode_to_lists


def evaluate_batch(log_probs: jax.Array, references: Sequence[str],
                   beam_width: int = 16, blank_id: int = 0,
                   chars: str = DEFAULT_CHARS,
                   lm_bias: Optional[jax.Array] = None) -> Dict[str, float]:
    """log_probs [T, B, V]; references: B transcript strings.

    lm_bias: optional [V+1, V] shallow-fusion table (decoder/lm.py
    producers) passed through to the beam search."""
    res = ctc_beam_search(log_probs, beam_width=beam_width,
                          blank_id=blank_id, lm_bias=lm_bias)
    outs = decode_to_lists(res)
    wers, hyps = [], []
    for (ids, _score), ref in zip(outs, references):
        hyp = ids_to_text(ids, chars)
        hyps.append(hyp)
        wers.append(wer(ref.lower(), hyp))
    return {"wer": float(np.mean(wers)), "n": len(wers), "hyps": hyps}


def parity_check(log_probs: np.ndarray, beam_width: int = 16,
                 blank_id: int = 0, num_threads: int = 4) -> Dict:
    """Bit-matching transcript check: JAX decoder vs native C++ decoder.

    Returns {'match_rate': fraction of exactly matching transcripts,
    'mismatches': [(b, jax_ids, native_ids), ...]}.
    """
    from gasr_tpu.native import cpu_beam_decode_batch
    res = ctc_beam_search(jnp.asarray(log_probs), beam_width=beam_width,
                          blank_id=blank_id)
    jax_out = decode_to_lists(res)
    tokens, lens, _ = cpu_beam_decode_batch(
        log_probs, beam_width=beam_width, blank_id=blank_id,
        num_threads=num_threads)
    mismatches = []
    B = log_probs.shape[1]
    for b in range(B):
        native_ids = tokens[b, :lens[b]].tolist()
        if jax_out[b][0] != native_ids:
            mismatches.append((b, jax_out[b][0], native_ids))
    return {"match_rate": 1.0 - len(mismatches) / max(B, 1),
            "mismatches": mismatches}


def evaluate_librispeech(config: Config, params, root: str,
                         split: str = "test-clean",
                         limit: Optional[int] = 50,
                         sample_rate: int = 16000) -> Dict[str, float]:
    """End-to-end WER on a local LibriSpeech split (features via the
    native frontend, one utterance at a time)."""
    from gasr_tpu.data.dataset import LibriSpeechDataset
    from gasr_tpu.data.features import add_context
    from gasr_tpu.models import model_apply
    from gasr_tpu.native import logmel

    ds = LibriSpeechDataset(root, split)
    wers = []
    for audio, sr, text in ds.utterances(limit=limit):
        feats = logmel(audio, sample_rate=sr, n_mels=config.input_size)
        feats = add_context(jnp.asarray(feats)[None], config.n_context)
        lp = model_apply(config, params, feats)
        res = ctc_beam_search(lp, beam_width=config.beam_width,
                              blank_id=config.blank_id)
        ids, _ = decode_to_lists(res)[0]
        wers.append(wer(text.lower(), ids_to_text(ids)))
    return {"wer": float(np.mean(wers)) if wers else float("nan"),
            "n": len(wers)}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--librispeech", default=None,
                    help="path to extracted LibriSpeech root")
    ap.add_argument("--split", default="test-clean")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--beam", type=int, default=16)
    args = ap.parse_args()

    if args.librispeech:
        cfg = Config(model="bilstm", input_size=80, n_context=0,
                     rnn_hidden_size=256, rnn_num_layers=2,
                     bidirectional=True, vocab_size=28,
                     beam_width=args.beam)
        from gasr_tpu.models import model_init
        params = model_init(cfg, jax.random.PRNGKey(0))
        print(evaluate_librispeech(cfg, params, args.librispeech,
                                   args.split, args.limit))
    else:
        # no corpus: run the decoder parity gate on random logits
        rng = np.random.default_rng(0)
        lp = rng.standard_normal((50, 8, 29)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        out = parity_check(lp, beam_width=args.beam)
        print({"parity_match_rate": out["match_rate"],
               "mismatches": len(out["mismatches"])})


if __name__ == "__main__":
    main()
