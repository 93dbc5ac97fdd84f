"""Typed run configuration.

Honors the reference's JSON config schema exactly (baseline/config.json:2-14,
consumed by baseline/main.py:12-28) so reference configs run unmodified:
`batch_size, input_size, n_context, linear_size, rnn_hidden_size, vocab_size,
seg_len, epoch, device, num_threads, beam_width` — plus TPU-native extensions
(model family, dtype policy, mesh shape, decoder options).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass
class Config:
    # ---- reference keys (baseline/config.json) ----
    batch_size: int = 256
    input_size: int = 26
    n_context: int = 1
    linear_size: int = 2048
    rnn_hidden_size: int = 2048
    vocab_size: int = 46          # WITHOUT blank; model output dim = vocab_size + 1
    seg_len: int = 200            # frames per utterance (T)
    epoch: int = 10               # bench iterations
    device: str = "tpu"           # reference: "cpu"/"cuda"; ours: "tpu"/"cpu"
    num_threads: int = 4          # reference: ctcdecode CPU threads; kept for compat
    beam_width: int = 100

    # ---- framework extensions ----
    model: str = "deepspeech"     # deepspeech | bilstm | deepspeech2 | conformer_s | conformer_l
    rnn_num_layers: int = 1
    bidirectional: bool = False
    compute_dtype: str = "float32"   # float32 | bfloat16 (params stay f32)
    blank_id: int = 0
    decode_max_len: int = 256     # reference DECODE_MAX_LEN (CTCBeamSearch.h:8); ours is a knob
    cmvn: bool = False            # per-utterance feature mean/var norm (data/features.py)
    decoder: str = "prefix"       # prefix (standard/log-space) | reference (blank-annotated) | greedy
    log_space: bool = True        # prefix decoder always log-space; reference decoder optionally
    num_blocks: Optional[int] = None  # conformer depth override (None=preset)
    rnn_impl: str = "scan"        # scan | pallas (VMEM-resident recurrence)
    # mesh: axis name -> size; empty = single device
    mesh_shape: Dict[str, int] = dataclasses.field(default_factory=dict)
    seed: int = 0

    @property
    def feat_size(self) -> int:
        """Model input feature width: input_size*(1+2*n_context) (model.py:23)."""
        return self.input_size + 2 * self.input_size * self.n_context

    @property
    def output_size(self) -> int:
        """Logit width = vocab + blank (model.py:20)."""
        return self.vocab_size + 1

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        unknown = set(d) - fields
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**known)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def load_configs(path: str) -> List[Config]:
    """Load a JSON list of configs (reference format: baseline/main.py:59-65)."""
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, dict):
        raw = [raw]
    return [Config.from_dict(d) for d in raw]


# The reference's two shipped benchmark configs (baseline/config.json) and the
# toy dims from main.cpp:15-29 / baseline/config.py, as named presets.
PRESETS: Dict[str, Config] = {
    "reference_large_cpu": Config(device="cpu"),
    "reference_large": Config(device="tpu"),
    "reference_toy": Config(
        batch_size=3, input_size=10, n_context=0, linear_size=40,
        rnn_hidden_size=50, vocab_size=3, seg_len=9, epoch=1,
        beam_width=2, decode_max_len=32,
    ),
    "bilstm_2x256": Config(
        model="bilstm", batch_size=16, input_size=80, n_context=0,
        linear_size=256, rnn_hidden_size=256, rnn_num_layers=2,
        bidirectional=True, vocab_size=28, seg_len=400, beam_width=10,
    ),
    "deepspeech2": Config(
        model="deepspeech2", batch_size=32, input_size=160, n_context=0,
        linear_size=512, rnn_hidden_size=512, rnn_num_layers=5,
        bidirectional=True, vocab_size=28, seg_len=600, beam_width=32,
    ),
    # conformer presets run bf16 compute (params f32): measured on TPU
    # v5e r4 the bf16 + flash-MHSA path is 3x conformer_l's f32
    # forward (229.5 -> 77.5 ms) with f32 LN stats/softmax/log_softmax
    # — the standard production inference policy. (deepspeech stays
    # f32: bf16 measured bit-identical AND speed-identical there —
    # the MXU already ingests bf16 at default matmul precision.)
    "conformer_s": Config(
        model="conformer_s", batch_size=32, input_size=80, n_context=0,
        linear_size=144, rnn_hidden_size=144, vocab_size=128, seg_len=600,
        beam_width=64, compute_dtype="bfloat16",
    ),
    "conformer_l": Config(
        model="conformer_l", batch_size=64, input_size=80, n_context=0,
        linear_size=512, rnn_hidden_size=512, vocab_size=128, seg_len=1200,
        beam_width=16, mesh_shape={"data": 2, "model": 4},
        compute_dtype="bfloat16",
    ),
}
