"""Analytic forward-pass FLOP counts + MFU per model family.

VERDICT r3 weak #7: the bench never computed model FLOPs, which is how
a ~10% MFU conformer_l forward went unflagged for a round. This module
gives every preset an analytic FLOP count (2 * MACs for every GEMM /
conv / recurrence; cheap elementwise ignored) so bench.py can report
MFU = flops / time / peak next to every timing.

Counts follow the actual compute graphs (models/*.py), not paper
formulas — e.g. the conformer stem's second 3x3 conv at d=512 over the
quarter-resolution grid is ~1.8 TFLOP at the conformer_l preset, a
third of the whole model, and it shows up here.

Peak numbers: TPU v5e (tpu v5 lite) bf16 ~197 TFLOP/s per chip
(public spec: 394 TOPS int8 / 197 TFLOPS bf16).
"""

from __future__ import annotations

from gasr_tpu.config import Config

# per-chip dense peak FLOP/s by jax device_kind substring (bf16)
_PEAKS = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6": 918e12,
}


def device_peak_flops(device=None) -> float | None:
    """Best-effort bf16 peak for the given (default: first) device."""
    import jax
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for sub, peak in _PEAKS.items():
        if sub in kind:
            return peak
    return None


def _linear_flops(tokens: int, d_in: int, d_out: int) -> float:
    return 2.0 * tokens * d_in * d_out


def _lstm_flops(tokens: int, layers_io) -> float:
    """layers_io: list of (d_in, H, n_dir). Cell = input GEMM + recurrent
    GEMM into 4 gates."""
    total = 0.0
    for d_in, H, n_dir in layers_io:
        total += n_dir * (2.0 * tokens * d_in * 4 * H
                          + 2.0 * tokens * H * 4 * H)
    return total


def _conv2d_flops(out_elems: int, kh: int, kw: int, cin: int,
                  cout: int) -> float:
    return 2.0 * out_elems * kh * kw * cin * cout


def model_fwd_flops(cfg: Config) -> float:
    """Analytic forward FLOPs for one batch at the config's shape."""
    B, T, F = cfg.batch_size, cfg.seg_len, cfg.feat_size
    L, H, O = cfg.linear_size, cfg.rnn_hidden_size, cfg.output_size
    n_dir = 2 if cfg.bidirectional else 1
    tok = B * T

    if cfg.model == "deepspeech":
        # models/deepspeech.py: 3xMLP -> RNN -> MLP -> proj
        f = (_linear_flops(tok, F, L) + _linear_flops(tok, L, L)
             + _linear_flops(tok, L, H))
        # rnn_cell: input GEMM + recurrent GEMM per direction/layer
        f += cfg.rnn_num_layers * n_dir * (
            2.0 * tok * H * H + 2.0 * tok * H * H)
        f += _linear_flops(tok, H * n_dir, L) + _linear_flops(tok, L, O)
        return f

    if cfg.model == "bilstm":
        ios = [(F, H, n_dir)]
        for _ in range(cfg.rnn_num_layers - 1):
            ios.append((H * n_dir, H, n_dir))
        return _lstm_flops(tok, ios) + _linear_flops(tok, H * n_dir, O)

    if cfg.model == "deepspeech2":
        from gasr_tpu.models.deepspeech2 import (
            _CHANNELS, _CONV1_KERNEL, _CONV1_STRIDE, _CONV2_KERNEL,
            _CONV2_STRIDE)
        t1 = -(-T // _CONV1_STRIDE[0])
        f1 = -(-F // _CONV1_STRIDE[1])
        t2 = -(-t1 // _CONV2_STRIDE[0])
        f2 = -(-f1 // _CONV2_STRIDE[1])
        f = _conv2d_flops(B * t1 * f1, *_CONV1_KERNEL, 1, _CHANNELS)
        f += _conv2d_flops(B * t2 * f2, *_CONV2_KERNEL, _CHANNELS,
                           _CHANNELS)
        tok2 = B * t2
        ios = [(f2 * _CHANNELS, H, n_dir)]
        for _ in range(cfg.rnn_num_layers - 1):
            ios.append((H * n_dir, H, n_dir))
        return (f + _lstm_flops(tok2, ios)
                + _linear_flops(tok2, H * n_dir, O))

    if cfg.model in ("conformer_s", "conformer_l", "conformer"):
        from gasr_tpu.models.conformer import _preset
        hp = _preset(cfg)
        d, heads = hp["d_model"], hp["num_heads"]
        mult, K = hp["ff_mult"], hp["conv_kernel"]
        t1, f1 = -(-T // 2), -(-F // 2)
        t2, f2 = -(-t1 // 2), -(-f1 // 2)
        f = _conv2d_flops(B * t1 * f1, 3, 3, 1, d)
        f += _conv2d_flops(B * t2 * f2, 3, 3, d, d)
        tok2 = B * t2
        f += _linear_flops(tok2, d * f2, d)            # sub_proj
        per_block = (
            2 * (_linear_flops(tok2, d, d * mult) * 2)  # two half-FFNs
            + 4 * _linear_flops(tok2, d, d)             # q k v o
            + _linear_flops(2 * t2 - 1, d, d)           # rel-pos proj
            + 2.0 * tok2 * t2 * d                       # ac scores
            + 2.0 * tok2 * (2 * t2 - 1) * d             # bd scores
            + 2.0 * tok2 * t2 * d                       # attn @ V
            + _linear_flops(tok2, d, 2 * d)             # conv pw1
            + 2.0 * tok2 * K * d                        # depthwise
            + _linear_flops(tok2, d, d)                 # conv pw2
        )
        f += hp["num_blocks"] * per_block
        f += _linear_flops(tok2, d, O)
        return f

    raise ValueError(f"unknown model {cfg.model!r}")


def model_train_flops(cfg: Config) -> float:
    """Analytic FLOPs for one training step = 3x forward (the standard
    accounting: backward costs ~2 forwards — dL/dW and dL/dx are each a
    forward-sized GEMM set). CTC loss (O(B*T*S) scan) and the optimizer
    (O(params) elementwise) are counted as zero, which slightly
    UNDERSTATES train MFU; the r4 hardware breakdown
    (scripts/tpu_r4_train_probe.py) bounds their real share."""
    return 3.0 * model_fwd_flops(cfg)
