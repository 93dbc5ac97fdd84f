"""Training loop (loss decrease, checkpoint/resume), eval harness,
profiler metrics."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from gasr_tpu.config import Config
from gasr_tpu.train import train_loop


def tiny_cfg():
    return Config(batch_size=4, input_size=6, n_context=0, linear_size=32,
                  rnn_hidden_size=32, vocab_size=10, seg_len=24)


def test_train_loss_decreases(tmp_path):
    cfg = tiny_cfg()
    _, losses = train_loop(cfg, num_steps=12, log_every=3)
    assert len(losses) >= 3
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_checkpoint_resume(tmp_path):
    cfg = tiny_cfg()
    ck = str(tmp_path / "ck.npz")
    p1, _ = train_loop(cfg, num_steps=4, checkpoint_path=ck)
    assert os.path.exists(ck)
    # resume must pick up the step counter and params
    p2, _ = train_loop(cfg, num_steps=2, checkpoint_path=ck, resume=True)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree.leaves(d)) > 0  # params moved further

    from gasr_tpu.runtime.checkpoint import load_params
    from gasr_tpu.models import model_init
    like = {"params": model_init(cfg, jax.random.PRNGKey(cfg.seed)),
            "step": jnp.zeros((), jnp.int32)}
    blob = load_params(ck, like)
    assert int(blob["step"]) == 6


def test_eval_wer_on_trained_signal():
    """A model can't be trained in-test, but WER plumbing must work:
    construct log-probs that spell the references exactly."""
    from gasr_tpu.eval import evaluate_batch
    from gasr_tpu.data.dataset import text_to_ids
    refs = ["abc", "aab"]
    V = 29
    seqs = [text_to_ids(r) for r in refs]
    T = 12
    lp = np.full((T, 2, V), -20.0, np.float32)
    for b, ids in enumerate(seqs):
        t = 0
        for i in ids:
            lp[t, b, i] = -0.001
            t += 1
            lp[t, b, 0] = -0.001   # blank separator handles repeats
            t += 1
        for tt in range(t, T):
            lp[tt, b, 0] = -0.001
    out = evaluate_batch(jnp.asarray(lp), refs, beam_width=4)
    assert out["wer"] == 0.0, out


def test_speedometer():
    from gasr_tpu.runtime.profiler import Speedometer
    s = Speedometer(n_chips=2)
    s.record(batch_size=8, n_frames=100, wall_s=2.0)
    r = s.report()
    assert r["audio_s"] == 8.0
    assert abs(r["rtf"] - 4.0) < 1e-9
    assert abs(r["audio_s_per_s_per_chip"] - 2.0) < 1e-9
