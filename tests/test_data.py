"""Data pipeline: JAX log-mel vs native C++ log-mel, context stacking,
text codec, WER."""

import numpy as np
import pytest
import jax.numpy as jnp

from gasr_tpu.data import SyntheticDataset, text_to_ids
from gasr_tpu.data.dataset import ids_to_text, wer
from gasr_tpu.data.features import add_context, logmel_jax


def test_logmel_jax_matches_native():
    native = pytest.importorskip("gasr_tpu.native")
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(8000).astype(np.float32)
    got = np.asarray(logmel_jax(jnp.asarray(audio), sample_rate=8000,
                                n_fft=256, hop=80, n_mels=23))
    want = native.logmel(audio, sample_rate=8000, n_fft=256, hop=80,
                         n_mels=23)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_add_context():
    f = jnp.arange(12.0).reshape(1, 4, 3)
    out = add_context(f, 1)
    assert out.shape == (1, 4, 9)
    row1 = np.asarray(out)[0, 1]
    np.testing.assert_allclose(row1[:3], [0, 1, 2])      # t-1
    np.testing.assert_allclose(row1[3:6], [3, 4, 5])     # t
    np.testing.assert_allclose(row1[6:], [6, 7, 8])      # t+1
    # edge padding at t=0
    row0 = np.asarray(out)[0, 0]
    np.testing.assert_allclose(row0[:3], [0, 1, 2])


def test_text_codec_roundtrip():
    ids = text_to_ids("hello world")
    assert all(i >= 1 for i in ids)
    assert ids_to_text(ids) == "hello world"


def test_wer():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert wer("a b c", "") == 1.0


def test_synthetic_dataset_schema():
    from gasr_tpu.config import Config
    cfg = Config(batch_size=3, seg_len=10, input_size=4, n_context=1,
                 vocab_size=5)
    ds = SyntheticDataset(cfg, max_label_len=6)
    batches = list(ds.batches(2))
    assert len(batches) == 2
    b = batches[0]
    assert b["inputs"].shape == (3, 10, cfg.feat_size)
    assert b["labels"].max() <= cfg.output_size - 1
    assert (b["label_lengths"] >= 3).all()


def test_print_array_info(capsys):
    from gasr_tpu.utils import print_array_info, tree_size_bytes
    x = jnp.arange(12.0).reshape(3, 4)
    print_array_info(x, "probe")
    out = capsys.readouterr().out
    assert "probe" in out and "(3, 4)" in out and "finite=True" in out
    assert tree_size_bytes({"a": x}) == 12 * 4
