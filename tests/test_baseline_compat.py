"""baseline_compat CLI: consumes the reference's exact config.json format
and prints the reference harness's exact output lines."""

import json
import os
import re
import subprocess
import sys


def test_compat_cli_output_format(tmp_path):
    cfg = [{
        "batch_size": 2, "input_size": 6, "n_context": 1,
        "linear_size": 16, "rnn_hidden_size": 16, "vocab_size": 5,
        "seg_len": 8, "epoch": 2, "device": "cpu", "num_threads": 2,
        "beam_width": 4,
    }]
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="", PYTHONPATH=os.getcwd())
    out = subprocess.run(
        [sys.executable, "-m", "gasr_tpu.baseline_compat", str(p)],
        capture_output=True, text=True, timeout=240, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    # exact line formats of baseline/main.py:54-56
    assert re.search(r"^Forward: \d+\.\d+ s$", out.stdout, re.M), out.stdout
    assert re.search(r"^CTC Decode \d+\.\d+ s$", out.stdout, re.M)
    assert re.search(r"^Overall \d+\.\d+ s$", out.stdout, re.M)
    assert "====== config ======" in out.stdout
