"""Time flagship streaming decode (Tc=20) after the r4 chunk-relative
traceback. r3 baseline: 99.7 ms vs 63.7 batch (1.56x). Target <= 1.15x.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def say(*a):
    print(*a, flush=True)


say("devices:", jax.devices())

from bench import measure_streaming, measure_ours, _spread_stats
from gasr_tpu.config import PRESETS

cfg = PRESETS["reference_large"]
st = measure_streaming(cfg, chunk_frames=20, iters=10, reps=5)
say(f"streaming Tc=20: median {st['median']*1e3:.1f} ms "
    f"[{st['min']*1e3:.1f}, {st['max']*1e3:.1f}]")
r = measure_ours(cfg, 20, decode=True, reps=5)
say(f"batch: fwd {r['forward_s']*1e3:.1f} ms decode "
    f"{r['decode_s']*1e3:.1f} ms "
    f"[{r['decode_stats']['min']*1e3:.1f}, "
    f"{r['decode_stats']['max']*1e3:.1f}]")
say(f"ratio streaming/batch-decode: "
    f"{st['median']/r['decode_s']:.3f}")
say("ALL DONE")
