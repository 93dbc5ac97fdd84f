"""Regenerate frozen decoder regression fixtures (tests/golden/).

Run manually when decoder SEMANTICS intentionally change:
    python tests/make_golden.py
Never regenerate to make a failing test pass without understanding why.
"""
import os
import zlib

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gasr_tpu.decoder import ctc_beam_search, greedy_decode  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "golden")

CASES = [
    dict(name="prefix_small", T=20, B=4, V=8, W=8, algorithm="prefix"),
    dict(name="prefix_wide", T=15, B=2, V=29, W=16, algorithm="prefix"),
    dict(name="reference_small", T=20, B=4, V=8, W=8,
         algorithm="reference"),
    dict(name="prefix_lens", T=18, B=3, V=6, W=6, algorithm="prefix",
         lens=[18, 12, 7]),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for case in CASES:
        rng = np.random.default_rng(
            zlib.crc32(case["name"].encode()) % 2**31)
        lp = rng.standard_normal(
            (case["T"], case["B"], case["V"])).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        kw = {}
        if "lens" in case:
            kw["input_lengths"] = jnp.asarray(case["lens"])
        res = ctc_beam_search(jnp.asarray(lp), beam_width=case["W"],
                              max_len=32, algorithm=case["algorithm"],
                              **kw)
        gt, gl = greedy_decode(jnp.asarray(lp))
        np.savez(os.path.join(OUT, case["name"] + ".npz"),
                 log_probs=lp,
                 tokens=np.asarray(res.tokens),
                 lengths=np.asarray(res.lengths),
                 scores=np.asarray(res.scores),
                 timesteps=np.asarray(res.timesteps),
                 greedy_tokens=np.asarray(gt),
                 greedy_lengths=np.asarray(gl))
        print("wrote", case["name"])


if __name__ == "__main__":
    main()
