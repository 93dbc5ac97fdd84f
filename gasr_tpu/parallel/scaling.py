"""Scaling-efficiency measurement harness.

BASELINE.md protocol: audio-seconds/s at 1 chip, 1 host, N hosts, with
efficiency = throughput(n) / (n * throughput(1)). On real hardware this
runs over the actual device set; in CI it runs on the virtual CPU mesh
(numbers are NOT hardware-representative there — the harness existing
and the sharding compiling/executing is what CI validates; the driver's
dryrun covers compile on N chips).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gasr_tpu.config import Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.parallel.mesh import make_mesh

FRAME_SHIFT_S = 0.01


def _sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def measure_dp_scaling(config: Config, device_counts: List[int],
                       iters: int = 3, decode: bool = False
                       ) -> List[Dict]:
    """Data-parallel forward(+decode) throughput vs #devices.

    Per-device batch held constant (weak scaling): global batch =
    config.batch_size * n.
    """
    from gasr_tpu.decoder import ctc_beam_search
    results = []
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh({"data": n})
        B = config.batch_size * n
        params = model_init(config, jax.random.PRNGKey(0))
        params = jax.device_put(
            params, NamedSharding(mesh, P()))
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (B, config.seg_len, config.feat_size))
        x = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
        fwd = jax.jit(lambda p, xx: model_apply(config, p, xx))

        def run(xx):
            lp = fwd(params, xx)
            if decode:
                return ctc_beam_search(lp, beam_width=config.beam_width,
                                       max_len=config.decode_max_len)
            return lp

        with mesh:
            _sync(run(x))
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = run(x)
            _sync(out)
            dt = (time.perf_counter() - t0) / iters
        audio_s = B * config.seg_len * FRAME_SHIFT_S
        results.append({"devices": n, "global_batch": B,
                        "iter_s": dt, "audio_s_per_s": audio_s / dt})
    if results:
        base = results[0]["audio_s_per_s"] / results[0]["devices"]
        for r in results:
            r["efficiency"] = r["audio_s_per_s"] / (r["devices"] * base)
    return results
