"""Reference benchmark-harness compatibility shim.

Drop-in for `python baseline/main.py config.json` (baseline/main.py:59-65):
consumes the SAME JSON config list (keys batch_size, input_size,
n_context, linear_size, rnn_hidden_size, vocab_size, seg_len, epoch,
device, num_threads, beam_width) and prints the SAME three lines per
config ("Forward: %f s" / "CTC Decode %f s" / "Overall %f s",
baseline/main.py:54-56), so existing tooling that parses the reference's
output keeps working against the TPU framework.

device: "cpu" -> XLA CPU; anything else ("cuda"/"tpu") -> default
accelerator backend.

Usage: python -m gasr_tpu.baseline_compat <config.json>
"""

from __future__ import annotations

import json
import sys
import time


def run(config: dict) -> None:
    import jax
    from gasr_tpu.config import Config
    from gasr_tpu.decoder import ctc_beam_search
    from gasr_tpu.models import model_apply, model_init
    from gasr_tpu.runtime.timer import Timer

    cfg = Config.from_dict({k: v for k, v in config.items()})
    n_iter = cfg.epoch

    params = model_init(cfg, jax.random.PRNGKey(cfg.seed))
    fwd = jax.jit(lambda p, x: model_apply(cfg, p, x))

    def dec(lp):
        return ctc_beam_search(lp, beam_width=cfg.beam_width,
                               blank_id=cfg.blank_id,
                               max_len=cfg.decode_max_len)

    key = jax.random.PRNGKey(1)
    forward_time = decode_time = overall_time = 0.0
    for i in range(n_iter + 1):                  # +1 warmup/compile iter
        key, k1 = jax.random.split(key)
        inp = jax.random.uniform(
            k1, (cfg.batch_size, cfg.seg_len, cfg.feat_size))
        Timer.sync(inp)
        t0 = time.perf_counter()
        out = fwd(params, inp)
        Timer.sync(out)
        t1 = time.perf_counter()
        res = dec(out)
        Timer.sync(res)
        t2 = time.perf_counter()
        if i == 0:
            continue                             # discard compile iter
        forward_time += t1 - t0
        decode_time += t2 - t1
        overall_time += t2 - t0

    # exact output format of baseline/main.py:54-56
    print("Forward: %f s" % (forward_time / n_iter))
    print("CTC Decode %f s" % (decode_time / n_iter))
    print("Overall %f s" % (overall_time / n_iter))


def main(argv):
    configs = json.load(open(argv[1]))
    if isinstance(configs, dict):
        configs = [configs]
    for config in configs:
        print("====== config ======")
        print(config)
        print("====================")
        if config.get("device") == "cpu":
            import jax
            jax.config.update("jax_platforms", "cpu")
        run(config)


if __name__ == "__main__":
    main(sys.argv)
