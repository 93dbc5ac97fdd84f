"""Benchmark harness — prints ONE JSON line for the driver.

Protocol (BASELINE.md): the reference's harness splits Forward / CTC
Decode / Overall per iteration on the flagship workload
(baseline/config.json: B=256, feat 78, T=200, linear/hidden 2048,
vocab 46+1, beam 100). We measure our TPU pipeline the same way and
report audio-seconds/s/chip (10 ms frame shift -> T=200 frames = 2 s
audio per utterance).

vs_baseline: ratio of our overall throughput to the PyTorch baseline
twin measured on this machine (torch CPU forward, reference config 1;
decode via the native C++ beam decoder when built, else forward-only —
which *understates* our advantage). The baseline measurement is cached
in .bench_baseline.json.

Usage: python bench.py [--small] [--no-decode] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

FRAME_SHIFT_S = 0.01  # standard 10 ms hop


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _sync(x):
    """Force real device completion.

    jax.block_until_ready alone does NOT synchronize under the remote-TPU
    (axon) tunnel — dispatch returns 'ready' immediately. A device->host
    fetch of a value derived from the output is the only reliable fence,
    so all timings here close with one.
    """
    import jax
    import numpy as np
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _spread_stats(samples):
    """Per-rep sample list -> {median, min, max, iqr} (seconds)."""
    import statistics
    ss = sorted(samples)
    n = len(ss)
    med = statistics.median(ss)
    if n >= 4:
        q1 = statistics.median(ss[: n // 2])
        q3 = statistics.median(ss[-(n // 2):])
        iqr = q3 - q1
    else:
        iqr = ss[-1] - ss[0]
    return {"median": med, "min": ss[0], "max": ss[-1], "iqr": iqr,
            "reps": n}


def measure_ours(cfg, iters: int, decode: bool = True,
                 adaptive: bool = False, reps: int = 5):
    """adaptive=True: `iters` is re-derived per workload so each timed
    loop covers >= ~1 s of device time — small presets are otherwise
    dominated by the remote-tunnel dispatch latency (r2 lesson:
    bilstm_2x256 printed 19.8 ms at 3 iters vs 5.45 ms standalone).

    reps: the timed loop runs `reps` times and per-phase times report
    the MEDIAN across reps plus min/max/IQR (VERDICT r3 weak #1: a
    single timed loop's mean moved ~8% between sessions — the same
    order as real kernel wins — so sub-10% claims need a spread)."""
    import math
    import jax
    import jax.numpy as jnp
    from gasr_tpu.models import model_apply, model_init
    from gasr_tpu.decoder import ctc_beam_search

    params = model_init(cfg, jax.random.PRNGKey(0))

    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    fwd = jax.jit(lambda p, x: model_apply(cfg, p, x,
                                           rnn_impl=cfg.rnn_impl,
                                           compute_dtype=cd))

    def dec(lp):
        return ctc_beam_search(lp, beam_width=cfg.beam_width,
                               blank_id=cfg.blank_id,
                               max_len=cfg.decode_max_len,
                               algorithm="prefix")

    # warmup/compile
    _log("generating inputs")
    key = jax.random.PRNGKey(1)

    def make_x(k):
        return jax.random.uniform(
            k, (cfg.batch_size, cfg.seg_len, cfg.feat_size))

    key, k0 = jax.random.split(key)
    x0 = make_x(k0)
    _sync(x0)
    _log("compiling forward")
    lp = fwd(params, x0)
    _sync(lp)
    if decode:
        _log("compiling decode")
        _sync(dec(lp))
    if adaptive:
        # one synced probe iteration sizes the timed loop
        t0 = time.perf_counter()
        r = fwd(params, x0)
        if decode:
            r = dec(r)
        _sync(r)
        t_est = max(time.perf_counter() - t0, 1e-4)
        iters = min(100, max(3, math.ceil(1.0 / t_est)))
        _log(f"adaptive iters: ~{t_est * 1e3:.1f} ms/iter -> {iters} "
             f"x {reps} reps")
    xs = [x0]
    for i in range(iters - 1):
        key, k1 = jax.random.split(key)
        xs.append(make_x(k1))
    _sync(xs)
    _log("warmup done, timing")

    # timed loops: N dispatches then one hard sync (throughput protocol;
    # the async queue pipelines like production serving would), repeated
    # `reps` times for a spread
    fwd_reps, dec_reps = [], []
    for rep in range(reps):
        t0 = time.perf_counter()
        lps = [fwd(params, x) for x in xs]
        _sync(lps[-1])
        t1 = time.perf_counter()
        fwd_reps.append((t1 - t0) / iters)

        if decode:
            t0 = time.perf_counter()
            results = [dec(l) for l in lps]
            _sync(results[-1])
            t1 = time.perf_counter()
            dec_reps.append((t1 - t0) / iters)
    fstats = _spread_stats(fwd_reps)
    dstats = _spread_stats(dec_reps) if decode else None
    t_fwd = fstats["median"]
    t_dec = dstats["median"] if decode else 0.0
    _log(f"ours: fwd={t_fwd:.4f}s dec={t_dec:.4f}s per iter (median of "
         f"{reps}; fwd range {fstats['min']:.4f}-{fstats['max']:.4f})")
    return {"forward_s": t_fwd, "decode_s": t_dec,
            "overall_s": t_fwd + t_dec,
            "forward_stats": fstats, "decode_stats": dstats,
            "iters": iters}


def measure_torch_baseline(cfg, iters: int, cache_path: str):
    """PyTorch twin on CPU (reference config 1: 4 threads)."""
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)
    _log("measuring torch CPU baseline (uncached)")
    try:
        import torch
        import torch.nn as nn
    except Exception:
        return None
    torch.set_num_threads(cfg.num_threads)

    feat, L, H, out = cfg.feat_size, cfg.linear_size, cfg.rnn_hidden_size, \
        cfg.output_size
    model = nn.Sequential()  # assembled manually to mirror model.py
    mlp123 = nn.Sequential(nn.Linear(feat, L), nn.ReLU(),
                           nn.Linear(L, L), nn.ReLU(),
                           nn.Linear(L, H), nn.ReLU())
    rnn = nn.RNN(H, H, num_layers=1)
    mlp56 = nn.Sequential(nn.Linear(H, L), nn.ReLU(), nn.Linear(L, out))

    def forward(x):
        b, t = x.size(0), x.size(1)
        x = x.permute(1, 0, 2).reshape(t * b, -1)
        x = mlp123(x).reshape(t, b, -1)
        x, _ = rnn(x)
        x = mlp56(x.reshape(t * b, -1))
        return x.reshape(t, b, -1).log_softmax(2)

    # decode: native C++ CPU decoder if built (ctcdecode stand-in)
    native_decode = None
    try:
        from gasr_tpu.native import cpu_beam_decode_batch
        native_decode = cpu_beam_decode_batch
    except Exception:
        pass

    t_fwd = t_dec = 0.0
    with torch.no_grad():
        out_t = forward(torch.rand(cfg.batch_size, cfg.seg_len, feat))
        for i in range(iters):
            x = torch.rand(cfg.batch_size, cfg.seg_len, feat)
            t0 = time.perf_counter()
            lp = forward(x)
            t1 = time.perf_counter()
            if native_decode is not None:
                native_decode(lp.numpy(), cfg.beam_width, cfg.blank_id,
                              num_threads=cfg.num_threads)
            t2 = time.perf_counter()
            t_fwd += t1 - t0
            t_dec += t2 - t1
    result = {"forward_s": t_fwd / iters, "decode_s": t_dec / iters,
              "overall_s": (t_fwd + t_dec) / iters,
              "decode_included": native_decode is not None}
    with open(cache_path, "w") as f:
        json.dump(result, f)
    return result


REPORT_PRESETS = ["reference_large", "bilstm_2x256", "deepspeech2",
                  "conformer_s", "conformer_l"]


def measure_streaming(cfg, chunk_frames: int, iters=None, reps: int = 5):
    """Chunked streaming decode at the preset shape: forward once, then
    time `iters` full streaming decodes (T/chunk_frames streaming_step
    calls each, beam+prefix state carried across chunks). Overhead vs
    the batch decode row quantifies the streaming protocol cost.
    Returns per-utterance-decode spread stats over `reps` timed loops.

    iters=None (the default) sizes the loop adaptively to ~1 s of
    device time; an explicit iters is honored as passed (mirrors
    measure_ours — a user pinning --iters for a quick run must not
    silently get the larger adaptive count)."""
    import jax
    from gasr_tpu.models import model_apply, model_init
    from gasr_tpu.decoder.beam_search import streaming_init, streaming_step

    params = model_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (cfg.batch_size, cfg.seg_len, cfg.feat_size))
    lp = jax.jit(lambda p, x: model_apply(cfg, p, x))(params, x)
    _sync(lp)
    n_chunks = cfg.seg_len // chunk_frames
    assert n_chunks * chunk_frames == cfg.seg_len

    L = cfg.decode_max_len

    def run_stream():
        # the fused traceback+reorder+overlay kernel path (r5) carries
        # kernel-layout state; no active_len hint needed (that bound
        # only trims the XLA-overlay fallback path)
        st = streaming_init(cfg.batch_size, cfg.beam_width, max_len=L)
        res = None
        for c in range(n_chunks):
            st, res = streaming_step(
                st, lp[c * chunk_frames:(c + 1) * chunk_frames],
                blank_id=cfg.blank_id)
        return res

    _log(f"compiling streaming decode ({n_chunks} x {chunk_frames})")
    _sync(run_stream())
    if iters is None:
        # adaptive sizing like measure_ours: ~1 s per timed loop (a
        # fixed iters=3 made this the jitteriest row in the table — r4)
        t0 = time.perf_counter()
        _sync(run_stream())
        t_est = max(time.perf_counter() - t0, 1e-4)
        import math
        iters = min(100, max(3, math.ceil(1.0 / t_est)))
        _log(f"adaptive streaming iters: ~{t_est * 1e3:.1f} ms -> "
             f"{iters} x {reps} reps")
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run_stream()
        _sync(out)
        samples.append((time.perf_counter() - t0) / iters)
    return _spread_stats(samples)


def measure_train(cfg, iters=None, reps: int = 5, compute_dtype=None,
                  remat: bool = False):
    """Time the jitted training step (fwd + CTC loss + bwd + adamw) at
    the config's shape — the training axis of the per-round report
    (VERDICT r4 ask #5; protocol extension of the reference's
    inference-only harness, baseline/main.py:54-56).

    compute_dtype overrides the config policy (e.g. force bf16 so the
    conformer row exercises the flash-attention custom_vjp path that
    TPU auto-dispatch takes). Params are donated across steps like a
    real training loop. Returns spread stats over `reps` timed loops.
    """
    import math
    import jax
    from gasr_tpu.models import model_init
    from gasr_tpu.train import (make_optimizer, make_train_step,
                                synthetic_batch)

    cd = compute_dtype
    if cd is None and cfg.compute_dtype != "float32":
        cd = cfg.compute_dtype
    params = model_init(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer()
    step = jax.jit(make_train_step(cfg, opt, remat=remat,
                                   compute_dtype=cd),
                   donate_argnums=(0, 1))
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(1))
    _sync(batch)
    _log("compiling train step")
    params, opt_state, m = step(params, opt_state, batch)
    _sync(m)
    if iters is None:
        t0 = time.perf_counter()
        params, opt_state, m = step(params, opt_state, batch)
        _sync(m)
        t_est = max(time.perf_counter() - t0, 1e-4)
        iters = min(100, max(3, math.ceil(1.0 / t_est)))
        _log(f"adaptive train iters: ~{t_est * 1e3:.1f} ms -> {iters} "
             f"x {reps} reps")
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, m = step(params, opt_state, batch)
        _sync(m)
        samples.append((time.perf_counter() - t0) / iters)
    st = _spread_stats(samples)
    _log(f"train: {st['median'] * 1e3:.1f} ms/step (range "
         f"{st['min'] * 1e3:.1f}-{st['max'] * 1e3:.1f})")
    return st


# training rows for --report: (row name, preset, compute_dtype override)
TRAIN_ROWS = [
    ("train_flagship", "reference_large", None),
    ("train_conformer_l_bf16", "conformer_l", "bfloat16"),
]


def _degrade_mesh(cfg):
    """Presets may pin a mesh this host cannot build (conformer_l pins
    {'data': 2, 'model': 4}); single-chip benching degrades to no mesh
    with a warning instead of failing (r2 lesson: a preset shape must
    never turn into a config error)."""
    import dataclasses
    import jax
    need = 1
    for v in cfg.mesh_shape.values():
        need *= v
    if need > len(jax.devices()):
        _log(f"WARNING: preset mesh_shape={cfg.mesh_shape} needs {need} "
             f"devices, have {len(jax.devices())}; degrading to "
             f"single-chip")
        return dataclasses.replace(cfg, mesh_shape={})
    return cfg


def run_report(args):
    """Bench every model-family preset; write RESULTS.md + print JSON."""
    from gasr_tpu.config import PRESETS
    from gasr_tpu.runtime.flops import device_peak_flops, model_fwd_flops
    import jax
    peak = device_peak_flops()
    rows = []
    for name in REPORT_PRESETS:
        cfg = _degrade_mesh(PRESETS[name])
        _log(f"=== preset {name} (model={cfg.model}) ===")
        r = measure_ours(cfg, args.iters or 3,
                         decode=not args.no_decode,
                         adaptive=args.iters is None)
        audio = cfg.batch_size * cfg.seg_len * FRAME_SHIFT_S
        flops = model_fwd_flops(cfg)
        mfu = (flops / r["forward_s"] / peak) if peak else None
        fs, ds = r["forward_stats"], r["decode_stats"]
        rows.append({
            "preset": name, "model": cfg.model,
            "batch": cfg.batch_size, "T": cfg.seg_len,
            "beam": cfg.beam_width,
            "dtype": cfg.compute_dtype,
            "forward_ms": round(r["forward_s"] * 1e3, 2),
            "forward_ms_range": [round(fs["min"] * 1e3, 2),
                                 round(fs["max"] * 1e3, 2)],
            "decode_ms": round(r["decode_s"] * 1e3, 2),
            "decode_ms_range": ([round(ds["min"] * 1e3, 2),
                                 round(ds["max"] * 1e3, 2)]
                                if ds else None),
            "reps": fs["reps"],
            "fwd_tflop": round(flops / 1e12, 3),
            "mfu_pct": round(mfu * 100, 1) if mfu is not None else None,
            "audio_s_per_s": round(audio / r["overall_s"], 1),
        })
    # streaming protocol row: flagship decode in Tc=20 chunks
    scfg = PRESETS["reference_large"]
    _log("=== streaming (flagship decode, Tc=20 chunks) ===")
    st = measure_streaming(scfg, chunk_frames=20, iters=args.iters)
    audio = scfg.batch_size * scfg.seg_len * FRAME_SHIFT_S
    rows.append({
        "preset": "streaming_Tc20", "model": scfg.model,
        "batch": scfg.batch_size, "T": scfg.seg_len,
        "beam": scfg.beam_width, "dtype": scfg.compute_dtype,
        "forward_ms": 0.0, "forward_ms_range": None,
        "decode_ms": round(st["median"] * 1e3, 2),
        "decode_ms_range": [round(st["min"] * 1e3, 2),
                            round(st["max"] * 1e3, 2)],
        "reps": st["reps"], "fwd_tflop": None, "mfu_pct": None,
        "audio_s_per_s": round(audio / st["median"], 1),
    })
    # training rows (step = fwd + CTC loss + bwd + adamw; MFU against
    # the 3x-forward analytic count, runtime/flops.py)
    from gasr_tpu.runtime.flops import model_train_flops
    for row_name, preset, cd_override in TRAIN_ROWS:
        tcfg = _degrade_mesh(PRESETS[preset])
        _log(f"=== {row_name} (model={tcfg.model}) ===")
        ts = measure_train(tcfg, iters=args.iters,
                           compute_dtype=cd_override)
        tflops = model_train_flops(tcfg)
        tmfu = (tflops / ts["median"] / peak) if peak else None
        audio = tcfg.batch_size * tcfg.seg_len * FRAME_SHIFT_S
        rows.append({
            "preset": row_name, "model": tcfg.model,
            "batch": tcfg.batch_size, "T": tcfg.seg_len,
            "beam": None,
            "dtype": cd_override or tcfg.compute_dtype,
            "forward_ms": round(ts["median"] * 1e3, 2),
            "forward_ms_range": [round(ts["min"] * 1e3, 2),
                                 round(ts["max"] * 1e3, 2)],
            "decode_ms": None, "decode_ms_range": None,
            "reps": ts["reps"],
            "fwd_tflop": round(tflops / 1e12, 3),
            "mfu_pct": round(tmfu * 100, 1) if tmfu is not None else None,
            "audio_s_per_s": round(audio / ts["median"], 1),
        })
    dev = str(jax.devices()[0])
    try:
        import subprocess
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        rev = "unknown"
    lines = [
        "# Benchmark results (per-iteration medians +- spread)", "",
        f"Device: {dev}  |  commit: {rev}", "",
        "Protocol: `python bench.py --report`; iterations per preset are",
        "sized adaptively so each timed loop covers >= ~1 s (hard D2H",
        "sync at loop end), and every preset runs 5 timed loops — the",
        "table reports the MEDIAN with the [min, max] range so run-to-",
        "run tunnel variance (~5-8% observed across sessions) is visible",
        "next to every claim. MFU = analytic fwd FLOPs / median fwd time",
        "/ chip bf16 peak (runtime/flops.py). The streaming row times",
        "the flagship decode fed in Tc=20 chunks (beam + prefix state",
        "carried across streaming_step calls; fwd column n/a). train_*",
        "rows time the full jitted training step (fwd + CTC loss + bwd",
        "+ adamw, params donated); their 'fwd ms' column is ms/STEP and",
        "MFU is against the 3x-forward analytic train FLOP count.", "",
        "| preset | model | B | T | beam | dtype | fwd ms [min,max] | "
        "decode ms [min,max] | TFLOP | MFU% | audio-s/s |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]

    def _rng(med, rng):
        if med is None:
            return "-"
        if rng is None:
            return f"{med}"
        return f"{med} [{rng[0]}, {rng[1]}]"

    for r in rows:
        lines.append(
            f"| {r['preset']} | {r['model']} | {r['batch']} | {r['T']} | "
            f"{r['beam'] if r['beam'] is not None else '-'} | "
            f"{r['dtype']} | "
            f"{_rng(r['forward_ms'], r['forward_ms_range'])} | "
            f"{_rng(r['decode_ms'], r['decode_ms_range'])} | "
            f"{r['fwd_tflop'] if r['fwd_tflop'] is not None else '-'} | "
            f"{r['mfu_pct'] if r['mfu_pct'] is not None else '-'} | "
            f"{r['audio_s_per_s']} |")
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        lines += ["", "## Data-parallel weak scaling", "",
                  f"Backend: {sc['backend']} ({sc['n_devices']} devices)"
                  f" — {sc['caveat']}"]
        mv = sc.get("measured_virtual")
        if mv:
            lines += [
                "",
                f"Harness pin (measured, virtual 8-device mesh, fixed "
                f"total work): efficiency {mv['efficiency_measured']:.3f}"
                f" vs analytic ~{mv['analytic_predicted']:.1f} "
                f"(tolerance {mv['tolerance']}, within="
                f"{mv['within_tolerance']}); the projection rows also "
                f"carry efficiency_overlap0 (no-overlap worst case) in "
                f"SCALING.json."]
        if sc.get("mode") == "analytic_projection":
            lines += [
                "",
                f"Compute term: {sc['step_s_measured_1chip']*1e3:.1f} ms"
                f"/step ({sc['step_seed']}); all-reduce "
                f"{sc['gradient_bytes']/2**20:.0f} MiB bf16 grads; "
                f"{sc['model']}", "",
                "| devices | global batch | comm raw ms | exposed ms | "
                "link | audio-s/s | efficiency |",
                "|---|---|---|---|---|---|---|"]
            for r in sc["rows"]:
                lines.append(
                    f"| {r['devices']} | {r['global_batch']} | "
                    f"{r['t_comm_raw_ms']:.2f} | "
                    f"{r['t_comm_exposed_ms']:.2f} | {r['link']} | "
                    f"{r['audio_s_per_s']:.1f} | "
                    f"{r['efficiency']:.3f} |")
        else:
            lines += ["",
                      "| devices | global batch | iter s | audio-s/s | "
                      "efficiency |", "|---|---|---|---|---|"]
            for r in sc["rows"]:
                lines.append(
                    f"| {r['devices']} | {r['global_batch']} | "
                    f"{r['iter_s']:.4f} | {r['audio_s_per_s']:.1f} | "
                    f"{r['efficiency']:.3f} |")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "RESULTS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "report", "rows": rows}))


def run_scaling(args):
    """Weak-scaling artifact (BASELINE.md protocol: >= 85% multi-host
    target).

    With >= 2 real non-CPU devices: measure_dp_scaling over them.

    With 1 TPU chip (this host): the previous CPU-virtual-mesh
    "efficiency" divided TWO host cores among n fake devices and read
    as a failed target while validating nothing (VERDICT r3 weak #4).
    Now the artifact's headline is the ANALYTIC ICI-bound projection
    (parallel/scaling.analytic_dp_projection) seeded with the flagship
    step time MEASURED on the real chip, with the ring-all-reduce
    decomposition (bytes, raw/exposed comm ms, link) recorded per row;
    the virtual CPU mesh still runs once as a protocol check
    (compiles + executes + stays numerically equal to single-device),
    recorded as protocol_check, NOT as efficiency."""
    import subprocess
    import jax
    from gasr_tpu.config import PRESETS, Config
    here = os.path.dirname(os.path.abspath(__file__))
    n_real = len(jax.devices())
    backend = jax.default_backend()

    if backend != "cpu" and n_real >= 2:
        from gasr_tpu.parallel.scaling import measure_dp_scaling
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_real]
        cfg = PRESETS["reference_large"]
        rows = measure_dp_scaling(cfg, counts, iters=args.iters or 3,
                                  decode=True)
        result = {"backend": backend, "n_devices": n_real,
                  "mode": "measured",
                  "per_device_batch": cfg.batch_size, "rows": rows,
                  "caveat": "measured on real devices"}
    else:
        # 1) measured single-chip flagship step (fwd + decode) — the
        #    compute term of the projection
        cfg = PRESETS["reference_large"]
        if backend == "cpu":
            # CI/CPU: seed from the most recent RECORDED flagship
            # measurement (driver BENCH artifact) instead of timing a
            # CPU forward that models nothing — and instead of a
            # hardcoded literal that goes stale (ADVICE r4)
            step_s, seed_src = None, None
            import glob
            import re
            for path in sorted(glob.glob(os.path.join(here,
                                                      "BENCH_r*.json")),
                               reverse=True):
                try:
                    with open(path) as f:
                        blob = json.load(f)
                    m = re.search(r'"overall_s":\s*([0-9.eE+-]+)',
                                  blob.get("tail", ""))
                    if m:
                        step_s = float(m.group(1))
                        seed_src = (f"recorded flagship fwd+decode from "
                                    f"{os.path.basename(path)}")
                        break
                except Exception:    # noqa: BLE001
                    continue
            if step_s is None:
                step_s = 0.080
                seed_src = ("fallback literal (~80 ms r4 flagship; no "
                            "BENCH_r*.json artifact found)")
        else:
            r = measure_ours(cfg, args.iters or 10, decode=True,
                             reps=3)
            step_s = r["overall_s"]
            seed_src = "measured this run on the real chip"
        from gasr_tpu.parallel.scaling import (analytic_dp_projection,
                                               param_bytes)
        counts = [1, 2, 4, 8, 16, 32, 64, 256]
        rows = analytic_dp_projection(cfg, counts, step_s)
        # 2) virtual-mesh protocol check (sharding compiles+executes)
        #    + the MEASURED fixed-work point that pins the harness
        #    (strong scaling on the virtual mesh: same total work on
        #    mesh n=1 vs n=8 must cost ~the same; VERDICT r4 ask #8)
        proto = {"ran": False}
        measured_virtual = None
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PALLAS_AXON_POOL_IPS="", PYTHONPATH="",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax, json, numpy as np\n"
                 "from gasr_tpu.config import Config\n"
                 "from gasr_tpu.parallel.scaling import (\n"
                 "    measure_dp_scaling, measure_fixed_work_virtual)\n"
                 "cfg = Config(batch_size=4, linear_size=64, "
                 "rnn_hidden_size=64, seg_len=20, beam_width=4)\n"
                 "rows = measure_dp_scaling(cfg, [1, 8], iters=2)\n"
                 "assert len(rows) == 2 and all(\n"
                 "    np.isfinite(r['iter_s']) for r in rows)\n"
                 "print('protocol ok')\n"
                 "print('MV=' + json.dumps(\n"
                 "    measure_fixed_work_virtual()))"],
                env=env, cwd=here, capture_output=True, text=True,
                timeout=900)
            proto = {"ran": True, "rc": out.returncode,
                     "ok": "protocol ok" in out.stdout}
            for line in out.stdout.splitlines():
                if line.startswith("MV="):
                    measured_virtual = json.loads(line[3:])
        except Exception as e:           # noqa: BLE001
            proto = {"ran": True, "error": str(e)[:200]}
        result = {
            "backend": backend, "n_devices": n_real,
            "mode": "analytic_projection",
            "per_device_batch": cfg.batch_size,
            "step_s_measured_1chip": step_s,
            "step_seed": seed_src,
            "gradient_bytes": param_bytes(cfg, 2),
            "model": ("ring all-reduce 2(n-1)/n * bytes/bw; ici 45GB/s "
                      "<= 8 chips else dcn 25GB/s; 80% overlapped "
                      "behind compute (conservative)"),
            "rows": rows,
            "protocol_check": proto,
            "measured_virtual": measured_virtual,
            "caveat": ("1 real chip on a 2-core host: N-chip rows are "
                       "an analytic ICI roofline seeded by the "
                       "measured single-chip step; the CPU-mesh run "
                       "validates the sharded program only"),
        }
    with open(os.path.join(here, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    # metric name states the mode: _projected rows are an analytic
    # ICI-roofline model, not a measurement (ADVICE r4)
    metric = ("dp_weak_scaling_efficiency" if result["mode"] == "measured"
              else "dp_weak_scaling_efficiency_projected")
    print(json.dumps({"metric": metric,
                      "value": rows[-1]["efficiency"] if rows else None,
                      "unit": "fraction",
                      "vs_baseline": None,
                      "detail": result}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced workload for smoke testing")
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--baseline-iters", type=int, default=2)
    ap.add_argument("--fault-inject", action="store_true",
                    help="failure-detection drill: corrupt logits with "
                         "NaN and verify assert_finite fires")
    ap.add_argument("--config", default=None,
                    help="bench a named preset from gasr_tpu.config.PRESETS")
    ap.add_argument("--report", action="store_true",
                    help="bench all model-family presets -> RESULTS.md")
    ap.add_argument("--scaling", action="store_true",
                    help="weak-scaling efficiency protocol -> SCALING.json")
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args)
        return

    if args.fault_inject:
        import jax
        import jax.numpy as jnp
        from gasr_tpu.runtime.validation import (
            NumericsError, assert_finite, inject_fault)
        lp = jnp.zeros((4, 2, 3))
        bad = inject_fault(lp, "nan")
        try:
            assert_finite(bad, "logits")
        except NumericsError as e:
            print(json.dumps({"fault_injection": "detected",
                              "error": str(e)}))
            return
        raise SystemExit("fault went UNDETECTED")

    from gasr_tpu.config import Config, PRESETS
    if args.config:
        cfg = PRESETS[args.config]
    elif args.small:
        cfg = Config(batch_size=8, linear_size=256, rnn_hidden_size=256,
                     seg_len=50, beam_width=10, epoch=3)
    else:
        cfg = Config()  # flagship: reference config shapes
    iters = args.iters or cfg.epoch

    if args.report:
        run_report(args)
        return

    ours = measure_ours(cfg, iters, decode=not args.no_decode)

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_baseline.json" +
                         (".small" if args.small else ""))
    base = measure_torch_baseline(cfg, args.baseline_iters, cache)

    audio_s_per_iter = cfg.batch_size * cfg.seg_len * FRAME_SHIFT_S
    value = audio_s_per_iter / ours["overall_s"]
    vs = (base["overall_s"] / ours["overall_s"]) if base else None

    detail = {"ours": ours, "baseline": base,
              "config": {"batch_size": cfg.batch_size,
                         "seg_len": cfg.seg_len,
                         "hidden": cfg.rnn_hidden_size,
                         "beam_width": cfg.beam_width},
              "rtf_per_chip": value}
    print(json.dumps({
        "metric": "audio-seconds/s/chip (fwd+beam decode)",
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
