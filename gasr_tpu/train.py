"""Training step and loop.

The reference is inference-only (SURVEY.md §0: transpose GEMMs declared
for a backward pass but never called). A complete framework trains: CTC
loss over the acoustic model, optax optimizer, jit-compiled step that
shards over a ('data', 'model') mesh via GSPMD annotations.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gasr_tpu.config import Config
from gasr_tpu.models import model_apply, model_init
from gasr_tpu.ops.ctc_loss import ctc_loss
from gasr_tpu.parallel.sharding import (
    batch_specs, deepspeech_param_specs, shard_tree)


def make_optimizer(learning_rate: float = 3e-4,
                   weight_decay: float = 1e-6) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


def make_train_step(config: Config,
                    optimizer: optax.GradientTransformation,
                    remat: bool = False,
                    compute_dtype=None,
                    augment: bool = False,
                    attn_impl: str = "auto",
                    stem_impl: str = "auto"):
    """Returns train_step(params, opt_state, batch[, key]) ->
    (params, opt_state, metrics). Pure; jit/pjit with any shardings.

    remat: jax.checkpoint the model forward — trades recompute for
    activation memory (the HBM lever SURVEY.md §0 calls for; the full
    hidden history of a 2048-wide RNN at B=256 T=200 is ~0.4 GB/layer).
    compute_dtype: e.g. jnp.bfloat16 — mixed-precision policy (params
    and loss stay f32; model matmuls run at the reduced dtype).
    augment: apply SpecAugment to the input features (requires `key`).
    attn_impl: forwarded to the conformer families ("auto" | "xla" |
    "pallas") — grads through the flash path are supported (custom_vjp,
    r5), so bf16 conformer training rides the fast forward.
    """

    def forward(params, inputs):
        kw = {}
        if compute_dtype is not None:
            # every model family accepts the kwarg (deepspeech + conformer
            # honor it; bilstm/ds2 swallow it via **_ — their recurrent
            # cores are f32-bound by the scan carry either way)
            kw["compute_dtype"] = compute_dtype
        if attn_impl != "auto":
            kw["attn_impl"] = attn_impl
        if stem_impl != "auto":
            kw["stem_impl"] = stem_impl
        return model_apply(config, params, inputs, **kw)

    fwd = jax.checkpoint(forward) if remat else forward

    def loss_fn(params, batch, key=None):
        inputs = batch["inputs"]
        if augment:
            from gasr_tpu.data.augment import spec_augment
            inputs = spec_augment(key, inputs)
        lp = fwd(params, inputs)                               # [T, B, V+1]
        losses = ctc_loss(lp, batch["labels"], batch["input_lengths"],
                          batch["label_lengths"], blank_id=config.blank_id)
        norm = jnp.maximum(batch["label_lengths"].astype(jnp.float32), 1.0)
        return (losses / norm).mean()

    def train_step(params, opt_state, batch, key=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_sharded_train_step(config: Config, mesh: Mesh,
                            optimizer: Optional[
                                optax.GradientTransformation] = None,
                            key: Optional[jax.Array] = None):
    """Build (jitted step, sharded params, sharded opt_state).

    Params are GSPMD-sharded per deepspeech_param_specs; the batch arrives
    data-parallel. XLA inserts the ICI collectives.
    """
    optimizer = optimizer or make_optimizer()
    key = key if key is not None else jax.random.PRNGKey(config.seed)

    params = model_init(config, key)
    pspecs = deepspeech_param_specs(params)
    params = shard_tree(params, pspecs, mesh)
    opt_state = optimizer.init(params)

    step = make_train_step(config, optimizer)
    bspecs = batch_specs()

    jit_step = jax.jit(
        step,
        in_shardings=(
            jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                         is_leaf=lambda x: isinstance(x, P)),
            None,  # opt_state shardings: let XLA propagate from params
            jax.tree.map(lambda s: NamedSharding(mesh, s), bspecs,
                         is_leaf=lambda x: isinstance(x, P)),
        ),
        donate_argnums=(0, 1),
    )
    return jit_step, params, opt_state


def train_loop(config: Config, num_steps: int = 20,
               checkpoint_path: Optional[str] = None,
               resume: bool = False, log_every: int = 5,
               mesh=None):
    """Training loop with checkpoint/resume.

    The reference has no checkpointing (SURVEY.md §5); here model params
    + step counter round-trip through runtime.checkpoint. Loss on the
    synthetic workload must decrease — asserted in tests.
    """
    import numpy as np
    from gasr_tpu.runtime.checkpoint import load_params, save_params
    from gasr_tpu.runtime.timer import Timer

    optimizer = make_optimizer()
    params = model_init(config, jax.random.PRNGKey(config.seed))
    start_step = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        blob = load_params(checkpoint_path, {"params": params,
                                             "step": jnp.zeros((), jnp.int32)})
        params = blob["params"]
        start_step = int(blob["step"])
    opt_state = optimizer.init(params)
    step_fn = jax.jit(make_train_step(config, optimizer),
                      donate_argnums=(0, 1))

    key = jax.random.PRNGKey(1234 + start_step)
    losses = []
    for i in range(start_step, start_step + num_steps):
        key, k = jax.random.split(key)
        batch = synthetic_batch(config, k)
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if (i + 1) % log_every == 0 or i == start_step:
            Timer.sync(metrics)
            loss = float(metrics["loss"])
            losses.append(loss)
            print(f"step {i + 1}: loss={loss:.4f} "
                  f"grad_norm={float(metrics['grad_norm']):.3f}",
                  flush=True)
    if checkpoint_path:
        save_params(checkpoint_path,
                    {"params": params,
                     "step": jnp.asarray(start_step + num_steps, jnp.int32)})
    return params, losses


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deepspeech")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    cfg = Config(model=args.model, batch_size=args.batch,
                 linear_size=args.hidden, rnn_hidden_size=args.hidden,
                 seg_len=args.frames, vocab_size=28)
    train_loop(cfg, num_steps=args.steps, checkpoint_path=args.checkpoint,
               resume=args.resume)


def synthetic_batch(config: Config, key: jax.Array, max_label_len: int = 20
                    ) -> Dict[str, jax.Array]:
    """Random batch in the training-batch schema (synthetic workload,
    mirroring the baseline harness's random inputs, baseline/main.py:39)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    B, T = config.batch_size, config.seg_len
    S = max_label_len
    return {
        "inputs": jax.random.uniform(k1, (B, T, config.feat_size)),
        "labels": jax.random.randint(k2, (B, S), 1, config.output_size),
        "input_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jax.random.randint(k4, (B,), S // 2, S + 1),
    }
if __name__ == "__main__":
    main()
