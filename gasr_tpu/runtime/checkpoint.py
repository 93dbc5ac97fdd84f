"""Checkpoint save/load and PyTorch weight import.

The reference has no checkpointing — weights are random (Linear.cu:12) or
hard-coded via initParams (Linear.cu:23, RNN_Cell.cu:35). initParams exists
so the CUDA model can load exact PyTorch weights for parity; our equivalent
is `import_torch_deepspeech`, mapping a baseline/model.py state_dict onto
our pytree (transposing to the reference's [in, out] convention,
RNN_Cell.h:21-24).

Native save/load uses msgpack-free raw npz (no extra deps) plus an orbax
path when available.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------- pytree <-> flat dict ----------------

def flatten_params(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def save_params(path: str, params: Any) -> None:
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


# ---------------- orbax backend (multi-host-capable) ----------------

def save_params_orbax(path: str, params: Any) -> None:
    """Orbax save — the multi-host path (each host writes its shards;
    use for sharded params on a pod slice). npz remains the lightweight
    single-host default."""
    import orbax.checkpoint as ocp
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        return ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.StandardRestore(like))


def load_params(path: str, like: Any) -> Any:
    """Load into the structure of `like` (names must match)."""
    with np.load(path) as data:
        flat = dict(data)

    def rebuild(template: Any, prefix: str = "") -> Any:
        if isinstance(template, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            out = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(template)]
            return type(template)(out) if isinstance(template, tuple) else out
        return jnp.asarray(flat[prefix[:-1]])

    return rebuild(like)


# ---------------- PyTorch import ----------------

def _t(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32).T)


def import_torch_deepspeech(state_dict: Dict[str, Any],
                            num_layers: int = 1,
                            bidirectional: bool = False) -> dict:
    """Map baseline/model.py DeepSpeech state_dict -> our params pytree.

    torch Linear stores weight [out, in]; we store [in, out] (reference
    convention, Linear.h:21). torch RNN stores weight_ih_l{l} [H, in];
    we store [in, H] (RNN_Cell.h:21-24).
    Accepts tensors or numpy arrays (state_dict values need .numpy() or
    be array-like).
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}

    def lin(wk: str, bk: str) -> dict:
        return {"w": jnp.asarray(_t(sd[wk])),
                "b": jnp.asarray(sd[bk].astype(np.float32))}

    layers, layers_rev = [], []
    for l in range(num_layers):
        layers.append({
            "w_ih": jnp.asarray(_t(sd[f"rnn.weight_ih_l{l}"])),
            "w_hh": jnp.asarray(_t(sd[f"rnn.weight_hh_l{l}"])),
            "b_ih": jnp.asarray(sd[f"rnn.bias_ih_l{l}"].astype(np.float32)),
            "b_hh": jnp.asarray(sd[f"rnn.bias_hh_l{l}"].astype(np.float32)),
        })
        if bidirectional:
            layers_rev.append({
                "w_ih": jnp.asarray(_t(sd[f"rnn.weight_ih_l{l}_reverse"])),
                "w_hh": jnp.asarray(_t(sd[f"rnn.weight_hh_l{l}_reverse"])),
                "b_ih": jnp.asarray(sd[f"rnn.bias_ih_l{l}_reverse"].astype(np.float32)),
                "b_hh": jnp.asarray(sd[f"rnn.bias_hh_l{l}_reverse"].astype(np.float32)),
            })
    rnn = {"layers": layers}
    if bidirectional:
        rnn["layers_rev"] = layers_rev

    return {
        "mlp1": lin("mlp123.0.weight", "mlp123.0.bias"),
        "mlp2": lin("mlp123.2.weight", "mlp123.2.bias"),
        "mlp3": lin("mlp123.4.weight", "mlp123.4.bias"),
        "rnn": rnn,
        "mlp5": lin("mlp56.0.weight", "mlp56.0.bias"),
        "mlp6": lin("mlp56.2.weight", "mlp56.2.bias"),
    }


def import_torch_lstm(state_dict: Dict[str, Any], num_layers: int = 1,
                      bidirectional: bool = False,
                      prefix: str = "") -> dict:
    """Map a torch.nn.LSTM state_dict onto our ops/lstm.py pytree
    (gate order i,f,g,o preserved; weights transposed to [in, 4H])."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
              else np.asarray(v))
          for k, v in state_dict.items()}
    layers, layers_rev = [], []
    for l in range(num_layers):
        def cell(suffix: str) -> dict:
            return {
                "w_ih": jnp.asarray(_t(sd[f"{prefix}weight_ih_l{l}{suffix}"])),
                "w_hh": jnp.asarray(_t(sd[f"{prefix}weight_hh_l{l}{suffix}"])),
                "b_ih": jnp.asarray(
                    sd[f"{prefix}bias_ih_l{l}{suffix}"].astype(np.float32)),
                "b_hh": jnp.asarray(
                    sd[f"{prefix}bias_hh_l{l}{suffix}"].astype(np.float32)),
            }
        layers.append(cell(""))
        if bidirectional:
            layers_rev.append(cell("_reverse"))
    params = {"layers": layers}
    if bidirectional:
        params["layers_rev"] = layers_rev
    return params
