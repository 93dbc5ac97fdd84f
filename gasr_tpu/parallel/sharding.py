"""Sharding rules: PartitionSpecs for params and batches.

GSPMD tensor parallelism for the DeepSpeech family (the reference's
2048-wide config is the motivating shape, baseline/config.json:6-7):

  - mlp1..3 weights [in, out]: shard `out` on 'model' (column parallel);
    biases sharded on 'model'.
  - rnn w_ih [in, H]: shard H; w_hh [H, H]: shard the OUTPUT dim only —
    the recurrence h@w_hh all-gathers h (replicated activations) and
    produces sharded pre-activations; XLA chooses the collective.
  - mlp5 weight [H, out]: shard `in` (row parallel — consumes the
    sharded RNN output, yielding a psum), mlp6 replicated.
  - batch [B, T, F]: shard B on 'data'.

These are *annotations*; XLA/GSPMD inserts all-gather/reduce-scatter over
ICI. Activations inside jit are left to the partitioner except where
with_sharding_constraint pins them.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cell_specs(tp: str | None) -> dict:
    return {
        "w_ih": P(None, tp),
        "w_hh": P(None, tp),
        "b_ih": P(tp),
        "b_hh": P(tp),
    }


def deepspeech_param_specs(params: Dict[str, Any],
                           tp_axis: str = "model") -> Dict[str, Any]:
    """PartitionSpec pytree matching a deepspeech params pytree."""
    tp = tp_axis
    rnn = {"layers": [_cell_specs(tp) for _ in params["rnn"]["layers"]]}
    if "layers_rev" in params["rnn"]:
        rnn["layers_rev"] = [
            _cell_specs(tp) for _ in params["rnn"]["layers_rev"]]
    return {
        "mlp1": {"w": P(None, tp), "b": P(tp)},
        "mlp2": {"w": P(None, tp), "b": P(tp)},
        "mlp3": {"w": P(None, tp), "b": P(tp)},
        "rnn": rnn,
        "mlp5": {"w": P(tp, None), "b": P(None)},
        "mlp6": {"w": P(None, None), "b": P(None)},
    }


def generic_param_specs(params: Any, tp_axis: str = "model",
                        min_dim: int = 256) -> Any:
    """Heuristic TP specs for arbitrary model pytrees (BiLSTM, DS2,
    Conformer-L): shard the LAST axis of any >=2D weight whose last dim
    is divisible-by-mesh and >= min_dim; replicate everything else.
    Column-parallel everywhere keeps activations replicated and lets
    GSPMD insert all-gathers only where profitable."""
    def spec_for(x) -> P:
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[-1] >= min_dim:
            return P(*([None] * (len(shape) - 1) + [tp_axis]))
        return P()
    return jax.tree.map(spec_for, params)


def batch_specs(dp_axis: str = "data") -> Dict[str, P]:
    """Specs for a training batch dict."""
    return {
        "inputs": P(dp_axis, None, None),        # [B, T, F]
        "labels": P(dp_axis, None),              # [B, S]
        "input_lengths": P(dp_axis),             # [B]
        "label_lengths": P(dp_axis),             # [B]
    }


def shard_tree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """Device-put a pytree with NamedShardings built from specs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))
