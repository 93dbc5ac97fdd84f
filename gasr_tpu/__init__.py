"""gasr_tpu — TPU-native CTC speech-recognition framework.

A from-scratch JAX/XLA/Pallas re-imagination of the capabilities of
jrxk/GPU-Accelerated-Speech-Recognition ("Deep Dark Speech",
/root/reference/main.cpp:14): CTC acoustic models (DeepSpeech-1 MLP+RNN,
BiLSTM, DeepSpeech2, Conformer), batched device-side CTC beam-search
decoding, CTC loss/training, memory+timing observability, and multi-chip
scaling via jax.sharding meshes.

Design stance (vs the reference's CUDA/C++):
  - Pure-functional models: params are pytrees, everything jit-compiled.
    The reference's per-(t,layer) host dispatch (RNN.cu:15-27) becomes a
    single `lax.scan`; hot recurrences get Pallas kernels.
  - The decoder (CTCBeamSearch.cu) becomes a fixed-shape tensor program:
    extend -> hash-sort -> segment-merge -> top-k, inside `lax.scan`.
  - cuMatrix/MemoryMonitor buffer management becomes XLA buffer donation
    plus a device memory_stats profiler.
  - Parallelism: jax.sharding.Mesh + NamedSharding/shard_map collectives
    instead of single-GPU SIMT.
"""

__version__ = "0.1.0"

from gasr_tpu.config import Config, load_configs  # noqa: F401
