from gasr_tpu.parallel.mesh import make_mesh  # noqa: F401
from gasr_tpu.parallel.sharding import (  # noqa: F401
    batch_specs, deepspeech_param_specs, shard_tree,
)
