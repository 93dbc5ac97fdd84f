from gasr_tpu.data.features import logmel_jax  # noqa: F401
from gasr_tpu.data.dataset import SyntheticDataset, text_to_ids  # noqa: F401
