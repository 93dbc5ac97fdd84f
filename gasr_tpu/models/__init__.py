from gasr_tpu.models.deepspeech import (  # noqa: F401
    deepspeech_apply, deepspeech_init,
)


def model_init(config, key):
    """Build params for the configured model family."""
    name = config.model
    if name == "deepspeech":
        return deepspeech_init(key, config)
    if name == "bilstm":
        from gasr_tpu.models.bilstm import bilstm_init
        return bilstm_init(key, config)
    if name == "deepspeech2":
        from gasr_tpu.models.deepspeech2 import ds2_init
        return ds2_init(key, config)
    if name in ("conformer_s", "conformer_l", "conformer"):
        from gasr_tpu.models.conformer import conformer_init
        return conformer_init(key, config)
    raise ValueError(f"unknown model {name!r}")


def model_apply(config, params, x, **kw):
    """Apply the configured model: x [B, T, F] -> log-probs [T, B, V+1]."""
    name = config.model
    if name == "deepspeech":
        return deepspeech_apply(params, x, **kw)
    if name == "bilstm":
        from gasr_tpu.models.bilstm import bilstm_apply
        return bilstm_apply(params, x, **kw)
    if name == "deepspeech2":
        from gasr_tpu.models.deepspeech2 import ds2_apply
        return ds2_apply(params, x, **kw)
    if name in ("conformer_s", "conformer_l", "conformer"):
        from gasr_tpu.models.conformer import conformer_apply
        return conformer_apply(config, params, x, **kw)
    raise ValueError(f"unknown model {name!r}")
