from rawaudiovae_kelsey_tpu.models.vae import (  # noqa: F401
    decode,
    encode,
    forward,
    init_dense,
    linear,
    loss_components,
    loss_fn,
    param_count,
    reparameterize,
)
from rawaudiovae_kelsey_tpu.models.registry import ModelDef, build_model  # noqa: F401
