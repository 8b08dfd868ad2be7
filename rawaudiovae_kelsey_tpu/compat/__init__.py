from rawaudiovae_kelsey_tpu.compat.torch_import import (  # noqa: F401
    load_torch_checkpoint,
    params_to_state_dict,
    state_dict_to_params,
)
