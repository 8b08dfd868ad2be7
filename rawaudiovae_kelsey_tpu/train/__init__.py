from rawaudiovae_kelsey_tpu.train.state import TrainState  # noqa: F401
from rawaudiovae_kelsey_tpu.train.optim import build_optimizer  # noqa: F401
from rawaudiovae_kelsey_tpu.train.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
