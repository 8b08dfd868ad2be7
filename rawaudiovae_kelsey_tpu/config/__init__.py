from rawaudiovae_kelsey_tpu.config.schema import (  # noqa: F401
    AudioConfig,
    Config,
    DatasetConfig,
    ExtraConfig,
    NotesConfig,
    TPUConfig,
    TrainingConfig,
    VAEConfig,
)
from rawaudiovae_kelsey_tpu.config.ini import load_config, save_config  # noqa: F401
from rawaudiovae_kelsey_tpu.config.workspace import (  # noqa: F401
    Workspace,
    create_workspace,
    latest_workspace,
    open_workspace,
)
