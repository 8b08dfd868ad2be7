from rawaudiovae_kelsey_tpu.eval.fixtures import (  # noqa: F401
    init_test_audio,
    reconstruction_mse,
)
