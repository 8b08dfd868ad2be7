from rawaudiovae_kelsey_tpu.infer.api import (  # noqa: F401
    decode_trajectory,
    encode_trajectory,
    encode_trajectory_sharded,
    frame_audio,
    interpolate_stepwise,
    interpolate_timevarying,
    reconstruct,
    sample_z,
    sine_alfa,
    stretch_alfa,
)
from rawaudiovae_kelsey_tpu.infer.audio_utils import (  # noqa: F401
    concat_random_audio,
    match_audio_size,
)
from rawaudiovae_kelsey_tpu.infer.som import SomClusters, concat_audio_som  # noqa: F401
from rawaudiovae_kelsey_tpu.infer.synthesis import (  # noqa: F401
    flat_concat,
    overlap_add,
    stretch_resynthesis,
)
from rawaudiovae_kelsey_tpu.infer.export import (  # noqa: F401
    export_npz,
    export_stablehlo,
    load_stablehlo,
    make_forward_fn,
)
from rawaudiovae_kelsey_tpu.infer.onnx_model import (  # noqa: F401
    OnnxDecodeError,
    OnnxModel,
    export_onnx,
)
from rawaudiovae_kelsey_tpu.infer.server import (  # noqa: F401
    InferenceServer,
    LiveSession,
)
from rawaudiovae_kelsey_tpu.infer.http import HttpInferenceServer  # noqa: F401
from rawaudiovae_kelsey_tpu.infer.som_train import (  # noqa: F401
    assign_clusters,
    train_som,
    train_som_for_corpus,
    write_som_artifacts,
)
