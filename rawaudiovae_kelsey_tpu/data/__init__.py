from rawaudiovae_kelsey_tpu.data.framing import (  # noqa: F401
    nonoverlapping_frame_count,
    nonoverlapping_frames,
    overlapping_frame_count,
    overlapping_frames,
    pad_to_multiple,
    streaming_file_frames,
)
from rawaudiovae_kelsey_tpu.data.corpus import (  # noqa: F401
    build_corpus,
    list_wavs,
    shard_files,
)
from rawaudiovae_kelsey_tpu.data.datasets import (  # noqa: F401
    AudioFrameDataset,
    StreamingFrameDataset,
    TestFrameDataset,
)
from rawaudiovae_kelsey_tpu.data.loader import (  # noqa: F401
    DevicePrefetcher,
    pad_batches_for_mesh,
    prefetch_to_device,
)
