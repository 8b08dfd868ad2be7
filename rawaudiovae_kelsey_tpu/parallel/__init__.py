from rawaudiovae_kelsey_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_axis_process_contiguous,
    global_batch_from_local,
    host_shard_info,
    is_coordinator,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
)
from rawaudiovae_kelsey_tpu.parallel.sharding import (  # noqa: F401
    named_shardings,
    param_specs,
    shard_params,
)
from rawaudiovae_kelsey_tpu.parallel.step import (  # noqa: F401
    build_eval_step,
    build_train_step,
    make_loss_fn,
)
from rawaudiovae_kelsey_tpu.parallel.spmd import (  # noqa: F401
    build_shard_map_train_step,
)
