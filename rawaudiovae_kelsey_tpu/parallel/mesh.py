"""Device meshes.

The reference was strictly single-process single-device (train.py:88-90; no
torch.distributed anywhere — SURVEY.md §2).  The TPU-native scaling story is a
2-D ``jax.sharding.Mesh`` with axes:

  * ``data``  — batch (frame) dimension; gradient all-reduce rides ICI via the
    ``psum`` XLA inserts under pjit.
  * ``model`` — the hidden ``n_units`` dimension of the dense VAE (Megatron
    column/row split), only needed for the wide variants.

Multi-host (DCN) uses the standard JAX runtime: ``jax.distributed.initialize``
gives each host its slice of ``jax.devices()``, and per-host ingest shards the
wav file list (data/corpus.py:shard_files).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data_parallel: int = 0, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.  ``data_parallel=0`` means "all devices
    divided by model_parallel"."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel <= 0:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices"
        )
    # Auto axis types: we annotate inputs/constraints and let GSPMD propagate
    # (jax 0.9 defaults to Explicit mode, which forbids
    # with_sharding_constraint).
    return jax.make_mesh(
        (data_parallel, model_parallel), (DATA_AXIS, MODEL_AXIS),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto),
    )


def maybe_initialize_distributed(coordinator_address: str = "",
                                 num_processes: int = 0,
                                 process_id: int = -1) -> bool:
    """Multi-host (DCN) bring-up via the standard JAX runtime.

    On TPU pods the arguments come from the environment and all three can be
    left empty; explicit values support manual clusters.  Idempotent when
    already initialized.  MUST run before anything touches the XLA backend
    — the guard is ``jax.distributed.is_initialized()``, NOT
    ``jax.process_count()``, because process_count itself initializes the
    backend and would make the subsequent ``jax.distributed.initialize``
    raise unconditionally.  Failures propagate: the user asked for
    multihost ([tpu] multihost / explicit coordinator), and silently
    degrading would have every host train its own independent copy into
    the shared workspace."""
    if jax.distributed.is_initialized():
        return True
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def host_shard_info() -> tuple[int, int]:
    """(host_id, num_hosts) for per-host ingest sharding."""
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns writing (checkpoints, TB, wavs)."""
    return jax.process_index() == 0


def global_batch_from_local(mesh: Mesh, local_batch) -> jax.Array:
    """Assemble a globally-sharded batch from this host's local rows.

    Single-host this is just a sharded ``device_put``; multi-host it stitches
    each host's shard into one global array over the ``data`` axis
    (``jax.make_array_from_process_local_data``) so no host ever materializes
    the full batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Frames are embarrassingly parallel: shard batch over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_axis_process_contiguous(mesh: Mesh) -> bool:
    """True iff every process's devices occupy one contiguous run of
    ``data``-axis indices, i.e. each host's local rows of a
    ``P(DATA_AXIS)``-sharded array form a single global block.

    ``jax.make_mesh`` may topology-reorder devices on real pods, so this
    cannot be assumed.  The answer is computed from the GLOBAL device
    array — identical on every host — so callers can gate a collective
    path on it without divergence (a per-host check after a collective
    could deadlock the processes that passed)."""
    import numpy as np

    axis = list(mesh.axis_names).index(DATA_AXIS)
    rows: dict[int, set] = {}
    for idx, dev in np.ndenumerate(mesh.devices):
        rows.setdefault(dev.process_index, set()).add(idx[axis])
    return all(max(s) - min(s) + 1 == len(s) for s in rows.values())
