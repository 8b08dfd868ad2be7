"""Device-resident corpus training: the whole epoch on-chip.

The reference moved every batch host→device inside the hot loop
(``data.to(device)``, train.py:182) — and so does our host-fed path when the
corpus is large.  But raw audio is tiny by TPU standards, so when it fits we:

  1. upload the training data ONCE, in one of two layouts:
       * ``frames`` — the materialized overlapping-frame matrix
         (``seg/hop ×`` more HBM, e.g. 8× at 1024/128).  Per-step batch
         assembly is a contiguous row gather: **2.3 ms** per (4096, 1024)
         batch on v5e;
       * ``corpus`` — the raw 1-D sample array (1× HBM).  Batch assembly is
         a vmapped ``dynamic_slice`` of 1024-sample runs: 4.2 ms.  (A naive
         2-D index gather costs 34 ms — scattered-offset gathers are the
         slowest thing a TPU does; measured, see docs/PERF.md);
  2. run an ENTIRE epoch inside one jitted call: per-epoch frame permutation
     from the threefry key, on-chip batch assembly, ``lax.scan`` over all
     optimizer steps;
  3. return the final state plus the per-batch loss vector.

Host↔device traffic per epoch: one loss-vector fetch.  The last partial
batch is dropped (``drop_last`` semantics — the host-fed path keeps it;
divergence documented in DIVERGENCES.md).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rawaudiovae_kelsey_tpu.config.schema import Config
from rawaudiovae_kelsey_tpu.data.framing import (
    overlapping_frame_count,
    overlapping_frames,
)
from rawaudiovae_kelsey_tpu.models.registry import ModelDef
from rawaudiovae_kelsey_tpu.ops.pallas_mlp import vmem_headroom
from rawaudiovae_kelsey_tpu.parallel.step import (
    _matmul_precision,
    make_loss_fn,
)
from rawaudiovae_kelsey_tpu.train.state import TrainState


def choose_layout(n_samples: int, seg: int, hop: int, dtype_bytes: int,
                  budget_bytes: int) -> str | None:
    """"frames" if TWICE the 8× matrix fits the budget (the per-epoch
    whole-matrix shuffle keeps one transient permuted copy next to the
    original), else "corpus" if the raw samples fit, else None (fall back
    to host-fed batches)."""
    n_frames = max(0, overlapping_frame_count(n_samples, seg, hop))
    if 2 * n_frames * seg * dtype_bytes <= budget_bytes:
        return "frames"
    if n_samples * dtype_bytes <= budget_bytes:
        return "corpus"
    return None


def put_resident(corpus: np.ndarray, cfg: Config, layout: str) -> jax.Array:
    """One-time upload in the chosen layout; bf16 when the compute precision
    is bf16 (halves HBM) else fp32."""
    dtype = jnp.bfloat16 if cfg.tpu.precision == "bfloat16" else jnp.float32
    if layout == "frames":
        frames = overlapping_frames(
            np.asarray(corpus, np.float32),
            cfg.audio.segment_length, cfg.audio.hop_length,
        )
        return jax.device_put(jnp.asarray(frames, dtype))
    # corpus layout: pad the tail like the host framer does — without it the
    # last windows' dynamic_slice would clamp and re-read earlier samples
    from rawaudiovae_kelsey_tpu.data.framing import pad_to_multiple

    padded = pad_to_multiple(np.asarray(corpus, np.float32),
                             cfg.audio.hop_length)
    return jax.device_put(jnp.asarray(padded, dtype))


def pick_block_rows(n_frames: int, n_batches: int, batch: int) -> int:
    """Block height for the block-granular resident shuffle: the SMALLEST
    power-of-two divisor of ``batch`` (≥32) that leaves enough whole blocks
    to fill every batch — 32 rows of a 1024-sample frame is ~64 KB
    contiguous per DMA descriptor, already bandwidth-bound, and smaller
    blocks shuffle finer.  Returns 1 (row granularity) when none fits."""
    for blk in (32, 64, 128, 256, 512):
        if batch % blk == 0 and (n_frames // blk) * blk >= n_batches * batch:
            return blk
    return 1


def build_resident_epoch(
    model: ModelDef,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    n_samples: int,
    layout: str = "frames",
    group_k: int = 64,
) -> Tuple[Callable, int]:
    """Returns ``(run_epochs, n_batches)`` where
    ``run_epochs(state, data, epoch0, k=1) ->
    (state', losses[group_k, n_batches])`` is ONE compiled call covering up
    to ``group_k`` consecutive full epochs.  ``k`` is DYNAMIC (round 3):
    every call compiles the same ``group_k``-epoch graph and epochs past
    ``k`` are masked no-ops (state passes through untouched, their loss
    rows read NaN) — a whole run costs exactly one compile, where the
    round-2 static-``k`` formulation recompiled per distinct group size
    (~30 s each warm, minutes cold).  Callers slice ``losses[:k]``.

    All ``group_k`` epoch permutations are drawn up front in ONE vmapped
    ``jax.random.permutation`` (late round 3): a batched sort fills the VPU
    sublanes that ``group_k`` serial per-epoch sorts leave idle — measured
    3.6 → 1.5 ms per epoch at 41k frames / G=20 — and vmap preserves
    per-key results, so the shuffle order is bit-identical to the previous
    per-epoch formulation.  Because the masked tail's permutations are
    computed regardless, callers should size ``group_k`` near their typical
    active ``k`` (the epoch driver caps it at the checkpoint cadence).

    ``cfg.tpu.resident_shuffle = "block"`` (frames layout only) trades exact
    row-uniform shuffling for block-granular shuffling: frames move in
    contiguous :func:`pick_block_rows`-row blocks, so the per-epoch shuffle
    gather runs contiguous-DMA at HBM bandwidth instead of the scattered
    row-gather path.  Consecutive overlapping frames (which are ~87.5%
    redundant neighbors at seg 1024 / hop 128 anyway) then stay together
    within a block; the last ``n_frames mod block`` frames never train.
    Documented in DIVERGENCES.md.

    ``data`` is the array from :func:`put_resident` in the matching layout.
    """
    seg = model.segment_length
    hop = cfg.audio.hop_length
    batch = cfg.training.batch_size
    n_frames = max(0, overlapping_frame_count(n_samples, seg, hop))
    n_batches = n_frames // batch
    if n_batches == 0:
        raise ValueError(
            f"corpus has {n_frames} frames < one batch of {batch}"
        )
    block_rows = 1
    if cfg.tpu.resident_shuffle == "block" and layout == "frames":
        block_rows = pick_block_rows(n_frames, n_batches, batch)
    n_shuffle = n_frames // block_rows    # shuffle units per epoch
    loss_fn = make_loss_fn(model, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    prec = _matmul_precision(cfg.tpu.precision)

    def body(state, xb):
        key = jax.random.fold_in(state.rng, state.step)
        (loss, (mse, kld)), grads = grad_fn(state.params, key, xb)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_state = TrainState(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
            rng=state.rng,
            step=state.step + 1,
        )
        return new_state, loss.astype(jnp.float32)

    def _one_epoch(state: TrainState, data: jax.Array, sel):
        if layout == "frames":
            if block_rows > 1:
                # block-granular shuffle: gather whole contiguous blocks —
                # the DMA engine streams ``block_rows`` rows per descriptor
                # instead of one, so this runs at copy bandwidth where the
                # row gather is descriptor-bound
                blocks = data[: n_shuffle * block_rows].reshape(
                    n_shuffle, block_rows, seg)
                shuffled = blocks[sel].reshape(n_batches, batch, seg)
            else:
                # ONE whole-matrix gather per epoch, then the step scan
                # consumes contiguous slices — a per-batch row gather
                # inside the scan serializes with the train step and
                # measured ~0.5 ms/batch of dead time (docs/PERF.md).
                # Batches are bit-identical to gathering rows per step:
                # data[sel][a:b] == data[sel[a:b]].  Transient HBM cost:
                # one extra frame-matrix copy (accounted by choose_layout).
                shuffled = data[sel].reshape(n_batches, batch, seg)
            return jax.lax.scan(body, state, shuffled)

        starts = sel.reshape(n_batches, batch)

        def corpus_body(state, st):
            def one(s):
                return jax.lax.dynamic_slice(data, (s * hop,), (seg,))
            return body(state, jax.vmap(one)(st))     # 1024-sample runs

        return jax.lax.scan(corpus_body, state, starts)

    used = n_batches * batch // block_rows  # shuffle units consumed per epoch

    # Up to group_k epochs per dispatch: a small-corpus epoch computes in
    # ~15 ms, below one host-link round trip, so per-epoch dispatches are
    # latency-bound — grouping scans the epochs on-device and returns the
    # (group_k, n_batches) loss matrix in one call.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epochs(state: TrainState, data: jax.Array, epoch0, k: int = 1):
        # vmem_headroom: scoped-vmem accounting charges the fused-backward
        # custom calls more inside this scan than standalone (measured
        # 16.63 MB > the 16 MB default for enc_bwd_dw1) — trace-scoped raise
        with jax.default_matmul_precision(prec), vmem_headroom():
            epoch0 = jnp.asarray(epoch0)
            # all group epochs' permutations in one BATCHED sort (see
            # docstring); vmap preserves per-key results so row order
            # matches the per-epoch jax.random.permutation exactly
            base = jax.random.fold_in(state.rng, 0x5EED)
            keys = jax.vmap(
                lambda e: jax.random.fold_in(base, e)
            )(epoch0 + jnp.arange(group_k))
            perms = jax.vmap(
                lambda kk: jax.random.permutation(kk, n_shuffle)[:used]
            )(keys)

            def eb(s, i):
                return jax.lax.cond(
                    i < k,
                    lambda ss: _one_epoch(ss, data, perms[i]),
                    lambda ss: (ss, jnp.full((n_batches,), jnp.nan,
                                             jnp.float32)),
                    s,
                )

            return jax.lax.scan(eb, state, jnp.arange(group_k))

    return run_epochs, n_batches


def pad_frames_for_mesh(frames: np.ndarray, n_shards: int) -> np.ndarray:
    """Wrap-pad the frame matrix so rows divide evenly across shards."""
    return _wrap_pad_to(frames, -(-len(frames) // n_shards) * n_shards)


def _two_pass_shuffle(frames_local, key, axis_name: str, n_shards: int):
    """Global-ish shuffle of a sharded frame matrix, entirely on-device.

    Pass 1: permute the local rows; pass 2: ``all_to_all`` block transpose —
    each chip keeps 1/n of its rows and sends 1/n to every other chip, so the
    resulting shard holds an equal random slice of every original shard.  Not
    a uniform permutation of all N rows, but every batch now mixes frames
    from the whole corpus (the standard distributed two-pass shuffle); the
    caller's per-step permutation adds the third pass.  Rows beyond the
    largest multiple of ``n_shards`` stay local (they are random rows thanks
    to pass 1).  One collective per epoch, riding ICI.
    """
    n_local = frames_local.shape[0]
    pre = jax.random.permutation(key, n_local)
    frames_local = frames_local[pre]
    blk = n_local // n_shards
    if n_shards == 1 or blk == 0:
        return frames_local
    head = jax.lax.all_to_all(
        frames_local[: blk * n_shards], axis_name,
        split_axis=0, concat_axis=0, tiled=True,
    )
    if blk * n_shards == n_local:
        return head
    return jnp.concatenate([head, frames_local[blk * n_shards:]], axis=0)


def build_resident_epoch_sharded(
    model: ModelDef,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    n_frames_padded: int,
    mesh,
    group_k: int = 64,
) -> Tuple[Callable, int]:
    """Multi-chip resident epochs: the frame matrix is sharded over the mesh
    ``data`` axis; every chip draws its per-epoch local permutation, gathers
    its ``batch/n`` rows per step, and the single collective is the gradient
    pmean — whole epochs on-chip across the whole mesh.

    Shuffle scope follows ``cfg.tpu.resident_shuffle``: "global" (default)
    runs :func:`_two_pass_shuffle` each epoch so batches mix frames from
    every shard; "local" permutes only within each chip's contiguous block
    (the locality-restricted shuffle sharded data loaders use).  Frames
    must be padded to the shard count first (:func:`pad_frames_for_mesh`).

    Returns ``(run_epochs, n_batches)``;
    ``run_epochs(state, sharded_frames, epoch0, k=1) ->
    (state', losses[group_k, n_batches])`` — like
    :func:`build_resident_epoch`, ``k`` is dynamic against a fixed
    ``group_k``-epoch compiled graph (one compile per run); rows past
    ``k`` are NaN and the state passes through them untouched.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS

    batch = cfg.training.batch_size
    n_shards = mesh.shape[DATA_AXIS]
    if batch % n_shards:
        raise ValueError(
            f"batch_size {batch} not divisible by data shards {n_shards}"
        )
    local_bs = batch // n_shards
    n_local = n_frames_padded // n_shards
    n_batches = n_local // local_bs
    if n_batches == 0:
        raise ValueError(
            f"{n_local} frames/shard < one local batch of {local_bs}"
        )
    loss_fn = make_loss_fn(model, cfg, mesh=mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    prec = _matmul_precision(cfg.tpu.precision)
    reduce = (jax.lax.psum
              if cfg.training.loss_reduction.split()[0] == "sum"
              else jax.lax.pmean)

    # "block" is a single-device formulation; on a mesh it keeps the exact
    # global two-pass shuffle (schema.py comment)
    global_shuffle = cfg.tpu.resident_shuffle in ("global", "block")

    def per_shard(state: TrainState, frames_local, epoch):
        shard = jax.lax.axis_index(DATA_AXIS)
        epoch_key = jax.random.fold_in(
            jax.random.fold_in(state.rng, 0x5EED), epoch
        )
        perm_key = jax.random.fold_in(epoch_key, shard)
        if global_shuffle and n_shards > 1:
            frames_local = _two_pass_shuffle(
                frames_local,
                jax.random.fold_in(
                    jax.random.fold_in(epoch_key, 0xA110), shard
                ),
                DATA_AXIS, n_shards,
            )
        sel = jax.random.permutation(perm_key, n_local)[
            : n_batches * local_bs
        ]
        # one whole-shard gather per epoch (HBM bandwidth), contiguous
        # slices in the step scan — same batches as a per-step row gather
        seg = frames_local.shape[1]
        shuffled = frames_local[sel].reshape(n_batches, local_bs, seg)

        def body(s, xb):
            key = jax.random.fold_in(
                jax.random.fold_in(s.rng, s.step), shard
            )
            (loss, _aux), grads = grad_fn(s.params, key, xb)
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads
            )
            grads = reduce(grads, DATA_AXIS)
            loss = reduce(loss, DATA_AXIS)
            updates, opt_state = optimizer.update(
                grads, s.opt_state, s.params
            )
            return TrainState(
                params=optax.apply_updates(s.params, updates),
                opt_state=opt_state, rng=s.rng, step=s.step + 1,
            ), loss.astype(jnp.float32)

        return jax.lax.scan(body, state, shuffled)

    mapped = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epochs(state, sharded_frames, epoch0, k: int = 1):
        # same trace-scoped vmem raise as the single-device run_epochs
        with jax.default_matmul_precision(prec), vmem_headroom():
            epoch0 = jnp.asarray(epoch0)

            def eb(s, i):
                return jax.lax.cond(
                    i < k,
                    lambda ss: mapped(ss, sharded_frames, epoch0 + i),
                    lambda ss: (ss, jnp.full((n_batches,), jnp.nan,
                                             jnp.float32)),
                    s,
                )

            return jax.lax.scan(eb, state, jnp.arange(group_k))

    return run_epochs, n_batches


def put_frames_sharded(frames: np.ndarray, cfg: Config, mesh) -> "jax.Array":
    """Upload the (padded) frame matrix sharded over the data axis.

    Single-controller: ``frames`` is the GLOBAL matrix, device_put shards
    it.  Multi-host: ``frames`` is this PROCESS's local rows (equal count
    on every host — align with :func:`align_local_rows` first) and the
    hosts' blocks are stitched into one DCN-spanning global array.  Row
    placement across devices is semantically irrelevant to the sharded
    epoch trainer — the two-pass shuffle mixes shards every epoch and the
    gradient reduction is placement-invariant — so no device-order
    (process-contiguity) requirement applies here, unlike the resident
    STREAM's host-side global index plans."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS

    dtype = jnp.bfloat16 if cfg.tpu.precision == "bfloat16" else jnp.float32
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(frames, dtype)
        )
    # cast on the HOST and shard straight from host memory: jnp.asarray
    # would first materialize the whole global matrix on the default
    # device — a transient device-0 OOM for corpora that only fit sharded
    return jax.device_put(np.asarray(frames, dtype), sharding)


def align_local_rows(frames: np.ndarray, mesh) -> np.ndarray:
    """Multi-host prep for :func:`put_frames_sharded`: wrap-pad this host's
    frame rows to the cross-host maximum rounded up to the host's data-axis
    device count, so every process contributes an equal, evenly-shardable
    block.  Wrap-padding repeats local frames — the same epoch semantics as
    the single-host :func:`pad_frames_for_mesh` (duplicated rows train
    again; no masking needed)."""
    from jax.experimental import multihost_utils

    from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS

    if jax.process_count() <= 1:
        return frames
    dph = mesh.shape[DATA_AXIS] // jax.process_count()
    counts = multihost_utils.process_allgather(np.asarray(len(frames)))
    target = -(-int(counts.max()) // max(dph, 1)) * max(dph, 1)
    return _wrap_pad_to(frames, target)


def _wrap_pad_to(frames: np.ndarray, target: int) -> np.ndarray:
    """Wrap-pad ``frames`` to exactly ``target`` rows."""
    if len(frames) >= target:
        return frames[:target]
    if len(frames) == 0:
        # silently returning short rows would desync this process from its
        # peers and deadlock their next collective — fail loudly instead
        raise ValueError(
            "cannot wrap-pad an empty frame matrix: this host's file shard "
            "yielded no frames (more hosts than audio files?)"
        )
    extra = target - len(frames)
    reps = -(-extra // len(frames))
    fill = np.concatenate([frames] * reps, axis=0)[:extra]
    return np.concatenate([frames, fill], axis=0)
