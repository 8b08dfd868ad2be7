"""Streaming trainer — the ``python train_iterable.py --config x.ini`` flow
(train_iterable.py:114-329): an epoch-less loop over a bounded stream of
batches pulled from a cycling, per-pass-shuffled wav-folder dataset.

Contract points kept:
  * ``total_num_batches = total_num_frames // batch_size``
    (train_iterable.py:74) bounds the run;
  * checkpoints keyed on ``batch_id`` (train_iterable.py:220);
  * stdout teed to ``<workdir>/console_log`` (train_iterable.py:117-133);
  * per-batch parameter histograms (train_iterable.py:216-217) — throttled by
    ``[tpu] histogram_interval`` (quirk #10: every batch was pathological).
Fixed: the hard-coded segment_length 1024 (dataset.py:66, quirk #2) and the
degenerate best-model gate (quirk #7).

Two execution paths share all bookkeeping:
  * host-fed (default on meshes / big corpora): background prefetcher feeds
    device batches;
  * device-resident (``[tpu] device_resident``, corpus frame matrix within
    budget; on a mesh the frames replicate and the index batches shard over
    the data axis): the frames upload once and the EXACT stream order
    — per-pass file shuffle, boundary-crossing batches, verified bit-for-bit
    against the host loader — replays on device from staged int32 index
    chunks, scanning several optimizer steps per dispatch.
"""

from __future__ import annotations

import itertools
import time

import numpy as np

import jax

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.data.datasets import StreamingFrameDataset
from rawaudiovae_kelsey_tpu.data.loader import (
    feed_dtype as _feed_dtype,
    prefetch_to_device,
)
from rawaudiovae_kelsey_tpu.observe.logging import tee_stdout
from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding
from rawaudiovae_kelsey_tpu.train import loop as L
from rawaudiovae_kelsey_tpu.train.interrupt import GracefulInterrupt


def train(cfg: Config, verbose: bool = True) -> L.TrainContext:
    datapath = cfg.dataset.datapath_path
    if not datapath.exists():
        raise FileNotFoundError(datapath.resolve())

    ctx = L.setup(cfg)
    try:
        with tee_stdout(ctx.workspace.console_log_path), \
                GracefulInterrupt() as stop:
            return _run(ctx, cfg, verbose, stop)
    finally:
        L.finish(ctx)


def _run(ctx: L.TrainContext, cfg: Config, verbose: bool,
         stop=None) -> L.TrainContext:
    batch_size = cfg.training.batch_size
    total_num_batches = cfg.training.total_num_frames // batch_size
    if total_num_batches <= 0:
        raise ValueError(
            "total_num_frames must be >= batch_size for the streaming trainer"
        )
    print(f"Total number of batches: {total_num_batches}")

    from rawaudiovae_kelsey_tpu.data.validate import check_before_training
    from rawaudiovae_kelsey_tpu.parallel.mesh import host_shard_info

    check_before_training(
        cfg.dataset.datapath_path / "audio", cfg.audio.sampling_rate,
        cfg.dataset.check_dataset, cfg.dataset.check_audio,
    )
    host_id, num_hosts = host_shard_info()
    dataset = StreamingFrameDataset(
        cfg.dataset.datapath_path / "audio",
        cfg.audio.sampling_rate,
        cfg.audio.hop_length,
        cfg.audio.segment_length,   # quirk #2 fix: honors config
        shuffle=True,
        mono=cfg.dataset.mono,
        seed=cfg.tpu.seed + host_id,
        host_id=host_id,
        num_hosts=num_hosts,
    )
    cfg.dataset.total_frames = str(cfg.training.total_num_frames)
    ctx.workspace.snapshot_config(cfg)

    # device-resident stream fast path: when the decoded folder's frame
    # matrix fits the HBM budget, replay the EXACT stream with int32 index
    # batches — audio rows never cross the host link after the upload.
    # Works on a mesh too (frames replicated, index batches sharded over
    # the data axis) and across hosts (each host's file-shard frames are
    # stitched into one DCN-spanning resident array with
    # jax.make_array_from_process_local_data; per-host index plans replay
    # each host's exact local stream).
    multihost_ok = (jax.process_count() == 1
                    or (ctx.mesh is not None
                        and ctx.mesh.shape.get("model", 1) == 1))
    if multihost_ok and jax.process_count() > 1:
        # resident streaming needs each host's rows in one contiguous
        # global block; decided here from the GLOBAL device array (same
        # answer on every host) so auto can degrade to host-fed instead
        # of aborting mid-collective (_run_resident keeps a backstop
        # assertion on the materialized shards)
        from rawaudiovae_kelsey_tpu.parallel.mesh import (
            data_axis_process_contiguous,
        )

        if not data_axis_process_contiguous(ctx.mesh):
            if cfg.tpu.device_resident == "always":
                raise ValueError(
                    "device_resident=always but this mesh's data-axis "
                    "devices are not process-contiguous; use "
                    "device_resident=auto (host-fed fallback) or build "
                    "the mesh in process order"
                )
            multihost_ok = False
    if multihost_ok and cfg.tpu.device_resident != "never":
        est = _estimate_stream_frames(dataset, cfg)
        dtype_bytes = 2 if cfg.tpu.precision == "bfloat16" else 4
        budget = int(cfg.tpu.resident_budget_gb * (1 << 30))
        # the resident bodies take one full-batch value_and_grad — they
        # cannot honor microbatch accumulation, so a config that asked for
        # it (giant batches) must keep the host-fed step that does
        micro = cfg.tpu.microbatch_size
        micro_ok = not (micro and batch_size > micro)
        if jax.process_count() > 1:
            # the fits decision must be IDENTICAL on every process — a
            # host entering _run_resident's collectives while a peer takes
            # the host-fed loop deadlocks the cluster.  Allgather the
            # host-local estimates (any-host None → None), gate on the
            # max; the stitched matrix shards over the data axis, so each
            # device holds ~est/dph rows — budget × devices-per-host
            from jax.experimental import multihost_utils

            ests = multihost_utils.process_allgather(
                np.asarray(-1 if est is None else est, np.int64))
            est = None if int(ests.min()) < 0 else int(ests.max())
            budget *= max(
                ctx.mesh.shape["data"] // jax.process_count(), 1)
        fits = (micro_ok and est is not None
                and est * cfg.audio.segment_length * dtype_bytes <= budget)
        if fits:
            return _run_resident(ctx, cfg, verbose, stop, dataset,
                                 total_num_batches)
        if cfg.tpu.device_resident == "always":
            # don't silently degrade to single-device host-fed training
            raise ValueError(
                "device_resident=always but the stream's frame matrix "
                f"(est {est} frames) exceeds resident_budget_gb="
                f"{cfg.tpu.resident_budget_gb}, headers were unreadable, "
                "or microbatch_size is set (the resident body can't "
                "accumulate microbatches); adjust the budget/microbatch "
                "or use device_resident=auto"
            )

    sharding = batch_sharding(ctx.mesh) if ctx.mesh is not None else None
    interval = cfg.training.checkpoint_interval
    hist_every = cfg.tpu.histogram_interval
    lr = cfg.training.learning_rate

    # resume support: skip already-trained batches
    start_batch = ctx.start_step
    remaining = total_num_batches - start_batch
    if remaining <= 0:
        print("Nothing to do: checkpoint already covers the frame budget.")
        return ctx

    # islice(start, stop): regenerating and SKIPPING the first start_batch
    # batches keeps the stream order aligned on resume (taking the first
    # `remaining` would retrain already-seen data and drop the tail)
    put_fn = None
    if ctx.mesh is not None:
        # validate divisibility UP FRONT: an indivisible batch would
        # otherwise surface as an opaque uneven-shard error from inside
        # the prefetcher thread at the first next()
        n_dev = ctx.mesh.devices.size
        need = (n_dev // jax.process_count()
                if jax.process_count() > 1 else n_dev)
        if batch_size % max(need, 1):
            raise ValueError(
                f"batch_size {batch_size} must be divisible by "
                f"{'the per-host device count' if need != n_dev else 'the mesh device count'} "
                f"({need}) for host-fed mesh streaming"
            )
    if jax.process_count() > 1 and ctx.mesh is not None:
        from rawaudiovae_kelsey_tpu.parallel.mesh import (
            global_batch_from_local,
        )

        put_fn = lambda b: global_batch_from_local(ctx.mesh, b)  # noqa: E731
    feed = prefetch_to_device(
        itertools.islice(dataset.batches(batch_size), start_batch,
                         start_batch + remaining),
        depth=cfg.tpu.prefetch, sharding=None if put_fn else sharding,
        cast_dtype=_feed_dtype(cfg), put_fn=put_fn,
    )

    pending = []  # (batch_id, device_loss) — drained off the hot path
    train_loss_accum = 0.0
    window_loss = 0.0       # since the last checkpoint — drives the best gate
    window_count = 0
    window_mark = start_batch  # first batch of the current rate window
    ctx.timer.start()

    def drain():
        nonlocal train_loss_accum, window_loss, window_count
        if not pending:
            return
        # one transfer for all buffered scalars (a per-scalar device_get
        # costs a full host<->device round trip each)
        values = jax.device_get([dl for _, dl in pending])
        for (bid, _), l in zip(pending, values):
            l = float(l)
            train_loss_accum += l
            window_loss += l
            window_count += 1
            ctx.writer.add_scalar("Loss/Batch", l, bid)
            ctx.writer.add_scalar("Learning Rate", lr, bid)
        pending.clear()

    # Interrupt flags are per-process: under multihost a host acting on its
    # local signal while peers dispatch the next collective hangs the
    # cluster (and process 0, which writes the checkpoint, may not be the
    # signaled host).  Sync the flag by allgather at a fixed batch cadence
    # — identical on every process, so the collective always matches up.
    multihost = jax.process_count() > 1 and ctx.mesh is not None
    sync_every = max(1, interval // 10) if interval else 100

    from rawaudiovae_kelsey_tpu.train.epoch import _sync_stop

    for offset, batch in enumerate(feed):
        batch_id = start_batch + offset
        ctx.state, metrics = ctx.train_step(ctx.state, batch)
        pending.append((batch_id, metrics["loss"]))

        stop_now = (bool(stop) if not multihost
                    else (batch_id % sync_every == 0
                          and _sync_stop(stop, True)))
        if stop_now:
            feed.close()
            drain()
            print(f"Interrupted at batch {batch_id}; checkpointing.")
            L.save_periodic_checkpoint(ctx, {"batch_id": batch_id},
                                       label=batch_id)
            return ctx

        # interval=0 must NOT collapse the cadence to every batch: the
        # drain's device_get would block on the step dispatched one line
        # up, a ~28-130 ms round trip per ~1 ms step (silent 30x+
        # slowdown) — same fallback cadence as the multihost stop sync
        if verbose and batch_id % (max(1, interval // 10)
                                   if interval else 100) == 0:
            drain()
            print(f"Batch {batch_id}/{total_num_batches} - "
                  f"Cumulative loss: {train_loss_accum:.6f}")

        if hist_every and batch_id % hist_every == 0:
            L.log_param_histograms(ctx, batch_id)

        if interval and batch_id % interval == 0 and batch_id != 0:
            drain()
            step_time = ctx.timer.stop()
            # batches actually trained this window (the first window after
            # a resume is shorter than a full interval)
            n_window = batch_id - window_mark
            window_mark = batch_id
            print(f"Checkpoint - Batch {batch_id} "
                  f"({n_window * batch_size / max(step_time, 1e-9):,.0f} frames/s)")
            if cfg.dataset.generate_test:
                L.reconstruct_test_set(ctx, batch_id)
            # best gate FIRST — on the mean loss of this checkpoint interval
            # (the reference compared a cumulative sum against a constant —
            # both degenerate; see DIVERGENCES.md) — so the checkpoint meta
            # records this boundary's gate, not last interval's
            interval_mean = window_loss / max(window_count, 1)
            # ONE state fetch shared by the best gate and the checkpoint
            # writer (each used to pull its own copy through the host link)
            host, host_p = L.boundary_host_state(ctx)
            L.maybe_save_best(ctx, interval_mean, batch_id, after=0,
                              host_params=host_p)
            L.save_periodic_checkpoint(ctx, {"batch_id": batch_id},
                                       label=batch_id, host_state=host)
            window_loss, window_count = 0.0, 0
            # restart AFTER checkpoint I/O so the reported frames/s measures
            # the training window, not eval/save traffic
            ctx.timer.start()

    drain()
    # final reconstruction + saves (train_iterable.py:271-319)
    print(f"Last Checkpoint - Batch {total_num_batches}")
    host, host_p = L.boundary_host_state(ctx)  # one fetch, whole tail
    if cfg.dataset.generate_test:
        L.reconstruct_test_set(ctx, total_num_batches)
    if window_count:  # an empty window (final batch == a checkpoint
        # boundary) must not feed the best gate a fake 0.0
        L.maybe_save_best(ctx, window_loss / window_count,
                          total_num_batches, after=0, host_params=host_p)
    L.save_periodic_checkpoint(ctx, {"batch_id": total_num_batches},
                               label=total_num_batches, host_state=host)
    L.save_last(ctx, host_params=host_p)
    return ctx


def _estimate_stream_frames(dataset: StreamingFrameDataset, cfg) -> int | None:
    """Total streaming frames across the folder from wav headers only."""
    from rawaudiovae_kelsey_tpu.io import wav_info

    seg, hop, sr = (cfg.audio.segment_length, cfg.audio.hop_length,
                    cfg.audio.sampling_rate)
    total = 0
    try:
        for f in dataset.audio_file_list:
            n, _ch, native_sr, _bits = wav_info(f)
            if native_sr != sr:
                n = int(n * sr / native_sr)
            n += (-n) % hop
            if n >= seg:
                total += (n - seg) // hop + 1
    except Exception:
        return None
    return total


def _run_resident(ctx: L.TrainContext, cfg: Config, verbose: bool, stop,
                  dataset: StreamingFrameDataset,
                  total_num_batches: int) -> L.TrainContext:
    """On-device stream trainer: frames uploaded once; the scan body gathers
    each batch by index, so per-dispatch host traffic is one (chunk, batch)
    int32 array (~KBs) instead of (chunk*batch, segment) audio rows."""
    import jax.numpy as jnp
    import optax

    from rawaudiovae_kelsey_tpu.parallel.step import (
        _matmul_precision,
        make_loss_fn,
        make_weighted_loss_fn,
    )
    from rawaudiovae_kelsey_tpu.models.registry import resident_model
    from rawaudiovae_kelsey_tpu.train.optim import build_optimizer
    from rawaudiovae_kelsey_tpu.train.state import TrainState

    # backend=best resolves to XLA for the on-chip scan (measured ~19%
    # in-scan penalty for the Pallas custom calls — registry.resident_model)
    model = resident_model(cfg, ctx.model)
    batch_size = cfg.training.batch_size
    interval = cfg.training.checkpoint_interval
    hist_every = cfg.tpu.histogram_interval
    lr = cfg.training.learning_rate

    start_batch = ctx.start_step
    if total_num_batches - start_batch <= 0:
        print("Nothing to do: checkpoint already covers the frame budget.")
        return ctx

    dtype = jnp.bfloat16 if cfg.tpu.precision == "bfloat16" else jnp.float32
    mesh = ctx.mesh
    nproc = jax.process_count()
    # Corpus layout (schema.py resident_layout): "samples" uploads the
    # hop-padded sample arrays + an int32 start per frame and gathers each
    # window with a strided dynamic-slice — identical values and identical
    # per-row gather bytes, at hop/segment of the HBM + upload footprint
    # (the reference's erokia corpus: 6.3 GB as frames, 0.8 GB as
    # samples).  Single-device path only; mesh paths keep frames (their
    # sharding machinery addresses frame rows).
    # Single-process only: the DCN-spanning multihost path stitches
    # per-host FRAME shards along the data axis (its local→global row map
    # addresses frame rows).  The single-device and replicated-mesh paths
    # both take the samples layout (the replicated path pays the frame
    # matrix PER DEVICE — 8× savings on every chip).
    samples_layout = (
        nproc == 1
        and (cfg.tpu.resident_layout == "samples"
             or (cfg.tpu.resident_layout == "auto"
                 and cfg.audio.hop_length < cfg.audio.segment_length)))
    frames_np = None if samples_layout else dataset.all_frames()
    idx_sharding = None
    idx_put_fn = None
    idx_base = 0
    if mesh is not None and nproc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from jax.experimental import multihost_utils

        from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS

        # DCN-spanning resident: each host uploads only its own file-shard
        # frames; the shards are stitched into one global array along the
        # data axis.  Shards must be equal-sized per device, so each host
        # zero-pads its frame matrix to the cross-host max (rounded up to
        # the per-host device count) — pad rows are only ever addressed as
        # masked batch padding.
        dph = mesh.shape[DATA_AXIS] // nproc      # data devices per host
        counts = multihost_utils.process_allgather(
            np.asarray(frames_np.shape[0]))
        n_pad = -(-int(counts.max()) // dph) * dph
        if n_pad > frames_np.shape[0]:
            frames_np = np.concatenate([
                frames_np,
                np.zeros((n_pad - frames_np.shape[0],
                          frames_np.shape[1]), frames_np.dtype),
            ])
        dev_frames = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(DATA_AXIS)),
            np.asarray(frames_np, jnp.dtype(dtype)),
        )
        # This host's local frame rows live at the global rows its
        # addressable shards cover.  Derived from the materialized array
        # (not process_index * n_pad): jax.make_mesh may topology-reorder
        # devices on real pods, so the process's block offset is whatever
        # the sharding actually assigned.  The local→global row map is only
        # affine when those shards tile one contiguous block — asserted
        # here; a non-contiguous layout would need a per-shard map.
        starts = sorted(
            (s.index[0].start or 0) for s in dev_frames.addressable_shards
        )
        shard_rows = n_pad // dph
        if starts != [starts[0] + i * shard_rows for i in range(dph)]:
            raise NotImplementedError(
                "mesh data-axis devices for this process are not "
                f"contiguous (shard starts {starts}); resident streaming "
                "needs a process-contiguous device order — use the "
                "host-fed path"
            )
        idx_base = starts[0]
        pad_rows = (-batch_size) % dph
        idx_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        idx_put_fn = lambda a: jax.make_array_from_process_local_data(  # noqa: E731
            idx_sharding, a)
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS

        # frames replicated (stream indices address the whole corpus); the
        # per-step batch parallelism comes from sharding the int32 index
        # batches over the data axis — GSPMD then shards the row gather and
        # inserts the grad reduction.  An indivisible batch is padded to
        # the data-axis multiple and the pad rows are masked out of the
        # loss/grads (make_weighted_loss_fn), so compute stays parallel
        # and the loss sequence is identical to the unpadded one.
        if samples_layout:
            samples_np, starts_np = dataset.all_samples()
            n_corpus_frames = len(starts_np)
            dev_frames = jax.device_put(
                jnp.asarray(samples_np, dtype), NamedSharding(mesh, P()))
            dev_starts = jax.device_put(
                jnp.asarray(starts_np), NamedSharding(mesh, P()))
            del samples_np, starts_np
        else:
            dev_frames = jax.device_put(
                jnp.asarray(frames_np, dtype), NamedSharding(mesh, P())
            )
        pad_rows = (-batch_size) % mesh.shape[DATA_AXIS]
        idx_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    elif samples_layout:
        samples_np, starts_np = dataset.all_samples()
        n_corpus_frames = len(starts_np)
        dev_frames = jax.device_put(jnp.asarray(samples_np, dtype))
        dev_starts = jax.device_put(jnp.asarray(starts_np))
        del samples_np, starts_np
        pad_rows = 0
    else:
        dev_frames = jax.device_put(jnp.asarray(frames_np, dtype))
        pad_rows = 0
    if not samples_layout:
        dev_starts = jnp.zeros(0, jnp.int32)  # unused placeholder arg
    del frames_np

    # chunk = steps per dispatch; truncated to land on checkpoint boundaries.
    # Sized against the ~28 ms tunnel dispatch latency: 16 steps of batch
    # 4096 compute in ~15 ms (dispatch-BOUND, measured 1.6 M frames/s e2e);
    # 64 steps ≈ 60 ms compute per dispatch, pushing the pipelined rate
    # toward the device's steady-state.  Interrupt latency stays <100 ms.
    chunk = min(64, interval or 64, total_num_batches) or 1

    optimizer = build_optimizer(cfg)
    if pad_rows:
        # indivisible (per-host) batch: pad index rows to the data-axis
        # multiple and zero-weight them — grads and loss match the
        # unpadded sequence.  Multi-host: the global batch is the per-host
        # blocks concatenated, so the mask pattern tiles per host.
        wloss_fn = make_weighted_loss_fn(model, cfg, mesh=mesh)
        wgrad_fn = jax.value_and_grad(wloss_fn, has_aux=True)
        row_w = jnp.tile(jnp.concatenate([
            jnp.ones(batch_size, jnp.float32),
            jnp.zeros(pad_rows, jnp.float32),
        ]), nproc if mesh is not None else 1)
    else:
        loss_fn = make_loss_fn(model, cfg, mesh=mesh)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    prec = _matmul_precision(cfg.tpu.precision)

    # Single-device: assemble the whole chunk's rows in ONE gather up
    # front (HBM bandwidth) instead of a per-step gather that serializes
    # against each train step (same lever as the resident epoch trainer's
    # whole-matrix shuffle — batches are identical, frames[I][j] ==
    # frames[I[j]]).  Guarded to ~1 GB of transient chunk buffer and the
    # unsharded path (the mesh paths keep the per-step gather whose
    # sharding GSPMD already partitions).
    seg_len = cfg.audio.segment_length
    dtype_bytes = 2 if cfg.tpu.precision == "bfloat16" else 4
    pregather = (mesh is None and
                 chunk * (batch_size + pad_rows) * seg_len * dtype_bytes
                 <= 1 << 30)

    from rawaudiovae_kelsey_tpu.ops.pallas_mlp import vmem_headroom

    def rows_of(frames, starts, idx):
        """Gather the (rows, segment) windows for int32 frame indices —
        a row gather of the frame matrix, or (samples layout) a strided
        dynamic-slice per start offset (same 2 KB/row gather traffic)."""
        if samples_layout:
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(frames, (s,), (seg_len,))
            )(starts[idx])
        return frames[idx]

    @jax.jit
    def run_chunk(state, idx_chunk, nk, frames, starts):
        # frames passed as an argument (not closed over): multi-process
        # global arrays may not be captured as jit constants.
        # idx_chunk is ALWAYS (chunk, rows) — short boundary chunks mask
        # their tail rows as no-op steps (the dynamic ``nk`` active count)
        # so the whole run reuses ONE compiled executable; distinct static
        # chunk lengths each cost a full ~50 s train-step compile through
        # the tunnel (the resident epoch trainer's fixed-group trick).
        # vmem_headroom: same trace-scoped raise as the resident epochs —
        # scoped-vmem accounting charges the fused-backward custom calls
        # more inside this scan than standalone.
        with jax.default_matmul_precision(prec), vmem_headroom():
            if idx_sharding is not None:
                idx_chunk = jax.lax.with_sharding_constraint(
                    idx_chunk, idx_sharding
                )
            if pregather:
                k, rows = idx_chunk.shape
                idx_chunk = rows_of(
                    frames, starts, idx_chunk.reshape(-1)
                ).reshape(k, rows, seg_len)

            def step(s, idx):
                # `idx` is a row of prefetched frames when pregathered,
                # else an int32 index row to gather here
                xb = idx if pregather else rows_of(frames, starts, idx)
                key = jax.random.fold_in(s.rng, s.step)
                if pad_rows:
                    (loss, _aux), grads = wgrad_fn(s.params, key, xb, row_w)
                else:
                    (loss, _aux), grads = grad_fn(s.params, key, xb)
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads
                )
                updates, opt_state = optimizer.update(
                    grads, s.opt_state, s.params
                )
                return TrainState(
                    params=optax.apply_updates(s.params, updates),
                    opt_state=opt_state, rng=s.rng, step=s.step + 1,
                ), loss

            def body(s, inp):
                i, idx = inp
                return jax.lax.cond(
                    i < nk, lambda ss: step(ss, idx),
                    lambda ss: (ss, jnp.float32(jnp.nan)), s)

            return jax.lax.scan(
                body, state, (jnp.arange(idx_chunk.shape[0]), idx_chunk))

    plan = dataset.index_batches(batch_size)
    # resume: consume the indices the finished batches already used
    for _ in range(start_batch):
        next(plan)
    # the decoded per-file cache served all_frames()/the plan's counts; the
    # data now lives on device — release the host copy
    dataset.release_cache()
    if mesh is not None and nproc > 1:
        where = (f"host-sharded over {nproc} hosts / "
                 f"{mesh.devices.size}-device mesh")
    elif mesh is not None:
        where = (f"replicated over {mesh.devices.size}-device mesh"
                 + (", samples layout" if samples_layout else ""))
    elif samples_layout:
        where = "on device, samples layout"
    else:
        where = "on device"
    n_res_frames = (n_corpus_frames if samples_layout
                    else dev_frames.shape[0])
    print(f"Device-resident stream: {n_res_frames:,} frames "
          f"({(dev_frames.nbytes + dev_starts.nbytes) / 1e6:,.0f} MB "
          f"{where}), {chunk} steps/dispatch")

    train_loss_accum = 0.0
    window_loss, window_count = 0.0, 0
    batch_id = start_batch
    # (start_batch_id, active count, device losses) — drained off the hot
    # path; rows past the active count are the masked tail (NaN), sliced
    pending = []

    def drain():
        nonlocal train_loss_accum, window_loss, window_count
        for bid0, nk, dev_losses in pending:
            arr = np.asarray(jax.device_get(dev_losses), np.float64)[:nk]
            for j, l in enumerate(arr):
                train_loss_accum += float(l)
                window_loss += float(l)
                window_count += 1
                ctx.writer.add_scalar("Loss/Batch", float(l), bid0 + j)
                ctx.writer.add_scalar("Learning Rate", lr, bid0 + j)
        pending.clear()

    # the active-count schedule is a pure function of the boundaries —
    # precomputed so the (host-side) consumer and the prefetching producer
    # agree without sharing mutable state
    def k_schedule():
        bid = start_batch
        out = []
        while bid < total_num_batches:
            k = min(chunk, total_num_batches - bid)
            if interval:
                k = min(k, interval - (bid % interval))
            if hist_every:
                # land on histogram boundaries too, else a 64-step chunk
                # coarsens the configured cadence to chunk granularity
                k = min(k, hist_every - (bid % hist_every))
            out.append(k)
            bid += k
        return out

    ks = k_schedule()

    # stage index chunks onto the device ahead of consumption (the idx
    # upload is the only remaining per-chunk host-link dependency); every
    # chunk is padded to the FIXED (chunk, rows) shape — see run_chunk
    def chunk_plan():
        for k in ks:
            batches = list(itertools.islice(plan, k))
            if pad_rows:       # masked rows; index 0 is always in range
                batches = [
                    np.concatenate([bb, np.zeros(pad_rows, bb.dtype)])
                    for bb in batches
                ]
            if idx_base:       # local rows → this host's global rows
                batches = [bb + np.int32(idx_base) for bb in batches]
            batches += [np.zeros_like(batches[0])] * (chunk - k)
            yield np.stack(batches)

    staged = prefetch_to_device(chunk_plan(), depth=3,
                                sharding=None if idx_put_fn else idx_sharding,
                                put_fn=idx_put_fn)
    # resident histograms land on chunk boundaries (params only
    # materialize there); a fresh run's first log fires at the FIRST
    # boundary so the series has the same sample count as the host-fed
    # path's batch-0 log
    hist_marker = ((start_batch // hist_every) if start_batch else -1) \
        if hist_every else 0

    # Multihost interrupt sync (see epoch._sync_stop): allgather the
    # per-process flag at boundaries every host reaches identically —
    # histogram/checkpoint crossings, else every 8th chunk (the chunk plan
    # is derived from allgathered sizes, so chunk indices line up).
    mh = jax.process_count() > 1
    from rawaudiovae_kelsey_tpu.train.epoch import _sync_stop

    # Async boundary I/O (loop.AsyncBoundaryWriter): a checkpoint crossing
    # snapshots the state on-device (fresh buffers — the next chunk donates
    # the live state) and the worker fetches + writes while the loop streams
    # ahead.  Same gate as the epoch trainer: single-process npz only.
    bwriter = (L.AsyncBoundaryWriter()
               if (cfg.tpu.async_checkpoint and not mh
                   and cfg.tpu.checkpoint_format != "orbax") else None)
    ctx.boundary_writer = bwriter  # finish() joins on exception paths
    snap_fn = jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))

    ctx.timer.start()
    loop_t0 = time.perf_counter()

    def _e2e_summary(bid: int) -> None:
        # whole-loop wall (post-upload, incl. every checkpoint boundary) —
        # the honest long-run figure the run report needs; the per-window
        # "Checkpoint - Batch" rates exclude boundary I/O by design
        done_b = bid - start_batch
        wall = time.perf_counter() - loop_t0
        if done_b > 0 and wall > 0:
            print(f"====> Resident stream e2e: {done_b} batches in "
                  f"{wall:.2f}s = {done_b * batch_size / wall:,.0f} "
                  f"frames/s wall-clock incl. checkpoints")

    window_mark = start_batch  # first batch of the current rate window
    for ci, idx_dev in enumerate(staged):
        k = ks[ci]
        ctx.state, losses = run_chunk(ctx.state, idx_dev,
                                      jnp.int32(k), dev_frames, dev_starts)
        pending.append((batch_id, k, losses))  # no sync in the hot loop
        L.prefetch_host(losses)  # drain finds the bytes already en route
        batch_id += k
        if len(pending) >= 8:
            # backpressure: wait for the chunk dispatched 8 ago (drains
            # only happen at boundaries, so waiting on pending[0] would be
            # a permanent no-op once it completed — in-flight work and
            # interrupt latency must stay bounded with the pipeline full)
            jax.block_until_ready(pending[-8][2])

        if verbose:
            print(f"Batch {batch_id}/{total_num_batches}")
        crossed_hist = bool(hist_every
                            and batch_id // hist_every != hist_marker)
        at_ckpt = bool(interval and batch_id % interval == 0
                       and batch_id != total_num_batches)
        if crossed_hist:
            # cadence by crossing multiples (batch_id advances by chunk)
            hist_marker = batch_id // hist_every
            if not at_ckpt:
                L.log_param_histograms(ctx, batch_id)
            # else: logged inside the checkpoint block, sharing its ONE
            # state fetch instead of pulling the params twice
        stop_now = (bool(stop) if not mh
                    else ((crossed_hist or at_ckpt or ci % 8 == 7)
                          and _sync_stop(stop, True)))
        if stop_now:
            staged.close()
            drain()
            if bwriter is not None:
                bwriter.flush()  # settle the best gate/artifact trail first
            _e2e_summary(batch_id)
            print(f"Interrupted at batch {batch_id}; checkpointing.")
            L.save_periodic_checkpoint(ctx, {"batch_id": batch_id},
                                       label=batch_id)
            return ctx
        if at_ckpt:
            drain()
            step_time = ctx.timer.stop()
            # count the batches actually trained in this window (the first
            # window after a resume is shorter than a full interval)
            n_window = batch_id - window_mark
            window_mark = batch_id
            print(f"Checkpoint - Batch {batch_id} "
                  f"({n_window * batch_size / max(step_time, 1e-9):,.0f} frames/s)")
            if cfg.dataset.generate_test:
                L.reconstruct_test_set(ctx, batch_id)
            wmean = window_loss / max(window_count, 1)
            if bwriter is not None:
                # snapshot on-device (the next chunk donates the live
                # state) and run the fetch + writes off-thread; the worker
                # owns the snapshot, the loop streams ahead
                boundary_state = snap_fn(ctx.state)
                L.prefetch_host(boundary_state)

                def boundary_io(bs=boundary_state, bid=batch_id,
                                wl=wmean, hist=crossed_hist):
                    h = L.fetch_host_state(bs)
                    hp = None if h is None else h.params
                    if hist:  # coincident crossing shares this fetch
                        L.log_param_histograms(ctx, bid, params=hp)
                    # best gate first: the meta must record this
                    # boundary's gate
                    L.maybe_save_best(ctx, wl, bid, after=0, host_params=hp)
                    L.save_periodic_checkpoint(ctx, {"batch_id": bid},
                                               label=bid, host_state=h)

                bwriter.submit(boundary_io)
            else:
                # ONE state fetch shared by the best gate and the
                # checkpoint writer (each used to pull its own copy
                # through the host link)
                host, host_p = L.boundary_host_state(ctx)
                if crossed_hist:  # share the fetch (see crossing below)
                    L.log_param_histograms(ctx, batch_id, params=host_p)
                # best gate first: the meta must record this boundary's gate
                L.maybe_save_best(ctx, wmean, batch_id, after=0,
                                  host_params=host_p)
                L.save_periodic_checkpoint(ctx, {"batch_id": batch_id},
                                           label=batch_id, host_state=host)
            window_loss, window_count = 0.0, 0
            ctx.timer.start()  # exclude checkpoint I/O from the next window

    drain()
    if bwriter is not None:
        bwriter.flush()  # settle the last boundary before the tail reads
    _e2e_summary(batch_id)
    print(f"Last Checkpoint - Batch {total_num_batches}")
    host, host_p = L.boundary_host_state(ctx)  # one fetch, whole tail
    if cfg.dataset.generate_test:
        L.reconstruct_test_set(ctx, total_num_batches)
    if window_count:
        L.maybe_save_best(ctx, window_loss / window_count,
                          total_num_batches, after=0, host_params=host_p)
    L.save_periodic_checkpoint(ctx, {"batch_id": total_num_batches},
                               label=total_num_batches, host_state=host)
    L.save_last(ctx, host_params=host_p)
    return ctx
