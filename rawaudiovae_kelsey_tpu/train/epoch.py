"""Epoch trainer — the ``python train.py --config default.ini`` flow
(train.py:113-307), rebuilt around the single jitted step.

Differences from the reference (each intentional, cited):
  * metrics stay on device during the hot loop; per-batch ``Loss/Batch`` and
    ``Learning Rate`` scalars are written from the buffered device values at
    epoch end (same tags/steps, train.py:189,196 — but no ``.item()`` sync
    per batch);
  * the CPU-only crash (train.py:89), the ``device == cuda`` NameError
    (train.py:220) and the positional ``torch.cat`` bug (train.py:229) have
    no analogs here;
  * the best-model gate tracks the true best loss (quirk #7 fix);
  * checkpoint/resume actually restores (SURVEY.md §5.3).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.data.corpus import build_corpus
from rawaudiovae_kelsey_tpu.data.datasets import AudioFrameDataset
from rawaudiovae_kelsey_tpu.data.loader import (
    feed_dtype as _feed_dtype,
    prefetch_to_device,
)
from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding
from rawaudiovae_kelsey_tpu.train import loop as L
from rawaudiovae_kelsey_tpu.train.interrupt import GracefulInterrupt


def train(cfg: Config, verbose: bool = True) -> L.TrainContext:
    # dataset path validation (train.py:52-63)
    datapath = cfg.dataset.datapath_path
    if not datapath.exists():
        raise FileNotFoundError(datapath.resolve())

    # distributed init must precede the jax.process_count() below — that
    # call initializes the XLA backend, after which jax.distributed can no
    # longer be brought up (setup()'s own call then no-ops, idempotent)
    if cfg.tpu.multihost:
        from rawaudiovae_kelsey_tpu.parallel.mesh import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(cfg.tpu.coordinator_address)
    # device_resident="always" runs the single-device on-chip epoch loop —
    # skip mesh setup — EXCEPT under multihost, where a mesh-less "always"
    # would train one independent copy per process into the same
    # workspace; there the mesh stays up and the DCN-spanning sharded
    # resident path serves the request (or raises if it can't).
    # (process_count catches externally-initialized jax.distributed runs
    # that didn't set [tpu] multihost)
    ctx = L.setup(cfg, use_mesh=(cfg.tpu.device_resident != "always"
                                 or cfg.tpu.multihost
                                 or jax.process_count() > 1))
    try:
        with GracefulInterrupt() as stop:
            return _run(ctx, cfg, verbose, stop)
    finally:
        L.finish(ctx)


def _sync_stop(stop, multihost: bool) -> bool:
    """Act on an interrupt only by cluster-wide agreement.  Signals are
    per-process: under multihost, one host taking its local stop branch
    (drain + return) while the others dispatch the next collective would
    hang the cluster — and the interrupt checkpoint is only written by
    process 0, which may not be the signaled host.  Allgather the flag at
    every decision point (all processes reach these points in the same
    order, so the collective always matches up); any host's signal stops
    the whole job."""
    s = bool(stop)
    if not multihost:
        return s
    from jax.experimental import multihost_utils

    return bool(multihost_utils.process_allgather(np.asarray(s)).any())


def _run(ctx: L.TrainContext, cfg: Config, verbose: bool,
         stop=None) -> L.TrainContext:
    # eager ingest (train.py:113-130)
    if verbose:
        print("creating the dataset...")
    from rawaudiovae_kelsey_tpu.data.validate import check_before_training
    from rawaudiovae_kelsey_tpu.parallel.mesh import host_shard_info

    check_before_training(
        datapath_audio_dir(cfg), cfg.audio.sampling_rate,
        cfg.dataset.check_dataset, cfg.dataset.check_audio,
    )
    host_id, num_hosts = host_shard_info()
    corpus, n_samples = build_corpus(
        datapath_audio_dir(cfg), cfg.audio.sampling_rate,
        mono=cfg.dataset.mono, verbose=verbose,
        host_id=host_id, num_hosts=num_hosts,
    )
    total_frames = n_samples // cfg.audio.segment_length
    print(f"Total number of audio frames: {total_frames}")
    cfg.dataset.total_frames = str(total_frames)
    ctx.workspace.snapshot_config(cfg)

    dataset = AudioFrameDataset(
        corpus, cfg.audio.segment_length, cfg.audio.hop_length,
        cfg.audio.sampling_rate,
    )
    batch_size = cfg.training.batch_size

    # device-resident fast path: whole epochs on-chip when the raw corpus
    # fits HBM (single-device / replicated only)
    from rawaudiovae_kelsey_tpu.parallel import resident as R

    dtype_bytes = 2 if cfg.tpu.precision == "bfloat16" else 4
    budget = int(cfg.tpu.resident_budget_gb * (1 << 30))
    n_shards = ctx.mesh.shape["data"] if ctx.mesh is not None else 1
    # Multi-host decisions (layout choice, resident gating) must be
    # IDENTICAL on every process or the hosts diverge into different
    # collective programs: derive them from allgathered worst-case sizes
    # (max corpus for the budget, min frame count for the batch gate).
    if ctx.mesh is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([n_samples, len(dataset)]))
        n_samples_eff = int(np.max(counts[:, 0]))
        min_frames = int(np.min(counts[:, 1]))
        # reference avg-loss divisor: the GLOBAL dataset length (each
        # host's loss is already the pmean-reduced global value; dividing
        # by the local length would make hosts log conflicting averages)
        dataset_len_eff = int(np.sum(counts[:, 1]))
        # align_local_rows wrap-pads EVERY host to the cross-host max, so
        # the stitched matrix holds ~P×max rows and each device's share is
        # max_host_frames / (data devices per host): the budget cap is
        # budget × dph for the MAX-host size — budget × n_shards would be
        # right only if n_samples_eff were the global size, and admits
        # P× too much
        budget_cap = budget * max(n_shards // jax.process_count(), 1)
    else:
        n_samples_eff, min_frames = n_samples, len(dataset)
        dataset_len_eff = len(dataset)
        # per-device budget: under a mesh the frame matrix shards over
        # 'data', so the global matrix may be n_shards × one device's budget
        budget_cap = budget * n_shards
    layout = R.choose_layout(n_samples_eff, cfg.audio.segment_length,
                             cfg.audio.hop_length, dtype_bytes,
                             budget_cap)
    mesh_ok = (ctx.mesh is None
               or (cfg.tpu.model_parallel <= 1 and layout == "frames"
                   and batch_size % n_shards == 0))
    # the resident body takes one full-batch value_and_grad: it cannot
    # honor microbatch accumulation, so configs that asked for it (giant
    # batches) keep the host-fed step that does
    micro = cfg.tpu.microbatch_size
    micro_ok = not (micro and batch_size > micro)
    use_resident = (
        cfg.tpu.device_resident != "never"
        and layout is not None
        and mesh_ok
        and micro_ok
    )
    if use_resident and min_frames >= batch_size:
        return _run_resident(ctx, cfg, verbose, stop, corpus, n_samples,
                             dataset_len_eff, layout)
    if cfg.tpu.device_resident == "always":
        raise ValueError(
            "device_resident=always but the corpus does not fit "
            f"resident_budget_gb={cfg.tpu.resident_budget_gb} (layout="
            f"{layout!r}), the mesh/batch layout is incompatible, or "
            "microbatch_size is set (the resident body can't accumulate "
            "microbatches); adjust the config or use device_resident=auto"
        )

    multihost = jax.process_count() > 1 and ctx.mesh is not None
    if multihost:
        # per-host corpora differ → align on the minimum full-batch count
        # (drop_last semantics) so every process enters each collective
        from jax.experimental import multihost_utils

        local = dataset.num_batches(batch_size, drop_last=True)
        counts = multihost_utils.process_allgather(np.asarray(local))
        n_batches = int(np.min(counts))
        if n_batches == 0:
            raise ValueError("a host has fewer frames than one batch")
    elif ctx.mesh is not None and batch_size % ctx.mesh.devices.size:
        # pad_batches_for_mesh wrap-pads to the device count; with an
        # indivisible batch_size that would repeat rows in EVERY batch,
        # silently double-weighting them in every mean-reduced loss —
        # reject the config instead (the final short batch stays the one
        # documented wrap)
        raise ValueError(
            f"batch_size {batch_size} must be divisible by the mesh's "
            f"{ctx.mesh.devices.size} devices for host-fed mesh training"
        )
    else:
        n_batches = dataset.num_batches(batch_size)
    sharding = batch_sharding(ctx.mesh) if ctx.mesh is not None else None

    epochs = cfg.training.epochs
    interval = cfg.training.checkpoint_interval
    lr = cfg.training.learning_rate
    train_loss = float("inf")

    # resume: ctx.start_step counts optimizer updates; whole epochs only.
    # Round UP: a mid-epoch interrupt checkpoint resumes at the NEXT epoch
    # (re-applying the already-trained partial epoch to an advanced state
    # would double-train that data; skipping the unseen remainder of one
    # epoch is the safer distortion — see DIVERGENCES.md)
    start_epoch = min(-(-ctx.start_step // max(n_batches, 1)), epochs)
    if start_epoch:
        print(f"Resuming at epoch {start_epoch}")

    # optional jax.profiler window (SURVEY.md §5.1 — absent in the reference)
    profile_window = None
    if cfg.tpu.profile_steps > 0:
        profile_window = (cfg.tpu.profile_start,
                          cfg.tpu.profile_start + cfg.tpu.profile_steps)
    global_step = start_epoch * n_batches
    profiling = False

    for epoch in range(start_epoch, epochs):
        if verbose:
            print(f"Epoch {epoch}/{epochs - 1}")
            print("-" * 10)

        if multihost:
            import itertools as _it

            from rawaudiovae_kelsey_tpu.parallel.mesh import (
                global_batch_from_local,
            )

            host_iter = _it.islice(
                dataset.batches(batch_size, shuffle=True,
                                seed=cfg.tpu.seed + epoch, drop_last=True),
                n_batches,
            )
            feed = prefetch_to_device(
                host_iter, depth=cfg.tpu.prefetch,
                cast_dtype=_feed_dtype(cfg),
                put_fn=lambda b: global_batch_from_local(ctx.mesh, b),
            )
        else:
            host_iter = dataset.batches(batch_size, shuffle=True,
                                        seed=cfg.tpu.seed + epoch)
            if ctx.mesh is not None:
                from rawaudiovae_kelsey_tpu.data.loader import (
                    pad_batches_for_mesh,
                )

                host_iter = pad_batches_for_mesh(host_iter,
                                                 ctx.mesh.devices.size)
            feed = prefetch_to_device(host_iter, depth=cfg.tpu.prefetch,
                                      sharding=sharding,
                                      cast_dtype=_feed_dtype(cfg))
        batch_metrics = []
        ctx.timer.start()
        for batch in feed:
            if profile_window is not None:
                if global_step == profile_window[0] and not profiling:
                    jax.profiler.start_trace(
                        str(ctx.workspace.log_dir / "profile")
                    )
                    profiling = True
                elif global_step == profile_window[1] and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
            ctx.state, metrics = ctx.train_step(ctx.state, batch)
            batch_metrics.append(metrics["loss"])  # device scalar, no sync
            global_step += 1
            # mid-epoch break is single-host only: under multihost the
            # other processes would keep feeding collectives (see
            # _sync_stop) — there the interrupt lands at the epoch boundary
            if stop and not multihost:
                break
        epoch_s = ctx.timer.stop()
        if _sync_stop(stop, multihost):
            print(f"Interrupted in epoch {epoch}; checkpointing.")
            feed.close()
            L.save_periodic_checkpoint(ctx, {"epoch": epoch}, label=epoch)
            return ctx

        losses = [float(l) for l in jax.device_get(batch_metrics)]
        train_loss = float(np.sum(losses))
        for i, l in enumerate(losses):
            gstep = epoch * n_batches + i
            ctx.writer.add_scalar("Loss/Batch", l, gstep)
            ctx.writer.add_scalar("Learning Rate", lr, gstep)

        avg = train_loss / max(dataset_len_eff, 1)
        print(
            f"====> Epoch: {epoch} - Total loss: {train_loss} - "
            f"Average loss: {avg:.9f} "
            f"({len(losses) * batch_size / max(epoch_s, 1e-9):,.0f} frames/s)"
        )
        ctx.writer.add_scalar("Loss/train_total", train_loss, epoch)
        ctx.writer.add_scalar("Loss/train_average", avg, epoch)
        if epoch % max(1, cfg.tpu.histogram_interval or 1) == 0:
            L.log_param_histograms(ctx, epoch)

        if interval and epoch % interval == 0 and epoch != 0:
            print(f"Checkpoint - Epoch {epoch}")
            if cfg.dataset.generate_test:
                L.reconstruct_test_set(ctx, epoch)
            # ONE state fetch shared by the best gate and the checkpoint
            # writer (each used to pull its own copy through the host link)
            host, host_p = L.boundary_host_state(ctx)
            # best gate FIRST so the checkpoint meta records this
            # boundary's gate (resume would otherwise restore a one-
            # interval-stale best_loss)
            L.maybe_save_best(ctx, train_loss, epoch,
                              cfg.training.save_best_model_after,
                              host_params=host_p)
            L.save_periodic_checkpoint(ctx, {"epoch": epoch}, label=epoch,
                                       host_state=host)

    if profiling:
        jax.profiler.stop_trace()
    # post-loop finalization (train.py:254-307); one state fetch for the tail
    final_epoch = max(epochs - 1, 0)
    print(f"Last Checkpoint - Epoch {final_epoch}")
    host, host_p = L.boundary_host_state(ctx)
    if cfg.dataset.generate_test:
        L.reconstruct_test_set(ctx, epochs)
    if np.isfinite(train_loss):
        L.maybe_save_best(ctx, train_loss, epochs,
                          cfg.training.save_best_model_after,
                          host_params=host_p)
    L.save_periodic_checkpoint(ctx, {"epoch": epochs}, label=epochs,
                               host_state=host)
    L.save_last(ctx, host_params=host_p)
    return ctx


def _run_resident(ctx: L.TrainContext, cfg: Config, verbose: bool, stop,
                  corpus: np.ndarray, n_samples: int,
                  dataset_len: int, layout: str = "frames") -> L.TrainContext:
    """Device-resident epoch loop: one jitted call per epoch
    (parallel/resident.py), dispatches queued back-to-back with loss
    drains deferred to checkpoint/histogram/interrupt boundaries;
    checkpoints/TB/reconstruction between epochs."""
    from rawaudiovae_kelsey_tpu.models.registry import resident_model
    from rawaudiovae_kelsey_tpu.parallel import resident as R
    from rawaudiovae_kelsey_tpu.train.optim import build_optimizer

    optimizer = build_optimizer(cfg)
    # backend=best resolves to XLA for the on-chip scan (measured ~19%
    # in-scan penalty for the Pallas custom calls — registry.resident_model)
    model = resident_model(cfg, ctx.model)
    # one fixed group size for the whole run: every dispatch reuses the one
    # compiled group_k-epoch graph with a dynamic active count (short
    # groups at checkpoint boundaries mask their tail) — exactly ONE
    # compile per config, where static per-k graphs cost ~30 s-to-minutes
    # for EACH distinct group length.  Capped at the checkpoint/histogram
    # cadence: groups break there anyway, and the batched up-front
    # permutation sort (parallel/resident.py) pays for ALL group_k rows
    # every dispatch, so a graph much larger than the typical active k
    # would sort permutations the masked tail never uses.
    group_k = min(64, max(1, cfg.training.epochs))
    if cfg.training.checkpoint_interval:
        group_k = min(group_k, cfg.training.checkpoint_interval + 1)
    if cfg.tpu.histogram_interval:
        group_k = min(group_k, cfg.tpu.histogram_interval + 1)
    if ctx.mesh is not None:
        # mesh-sharded resident: frame matrix sharded over 'data', one pmean
        # per step, whole epochs on-chip across the mesh
        from rawaudiovae_kelsey_tpu.data.framing import overlapping_frames

        frames = np.asarray(overlapping_frames(
            corpus, cfg.audio.segment_length, cfg.audio.hop_length
        ))
        n_shards = ctx.mesh.shape["data"]
        if jax.process_count() > 1:
            # DCN-spanning residency: each host contributes its file-shard
            # frames, wrap-padded to the cross-host max so the blocks
            # stitch evenly; the two-pass shuffle then mixes them globally
            # every epoch (no process-contiguity requirement — see
            # put_frames_sharded)
            frames = R.align_local_rows(frames, ctx.mesh)
            n_frames_padded = len(frames) * jax.process_count()
        else:
            frames = R.pad_frames_for_mesh(frames, n_shards)
            n_frames_padded = len(frames)
        dev_corpus = R.put_frames_sharded(frames, cfg, ctx.mesh)
        run_epochs, n_batches = R.build_resident_epoch_sharded(
            model, cfg, optimizer, n_frames_padded, ctx.mesh,
            group_k=group_k,
        )
        del frames
        print(f"Device-resident corpus (sharded over {n_shards} devices): "
              f"{dev_corpus.shape[0]:,} frames "
              f"({dev_corpus.nbytes / 1e6:,.0f} MB total), "
              f"{n_batches} batches/epoch in one compiled call")
    else:
        run_epochs, n_batches = R.build_resident_epoch(
            model, cfg, optimizer, n_samples, layout=layout,
            group_k=group_k,
        )
        dev_corpus = R.put_resident(corpus, cfg, layout)
        print(f"Device-resident corpus ({layout} layout): {n_samples:,} "
              f"samples ({dev_corpus.nbytes / 1e6:,.0f} MB on device), "
              f"{n_batches} batches/epoch in one compiled call")

    batch_size = cfg.training.batch_size
    epochs = cfg.training.epochs
    interval = cfg.training.checkpoint_interval
    lr = cfg.training.learning_rate
    train_loss = float("inf")
    multihost = jax.process_count() > 1  # stop-flag sync (see _sync_stop)
    start_epoch = min(-(-ctx.start_step // max(n_batches, 1)), epochs)
    if start_epoch:
        print(f"Resuming at epoch {start_epoch}")

    # profiler window: trace the whole epoch containing profile_start (the
    # per-step window of the host-fed loop has no analog when an epoch is
    # one compiled call)
    profile_epoch = (cfg.tpu.profile_start // max(n_batches, 1)
                     if cfg.tpu.profile_steps > 0 else -1)

    # A small-corpus epoch computes in ~15 ms — less than one host-link
    # round trip — so anything per-epoch (a dispatch, a loss fetch, a
    # histogram pull) makes the loop latency-bound (measured 1.4 M frames/s
    # e2e vs 4.5 M device rate; worse on a degraded link).  Epochs
    # therefore run in GROUPS: one compiled call scans k consecutive
    # epochs on-device (run_epochs(..., k)), groups end at checkpoint /
    # histogram / profile boundaries (cap 64), and the (k, n_batches) loss
    # matrices drain in bursts — console lines and TB scalars are
    # identical, printed in epoch order, with the frames/s figure averaged
    # over the drained window.  histogram_interval = 0 logs histograms at
    # the checkpoint cadence here (each pull syncs + ships every parameter
    # through the host link).
    # (first epoch, active count, (group_k, n_batches) losses, dispatch time)
    pending = []

    def drain():
        nonlocal train_loss
        if not pending:
            return
        # fetch FIRST: device_get blocks until the queued epochs finish, so
        # the timed window includes the device compute (the repo's timing
        # rule — stopping the timer before the fetch would exclude all
        # in-flight work and overstate frames/s).  Rows past the active
        # count are the masked tail (NaN) — sliced off here.
        t_first = pending[0][3]
        fetched = [(ep0, np.asarray(jax.device_get(dl), np.float64)[:kk])
                   for ep0, kk, dl, _ in pending]
        pending.clear()
        window_s = ctx.timer.stop()
        # a group dispatched ahead of a checkpoint boundary computes through
        # the (untimed) boundary I/O — time it from its DISPATCH, or the
        # printed rate would count only the sliver left after the I/O
        window_s = max(window_s, time.perf_counter() - t_first)
        n_done = sum(arr.shape[0] for _, arr in fetched)
        rate = n_done * n_batches * batch_size / max(window_s, 1e-9)
        for ep0, arr in fetched:
            for j, row in enumerate(arr):
                ep = ep0 + j
                if verbose:
                    print(f"Epoch {ep}/{epochs - 1}")
                    print("-" * 10)
                train_loss = float(row.sum())
                for i, l in enumerate(row):
                    gstep = ep * n_batches + i
                    ctx.writer.add_scalar("Loss/Batch", float(l), gstep)
                    ctx.writer.add_scalar("Learning Rate", lr, gstep)
                avg = train_loss / max(dataset_len, 1)
                print(
                    f"====> Epoch: {ep} - Total loss: {train_loss} - "
                    f"Average loss: {avg:.9f} ({rate:,.0f} frames/s)"
                )
                ctx.writer.add_scalar("Loss/train_total", train_loss, ep)
                ctx.writer.add_scalar("Loss/train_average", avg, ep)
        # one machine-readable line per drain: bench._parse_resident_output
        # reads windows from these exactly — inferring windows from
        # consecutive-equal per-epoch rates merges two windows whose
        # rounded rates happen to collide
        print(f"[drain] {n_done} epochs in {window_s:.3f}s = "
              f"{rate:,.0f} frames/s")
        ctx.timer.start()

    hist_every = cfg.tpu.histogram_interval

    # Checkpoint-boundary pipelining: at a boundary the host blocks on the
    # loss drain, then spends several host-link round trips on state-reading
    # actions (histogram pull, reconstruction, checkpoint write) — all while
    # the device idles.  Instead: snapshot the boundary state ON-DEVICE
    # (fresh buffers, so donating the live state to the next dispatch stays
    # legal), put the NEXT group in flight immediately, and run every
    # boundary action from the snapshot while the device trains ahead.
    # Disabled when a profiler window is configured (its trace must cover
    # exactly one dispatch).
    snap_fn = jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))

    # Async boundary I/O (see AsyncBoundaryWriter): the state fetch and the
    # histogram/best/periodic writes leave the training thread entirely.
    # Single-process npz runs only — multihost boundary actions contain
    # collectives that must stay on the main thread in program order, and
    # orbax runs its own async protocol against the live jax.Arrays.
    bwriter = (L.AsyncBoundaryWriter()
               if (cfg.tpu.async_checkpoint and not multihost
                   and cfg.tpu.checkpoint_format != "orbax") else None)
    ctx.boundary_writer = bwriter  # finish() joins on exception paths

    def group_end(e0: int) -> int:
        """Last epoch (inclusive) of the group starting at e0.  A group
        runs through the first epoch whose post-epoch action fires (a
        checkpoint or histogram boundary), stops just short of the profile
        epoch so its trace covers exactly one dispatch, and is capped at
        the compiled group size."""
        cap = min(epochs - 1, e0 + group_k - 1)
        last = e0
        while last < cap:
            if (interval and last % interval == 0 and last != 0) \
                    or (hist_every and last % hist_every == 0) \
                    or last == profile_epoch or last + 1 == profile_epoch:
                break
            last += 1
        return last

    total_t0 = time.perf_counter()
    io_s = 0.0  # host wall spent in boundary actions (hist/ckpt/best I/O)
    # boundary-drain link meter: [bytes, seconds] of device→host state
    # fetches at checkpoint boundaries.  bytes/seconds is the measured
    # drain bandwidth — through the axon tunnel it reads the ~18 MB/s hop,
    # on local PCIe the GB/s bus — so a reader of the summary can tell a
    # device regression from link weather without external context.  The
    # async worker mutates it; the end-of-run reads happen after flush().
    link_acc = [0.0, 0.0]

    def _meter_drain(tree, t0: float) -> None:
        if tree is None:
            return
        link_acc[0] += sum(
            a.nbytes for a in jax.tree_util.tree_leaves(tree)
            if hasattr(a, "nbytes"))
        link_acc[1] += time.perf_counter() - t0

    # steady-state marker: set right after the FIRST group finishes (that
    # group's dispatch carries the jit compile, ~50-140 s through the
    # tunnel), so the summary can report a compile-excluded e2e rate —
    # the number that actually describes a long run's throughput
    steady_t0 = None
    steady_done = 0  # epochs finished when the marker was set
    ctx.timer.start()
    epoch = start_epoch
    predispatched = None  # last epoch of a group already in flight
    while epoch < epochs:
        if predispatched is not None:
            last, predispatched = predispatched, None
        else:
            last = group_end(epoch)
            k = last - epoch + 1
            profiling = profile_epoch == epoch and k == 1
            if profiling:
                drain()  # bound the trace to this epoch's dispatch
                jax.profiler.start_trace(
                    str(ctx.workspace.log_dir / "profile"))
            ctx.state, dev_losses = run_epochs(ctx.state, dev_corpus,
                                               epoch, k=k)
            pending.append((epoch, k, dev_losses, time.perf_counter()))
            # start the device→host loss copy NOW: it lands right behind
            # the group's compute, so the checkpoint-boundary drain doesn't
            # pay a fresh fetch round trip per pending group
            L.prefetch_host(dev_losses)
            if steady_t0 is None:
                # the wait is free: the first dispatch's compile already
                # gates everything behind it.  Fetch a REAL value, not just
                # block_until_ready — through the axon tunnel the async
                # compile can outlive the block (the repo timing rule),
                # which would stamp steady_t0 early and silently absorb
                # compile time into the "steady e2e" window.  The loss
                # matrix shard is tiny (k x n_batches floats).
                np.asarray(jax.device_get(
                    dev_losses.addressable_shards[0].data))
                steady_t0 = time.perf_counter()
                steady_done = last + 1 - start_epoch
            if profiling:
                drain()
                jax.profiler.stop_trace()
            elif len(pending) >= 4:
                # backpressure: wait for the OLDEST group to finish (without
                # draining — later groups stay in flight) so in-flight work
                # and interrupt latency stay bounded with the pipeline full
                jax.block_until_ready(pending[0][2])
        epoch = last  # the boundary checks below refer to the LAST epoch run

        hist_fires = bool(hist_every and epoch % hist_every == 0)
        ckpt_fires = bool(interval and epoch % interval == 0 and epoch != 0)
        # one synced read per group iteration: every process evaluates the
        # allgather at the same point (hist/ckpt fire identically on all
        # hosts), so the cluster agrees whether to stop
        stop_now = _sync_stop(stop, multihost)
        if not (hist_fires or ckpt_fires or stop_now):
            epoch += 1
            continue

        # dispatch-ahead before blocking on the drain (see snap_fn comment)
        snap = next_group = None
        recon_done = False
        if ((hist_fires or ckpt_fires) and not stop_now
                and profile_epoch < 0 and epoch + 1 < epochs):
            snap = snap_fn(ctx.state)
            if ckpt_fires and cfg.dataset.generate_test:
                # device-side eval must be enqueued BEFORE the next group's
                # dispatch, or it queues behind up to group_k epochs of
                # compute and the checkpoint artifact (and any interrupt)
                # trails by that much.  The host blocks on the small
                # inference here; the expensive boundary actions (drain,
                # histogram pull, checkpoint write) still overlap below.
                _live = ctx.state
                ctx.state = snap
                try:
                    L.reconstruct_test_set(ctx, epoch)
                finally:
                    ctx.state = _live
                recon_done = True
            nlast = group_end(epoch + 1)
            nk = nlast - epoch
            ctx.state, dl2 = run_epochs(ctx.state, dev_corpus, epoch + 1,
                                        k=nk)
            L.prefetch_host(dl2)
            next_group = (epoch + 1, nk, dl2, time.perf_counter(), nlast)

        drain()  # only groups ≤ the boundary: next_group isn't pending yet
        if snap is not None:
            # stream the snapshot to the host only AFTER the drain: every
            # boundary action below reads it (via fetch_host_state) and the
            # async copy rides the link while the device runs the
            # dispatched-ahead group — but enqueued BEFORE the drain it
            # serialized the tiny loss fetch behind the whole state's bytes
            # (~300 MB through the tunnel), stalling the loop ~5 s per
            # boundary while the device idled (round-4 measurement)
            L.prefetch_host(snap)
        io_t0 = time.perf_counter()
        live = None
        if snap is not None:
            live, ctx.state = ctx.state, snap  # actions see boundary state
        # With a device snapshot in hand the boundary I/O can leave this
        # thread entirely: the worker fetches the snapshot and runs the
        # histogram/best/periodic writes while the loop trains ahead.
        use_async = bwriter is not None and snap is not None
        if bwriter is not None and not use_async:
            # synchronous fallback (last-epoch boundary, profiling): the
            # PREVIOUS boundary's worker may still be writing the very
            # artifacts (best gate, checkpoints) this thread is about to
            # write — settle it first or the two race on the same tmp
            # paths and the best gate runs out of order
            bwriter.flush()
        # ONE device→host fetch of the boundary state (sync path only — the
        # async path fetches on the worker), shared by every action below —
        # histograms, the best gate, and the periodic checkpoint each pulled
        # their own copy before (3× the params plus the optimizer state ≈
        # seconds per boundary through the host link).  The identical
        # (hist_fires or ckpt_fires) predicate on every process keeps any
        # collective fallback paths aligned.
        _ft0 = time.perf_counter()
        host, host_p = (L.boundary_host_state(ctx)
                        if (hist_fires or ckpt_fires) and not use_async
                        else (None, None))
        _meter_drain(host if host is not None else host_p, _ft0)
        try:
            if hist_fires and not use_async:
                L.log_param_histograms(ctx, epoch, params=host_p)
            # re-sync: a signal may have landed after the dispatch-ahead
            # decision (all processes take the same branch, so the
            # conditional collective still matches up cluster-wide)
            if stop_now or _sync_stop(stop, multihost):
                if bwriter is not None:
                    # settle any in-flight boundary first: the best gate and
                    # artifact trail must be in order before the interrupt
                    # checkpoint (and its errors must surface here, not be
                    # dropped with the process exit)
                    bwriter.flush()
                if hist_fires and use_async:  # not logged above
                    host = L.fetch_host_state(ctx.state)
                    host_p = None if host is None else host.params
                    L.log_param_histograms(ctx, epoch, params=host_p)
                ckpt_state = host  # valid unless the state runs ahead below
                if next_group is not None:
                    # the signal landed after the dispatch-ahead decision:
                    # the next group is already computing on-device.  Fold
                    # it in — drain its losses and checkpoint the
                    # post-group state — so the returned context, the
                    # checkpoint label, and the TB trail all agree (a
                    # checkpoint at the boundary epoch with a state that
                    # silently ran ahead would be inconsistent).
                    e1, nk2, dl2, t_disp, nlast = next_group
                    pending.append((e1, nk2, dl2, t_disp))
                    next_group = None
                    if live is not None:
                        ctx.state, live = live, None
                    epoch = nlast
                    drain()
                    ckpt_state = None  # snapshot is stale: state ran ahead
                print(f"Interrupted after epoch {epoch}; checkpointing.")
                L.save_periodic_checkpoint(ctx, {"epoch": epoch},
                                           label=epoch,
                                           host_state=ckpt_state)
                return ctx
            if use_async:
                if ckpt_fires:
                    print(f"Checkpoint - Epoch {epoch}")
                    if cfg.dataset.generate_test and not recon_done:
                        # device work stays on the loop thread (snap is
                        # normally reconstructed at dispatch-ahead already)
                        L.reconstruct_test_set(ctx, epoch)
                # the worker owns the snapshot from here; the closure never
                # touches ctx.state (ctx.best_loss/cfg/writer mutations are
                # worker-sequential, and the loop only reads them after a
                # flush — interrupt or end of run)
                def boundary_io(bs=ctx.state, ep=epoch, tl=train_loss,
                                hist=hist_fires, ck=ckpt_fires):
                    ft0 = time.perf_counter()
                    h = L.fetch_host_state(bs)
                    _meter_drain(h, ft0)
                    hp = None if h is None else h.params
                    if hist or (ck and not hist_every):
                        L.log_param_histograms(ctx, ep, params=hp)
                    if ck:
                        # best gate first: the checkpoint meta must record
                        # this boundary's gate, not last interval's
                        L.maybe_save_best(ctx, tl, ep,
                                          cfg.training.save_best_model_after,
                                          host_params=hp)
                        L.save_periodic_checkpoint(ctx, {"epoch": ep},
                                                   label=ep, host_state=h)

                bwriter.submit(boundary_io)
            elif ckpt_fires:
                print(f"Checkpoint - Epoch {epoch}")
                if not hist_every:
                    L.log_param_histograms(ctx, epoch, params=host_p)
                if cfg.dataset.generate_test and not recon_done:
                    L.reconstruct_test_set(ctx, epoch)
                # best gate first: the checkpoint meta must record this
                # boundary's gate, not last interval's
                L.maybe_save_best(ctx, train_loss, epoch,
                                  cfg.training.save_best_model_after,
                                  host_params=host_p)
                L.save_periodic_checkpoint(ctx, {"epoch": epoch},
                                           label=epoch, host_state=host)
        finally:
            if live is not None:
                ctx.state = live
        if next_group is not None:
            e1, nk, dl2, t_disp, nlast = next_group
            pending.append((e1, nk, dl2, t_disp))
            predispatched = nlast
        io_s += time.perf_counter() - io_t0
        ctx.timer.start()  # exclude boundary I/O from the next window
        epoch += 1

    drain()
    if bwriter is not None:
        bwriter.flush()  # settle the last boundary before the tail reads
    wall = time.perf_counter() - total_t0
    done = epochs - start_epoch
    if done > 0:
        # the unambiguous number: every trained frame over the full wall
        # clock, with the host I/O share (checkpoint/TB state pulls and
        # writes — a link property, not a device one) broken out so a slow
        # host link reads as what it is
        print(f"====> Resident epochs e2e: {done} epochs in {wall:.2f}s = "
              f"{done * n_batches * batch_size / max(wall, 1e-9):,.0f} "
              f"frames/s wall-clock incl. checkpoints "
              f"({io_s:.2f}s of that is boundary host I/O)")
        if link_acc[1] > 0:
            # measured drain bandwidth — lets a reader of the bench
            # artifact tell device regression from link weather (the
            # fetch can overlap the dispatched-ahead group's compute, so
            # this is a lower bound on the raw link rate when the drain
            # wasn't the bottleneck — exactly the case where it doesn't
            # matter)
            mb = link_acc[0] / 1e6
            print(f"[boundary-link] {mb:.1f} MB of state drained in "
                  f"{link_acc[1]:.2f}s = {mb / link_acc[1]:.1f} MB/s")
        if steady_t0 is not None and done > steady_done:
            # the long-run figure: everything after the first group (whose
            # dispatch carries the one-time jit compile), checkpoints and
            # boundary I/O included
            sd = done - steady_done
            sw = max(time.perf_counter() - steady_t0, 1e-9)
            print(f"====> Resident steady e2e (excl. first-dispatch "
                  f"compile): {sd} epochs in {sw:.2f}s = "
                  f"{sd * n_batches * batch_size / sw:,.0f} frames/s")
            if io_s > 0:
                # link-normalized projection: the same window with the
                # on-loop boundary wall (state drains + checkpoint waits —
                # a link property, not a device one) subtracted; on local
                # PCIe the two figures converge
                ex = max(sw - io_s, 1e-9)
                print(f"====> Resident steady e2e ex-boundary-I/O: {sd} "
                      f"epochs in {ex:.2f}s = "
                      f"{sd * n_batches * batch_size / ex:,.0f} frames/s")

    final_epoch = max(epochs - 1, 0)
    print(f"Last Checkpoint - Epoch {final_epoch}")
    host, host_p = L.boundary_host_state(ctx)  # one fetch, whole tail
    if not hist_every and epochs > start_epoch and not (
            interval and final_epoch % interval == 0 and final_epoch != 0):
        # (guard: the checkpoint branch already logged this epoch)
        L.log_param_histograms(ctx, final_epoch, params=host_p)
    if cfg.dataset.generate_test:
        L.reconstruct_test_set(ctx, epochs)
    if np.isfinite(train_loss):
        L.maybe_save_best(ctx, train_loss, epochs,
                          cfg.training.save_best_model_after,
                          host_params=host_p)
    L.save_periodic_checkpoint(ctx, {"epoch": epochs}, label=epochs,
                               host_state=host)
    L.save_last(ctx, host_params=host_p)
    return ctx


def datapath_audio_dir(cfg: Config) -> Path:
    return cfg.dataset.datapath_path / "audio"

