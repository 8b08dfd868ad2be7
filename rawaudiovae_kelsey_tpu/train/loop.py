"""Shared driver machinery for the epoch and streaming trainers.

Everything both reference drivers duplicated (device pick, workspace, writer,
test fixture, model/optimizer construction, periodic reconstruction, best/last
model bookkeeping — train.py vs train_iterable.py) lives here once; the two
drivers are thin loops over this.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rawaudiovae_kelsey_tpu.config import Config, Workspace, create_workspace
from rawaudiovae_kelsey_tpu.data.datasets import TestFrameDataset
from rawaudiovae_kelsey_tpu.eval.fixtures import init_test_audio
from rawaudiovae_kelsey_tpu.io import write_wav
from rawaudiovae_kelsey_tpu.models.registry import ModelDef, build_model
from rawaudiovae_kelsey_tpu.observe import EventWriter, StepTimer
from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding, make_mesh
from rawaudiovae_kelsey_tpu.parallel.sharding import (
    named_shardings,
    param_specs,
)
from rawaudiovae_kelsey_tpu.parallel.step import (
    build_eval_step,
    build_train_step,
)
from rawaudiovae_kelsey_tpu.train import checkpoint as ckpt
from rawaudiovae_kelsey_tpu.train.optim import build_optimizer
from rawaudiovae_kelsey_tpu.train.state import TrainState


@dataclass
class TrainContext:
    cfg: Config
    workspace: Workspace
    model: ModelDef
    state: TrainState
    train_step: Callable
    eval_step: Callable
    writer: EventWriter
    mesh: Any
    timer: StepTimer
    test_dataset: Optional[TestFrameDataset] = None
    audio_log_dir: Optional[Path] = None
    best_loss: float = float("inf")
    start_step: int = 0
    start_meta: dict = field(default_factory=dict)
    # the resident trainers park their AsyncBoundaryWriter here so finish()
    # can join an in-flight boundary even on exception paths (a daemon
    # worker would otherwise be killed mid-write at process exit)
    boundary_writer: Optional["AsyncBoundaryWriter"] = None

    def close(self) -> None:
        self.writer.close()


def describe_device() -> str:
    """Device banner — the reference crashed here on CPU-only hosts
    (train.py:89 called torch.cuda.get_device_name unconditionally, quirk #3)."""
    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind} x{jax.device_count()}"


def setup(cfg: Config, use_mesh: bool = True,
          resume: Optional[bool] = None) -> TrainContext:
    """Build everything up to (but excluding) the batch loop, mirroring the
    preamble of both reference drivers (train.py:88-163)."""
    cfg.validate()
    cfg.stamp_start()
    if cfg.tpu.multihost:
        from rawaudiovae_kelsey_tpu.parallel.mesh import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(cfg.tpu.coordinator_address)
    device_name = describe_device()
    print(f"Device: {device_name}")
    cfg.vae.device_name = device_name

    ws = _make_workspace_coordinated(cfg)
    print(f"Workspace: {ws.workdir}")

    mesh = None
    if use_mesh and jax.device_count() > 1:
        mesh = make_mesh(cfg.tpu.data_parallel, cfg.tpu.model_parallel)

    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(cfg.tpu.seed))
    if mesh is not None:
        # place params in their mesh layout first; Adam moments then inherit
        # the same shardings because optimizer.init builds them elementwise
        # from the (already sharded) params
        specs = param_specs(model.name, params, cfg.tpu.model_parallel)
        params = jax.device_put(params, named_shardings(mesh, specs))
    opt_state = optimizer.init(params)
    state = TrainState.create(params, opt_state, seed=cfg.tpu.seed)

    if cfg.extra.plot_model:
        from rawaudiovae_kelsey_tpu.models.registry import summarize

        print(summarize(model, params))

    train_step = build_train_step(model, cfg, optimizer, mesh=mesh)
    eval_step = build_eval_step(model, cfg, mesh=mesh)
    writer = EventWriter(ws.log_dir)

    ctx = TrainContext(
        cfg=cfg, workspace=ws, model=model, state=state,
        train_step=train_step, eval_step=eval_step, writer=writer,
        mesh=mesh, timer=StepTimer(),
    )

    # resume (new capability; the reference never reloaded checkpoints)
    want_resume = cfg.training.resume if resume is None else resume
    if want_resume:
        latest = _find_resume_checkpoint(cfg, exclude=ws.workdir)
        if latest is not None:
            ctx.state, meta = ckpt.restore_checkpoint(latest, ctx.state)
            ctx.start_step = int(jax.device_get(ctx.state.step))
            ctx.best_loss = float(meta.get("best_loss", float("inf")))
            ctx.start_meta = meta
            print(f"Resumed from {latest} at step {ctx.start_step}")

    # held-out reconstruction fixture (train.py:153-155)
    if cfg.dataset.generate_test:
        test_dir = cfg.dataset.datapath_path / cfg.dataset.test_dataset
        if not test_dir.exists():
            raise FileNotFoundError(test_dir.resolve())
        ctx.test_dataset, ctx.audio_log_dir = init_test_audio(
            ws.workdir, cfg.dataset.test_dataset, test_dir,
            cfg.audio.sampling_rate, cfg.audio.segment_length,
            mono=cfg.dataset.mono,
        )

    ws.snapshot_config(cfg)
    return ctx


def _make_workspace_coordinated(cfg: Config) -> Workspace:
    """Single-process: plain create_workspace.  Multihost: the coordinator
    creates run-NNN and broadcasts the path; other processes open it
    (independent creation would race into N distinct run dirs)."""
    if jax.process_count() <= 1:
        return create_workspace(cfg)
    from jax.experimental import multihost_utils

    from rawaudiovae_kelsey_tpu.config.workspace import open_workspace

    LIMIT = 4096
    if jax.process_index() == 0:
        ws = create_workspace(cfg)
        raw = str(ws.workdir.resolve()).encode()
        # length-prefixed so an over-long path fails CLEANLY on every
        # process (raising on the coordinator alone would leave the
        # others blocked in the broadcast forever)
        n = len(raw) if len(raw) <= LIMIT else 0xFFFFFFFF
    else:
        raw, n = b"", 0
    buf = np.zeros(4 + LIMIT, np.uint8)
    buf[:4] = np.frombuffer(np.uint32(n).tobytes(), np.uint8)
    buf[4: 4 + min(len(raw), LIMIT)] = np.frombuffer(raw[:LIMIT], np.uint8)
    shared = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(bytes(shared[:4]), np.uint32)[0])
    if n == 0xFFFFFFFF:
        raise ValueError(
            f"workspace path exceeds the {LIMIT}-byte broadcast limit"
        )
    path = bytes(shared[4: 4 + n]).decode()
    cfg.dataset.workspace = path
    if jax.process_index() == 0:
        return ws
    # the dir may take a moment to appear on shared storage
    import time as _time

    p = Path(path)
    for _ in range(100):
        if p.is_dir():
            break
        _time.sleep(0.05)
    return open_workspace(p)


def _find_resume_checkpoint(cfg: Config,
                            exclude: Optional[Path] = None) -> Optional[Path]:
    """Newest checkpoint across prior runs of this description, skipping the
    just-created (empty) workspace."""
    from rawaudiovae_kelsey_tpu.config.workspace import iter_runs

    my_runs = cfg.dataset.datapath_path / cfg.extra.description
    if not my_runs.is_dir():
        return None

    for run in reversed(iter_runs(my_runs)):
        if exclude is not None and run.resolve() == Path(exclude).resolve():
            continue
        found = ckpt.latest_checkpoint(Workspace(run).checkpoint_dir)
        if found is not None:
            return found
    return None


def prefetch_host(tree) -> None:
    """Enqueue device→host copies for every array in ``tree`` without
    blocking.  The transfer is ordered after the producing computation, so
    a later ``device_get`` finds the bytes already on (or streaming to) the
    host instead of paying a fresh request round trip through the host link
    at drain time (~28 ms each through the tunnel — docs/PERF.md).  Used by
    the resident trainers on their per-group loss buffers the moment each
    group is dispatched."""
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:  # non-jax leaf (e.g. python scalar)
            pass


def batch_to_device(ctx: TrainContext, batch: np.ndarray) -> jax.Array:
    if ctx.mesh is not None:
        return jax.device_put(batch, batch_sharding(ctx.mesh))
    return jax.device_put(batch)


def reconstruct_test_set(ctx: TrainContext, step_label: int) -> np.ndarray:
    """Periodic eval reconstruction (train.py:214-237): run the full test set
    through the model, flatten to one waveform, write
    ``test_reconst_{step:05d}.wav`` and log it as TB audio."""
    assert ctx.test_dataset is not None and ctx.audio_log_dir is not None
    params = ctx.state.params
    key = jax.random.fold_in(ctx.state.rng, 0x7E57)  # eval stream, disjoint
    n_dev = ctx.mesh.devices.size if ctx.mesh is not None else 1
    outs = []
    for i, batch in enumerate(
        ctx.test_dataset.batches(ctx.cfg.training.batch_size)
    ):
        n = batch.shape[0]
        if n % n_dev:  # pad to the mesh, truncate after
            pad = n_dev - n % n_dev
            batch = np.concatenate([batch, batch[:1].repeat(pad, 0)], axis=0)
        # hand jit the host array: identical on every process, so jit
        # places/replicates it per the step's lowering (a pre-committed
        # local jnp array also works on current jax, verified 2-process,
        # but numpy is the layout-agnostic form)
        recon = ctx.eval_step(params, jax.random.fold_in(key, i),
                              np.ascontiguousarray(batch, np.float32))
        if jax.process_count() > 1:
            # global array spans processes — gather it everywhere first
            from jax.experimental import multihost_utils

            recon = multihost_utils.process_allgather(recon, tiled=True)
        outs.append(np.asarray(jax.device_get(recon))[:n])
    wave = np.concatenate(outs, axis=0).reshape(-1)
    if jax.process_index() != 0:
        return wave  # all processes computed (collective); only one writes
    if ctx.cfg.extra.normalize_examples:
        # the reference's dead normalize_examples key (default.ini:35,
        # quirk #9), made functional: peak-normalize written examples
        peak = float(np.abs(wave).max())
        if peak > 0:
            wave = wave / peak
    out_path = ctx.audio_log_dir / f"test_reconst_{step_label:05d}.wav"
    write_wav(out_path, wave, ctx.cfg.audio.sampling_rate)
    print(f"Audio examples generated: {out_path}")
    # TB example cropped to example_length seconds (dead reference key
    # default.ini:36, quirk #9 — the wav on disk stays full length)
    tb_wave = wave
    ex_len = ctx.cfg.extra.example_length
    if ex_len > 0:
        tb_wave = wave[: ex_len * ctx.cfg.audio.sampling_rate]
    ctx.writer.add_audio("Reconstructed Audio", tb_wave, step_label,
                         sample_rate=ctx.cfg.audio.sampling_rate)
    return wave


def _host_params(params):
    """Params as host arrays, safe for sharded multi-process state: a plain
    device_get crashes on non-fully-addressable arrays (e.g. model-parallel
    over DCN).  Collective when gathering — every process must call this at
    the same point (all callers are driver actions all processes reach)."""
    leaves = jax.tree_util.tree_leaves(params)
    if all(not isinstance(l, jax.Array) or l.is_fully_addressable
           for l in leaves):
        return jax.device_get(params)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(params, tiled=True)


def fetch_host_state(state):
    """The whole train state as host arrays in ONE device→host fetch — or
    ``None`` when a leaf is neither addressable nor replicated (exotic
    sharded-multihost states keep their existing collective paths).

    A checkpoint boundary runs three state-reading actions (histogram
    logging, the best-model gate, the periodic checkpoint write) and each
    used to pull its own copy — 3× the parameters plus the optimizer state,
    several seconds per boundary through a network host link.  Fetching once
    and sharing the host tree makes a boundary pay for exactly one state
    transfer (and :func:`prefetch_host` at snapshot time streams those bytes
    behind the dispatched-ahead group, so the fetch here finds them mostly
    resident).  Purely local — safe at any point on any process."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    if not all(not isinstance(l, jax.Array)
               or l.is_fully_addressable or l.is_fully_replicated
               for l in leaves):
        return None
    return jax.tree_util.tree_unflatten(treedef, jax.device_get(leaves))


def boundary_host_state(ctx: TrainContext):
    """``(host_state, host_params)`` for a checkpoint boundary's writers:
    the full state tree for the npz writer; PARAMS-ONLY under orbax, whose
    writer takes the live jax.Arrays itself — fetching the Adam moments
    through the host link there would be pure waste (the params still
    serve the histogram logger and the best gate)."""
    if ctx.cfg.tpu.checkpoint_format == "orbax":
        return None, fetch_host_state(ctx.state.params)
    host = fetch_host_state(ctx.state)
    return host, None if host is None else host.params


class AsyncBoundaryWriter:
    """Checkpoint-boundary host I/O on a background thread.

    Even with the boundary state snapshotted on-device and the next group
    dispatched ahead, the TRAINING THREAD still blocked on the boundary's
    host work — one full state fetch through the host link plus the
    histogram/best/periodic writes (~1.6 s per boundary through a network
    tunnel, milliseconds on local PCIe but still serial with training).
    Submitting the boundary closure here takes it off the critical path
    entirely: the loop trains ahead while the worker fetches and writes.

    Depth 1 by design: ``submit`` first waits for the previous boundary, so
    at most one snapshot is alive off-loop (bounds host+device memory) and
    boundaries execute strictly in order (the best gate mutates shared
    bookkeeping).  ``flush()`` joins the in-flight boundary and re-raises
    any worker exception on the caller — the trainers flush before
    interrupt checkpoints and the end-of-run tail, so those always see
    settled ``best_loss``/artifact state.  Only safe when the closure is
    collective-free (single-process, or pre-fetched host trees)."""

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    def submit(self, fn: Callable[[], None]) -> float:
        """Queue ``fn``; returns seconds spent waiting for the PREVIOUS
        boundary to clear (the only part of the I/O left on the loop)."""
        t0 = time.perf_counter()
        self.flush()
        wait_s = time.perf_counter() - t0

        def run() -> None:
            try:
                fn()
            except BaseException as e:  # re-raised on the loop at flush
                self._err = e

        self._thread = threading.Thread(
            target=run, name="boundary-io", daemon=True)
        self._thread.start()
        return wait_s

    def flush(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("checkpoint-boundary I/O failed") from err


def log_param_histograms(ctx: TrainContext, step: int,
                         params=None) -> None:
    """Per-parameter histograms with torch-style dotted names
    (train.py:203-204).  For the dense model the tags match the reference
    exactly (``fc1.weight`` …) via the compat layout.  ``params`` may pass a
    pre-fetched host tree (see :func:`fetch_host_state`) to skip the device pull."""
    if params is None:
        params = _host_params(ctx.state.params)
    if ctx.model.name == "dense":
        from rawaudiovae_kelsey_tpu.compat import params_to_state_dict

        for name, arr in params_to_state_dict(params).items():
            ctx.writer.add_histogram(name, arr, step)
        return
    from rawaudiovae_kelsey_tpu.models.registry import tree_dotted_names

    for name, leaf in tree_dotted_names(params):
        ctx.writer.add_histogram(name, np.asarray(leaf), step)


def save_periodic_checkpoint(ctx: TrainContext, extra: dict,
                             label: int | None = None,
                             host_state=None) -> Path:
    """``host_state`` may pass a pre-fetched host tree (see
    :func:`fetch_host_state`) — used by the npz writer to skip its own device
    pull.  The orbax path always hands the live jax.Arrays to orbax (its
    distributed protocol wants the sharded arrays, not a host gather)."""
    extra = dict(extra)
    extra["best_loss"] = ctx.best_loss
    if ctx.cfg.tpu.checkpoint_format == "orbax":
        # async_checkpoint → return after the device→host copy; orbax's own
        # background threads finish the write (and the multihost commit).
        # finish()/restore/latest_checkpoint wait, so nothing exits or
        # resumes past an in-flight save.
        path = ckpt.save_checkpoint_orbax(
            ctx.workspace.checkpoint_dir, ctx.state, extra, label=label,
            wait=not ctx.cfg.tpu.async_checkpoint,
        )
    else:
        path = ckpt.save_checkpoint(
            ctx.workspace.checkpoint_dir,
            ctx.state if host_state is None else host_state,
            extra, label=label,
        )
    # retention ([training] keep_checkpoints): prune AFTER the new save so
    # a failed write can't leave fewer than `keep` on disk.  One process
    # only (concurrent rmtree races).  An orbax save still in flight isn't
    # committed yet — it joins the budget at the next boundary's prune.
    keep = ctx.cfg.training.keep_checkpoints
    if keep > 0 and jax.process_index() == 0:
        ckpt.prune_checkpoints(ctx.workspace.checkpoint_dir, keep)
    # a checkpoint boundary is the natural TB durability point: push the
    # buffered event records to disk so live TensorBoard keeps up (the
    # resident loops only touch the writer in drained bursts); getattr —
    # unit tests drive this with a bare namespace ctx
    writer = getattr(ctx, "writer", None)
    if writer is not None:
        writer.flush()
    return path


def maybe_save_best(ctx: TrainContext, train_loss: float, step_label: int,
                    after: int, host_params=None) -> bool:
    """Best-model gate with a real best tracker (the reference's
    ``train_loss_prev`` started at 1e6 and was never updated — quirk #7).
    ``host_params`` may pass a pre-fetched host tree (see
    :func:`fetch_host_state`)."""
    if step_label > after and train_loss < ctx.best_loss:
        ctx.best_loss = train_loss
        # BEFORE the process gate: every process's cfg must agree (the
        # config snapshot is written by process 0, and a collective host
        # gather needs all processes)
        ctx.cfg.training.best_epoch = str(step_label)
        host = (host_params if host_params is not None
                else _host_params(ctx.state.params))
        path = ctx.workspace.model_dir / "best_model.npz"
        if jax.process_index() != 0:
            return True
        ckpt.save_params(path, host)
        print(f"Step {step_label:05d}: Saved {path}")
        return True
    elif train_loss > ctx.best_loss:
        print("Loss did not improve.")
    return False


def save_last(ctx: TrainContext, host_params=None) -> Path:
    path = ctx.workspace.model_dir / "last_model.npz"
    if host_params is None:
        host_params = _host_params(ctx.state.params)  # collective — pre-gate
    if jax.process_index() != 0:
        return path
    ckpt.save_params(path, host_params)
    print("Training Finished: Saved the last model")
    return path


def finish(ctx: TrainContext) -> None:
    if ctx.boundary_writer is not None:
        # exception-path safety net: the trainers flush on every normal
        # path, so an error here means the run is already failing — report
        # the secondary failure without masking the primary one
        try:
            ctx.boundary_writer.flush()
        except Exception as e:
            print(f"WARNING: checkpoint-boundary I/O failed during "
                  f"shutdown: {e!r}")
    ckpt.wait_for_orbax()  # never exit with an async save in flight
    # re-apply retention now that every async save has committed (an orbax
    # save in flight at the last boundary's prune wasn't countable yet)
    keep = ctx.cfg.training.keep_checkpoints
    if keep > 0 and jax.process_index() == 0:
        ckpt.prune_checkpoints(ctx.workspace.checkpoint_dir, keep)
    ctx.cfg.stamp_end()
    ctx.workspace.snapshot_config(ctx.cfg)
    ctx.close()
