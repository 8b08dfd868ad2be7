"""End-to-end driver tests: the epoch trainer (train.py flow) and streaming
trainer (train_iterable.py flow) on a scratch wav dataset, checking the full
workspace contract — run dirs, config snapshot, checkpoints, reconstructions,
TB events, best/last models, resume."""

import re

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.config import Config, load_config
from rawaudiovae_kelsey_tpu.io import read_wav, write_wav


@pytest.fixture
def scratch_dataset(tmp_path):
    rng = np.random.default_rng(7)
    audio = tmp_path / "audio"
    test = tmp_path / "test_audio"
    audio.mkdir()
    test.mkdir()
    for i in range(3):
        n = 4000 + 1000 * i
        wave = (0.5 * np.sin(np.linspace(0, 50 * (i + 1), n))).astype(np.float32)
        write_wav(audio / f"train{i}.wav", wave, 44100)
    for i in range(2):
        wave = rng.uniform(-0.3, 0.3, 3000).astype(np.float32)
        write_wav(test / f"test{i}.wav", wave, 44100)
    return tmp_path


def small_cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.dataset.datapath = str(tmp_path)
    cfg.audio.segment_length = 512
    cfg.audio.hop_length = 128
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = 16
    cfg.training.batch_size = 32
    cfg.training.epochs = 4
    cfg.training.checkpoint_interval = 2
    cfg.training.save_best_model_after = 0
    cfg.training.learning_rate = 1e-3
    cfg.extra.description = "e2e_test"
    return cfg


def test_epoch_trainer_full_contract(scratch_dataset):
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    ctx = train(cfg, verbose=False)
    ws = ctx.workspace

    # workspace layout (train.py:93-149, tests.py:17-18)
    assert ws.workdir.name == "run-000"
    assert (ws.workdir / "config.ini").exists()
    assert ws.checkpoint_dir.is_dir()
    assert ws.log_dir.is_dir()
    assert ws.audio_log_dir.is_dir()

    # config mutated + persisted (train.py:109,130,304-305)
    snap = load_config(ws.config_path)
    assert snap.dataset.workspace == str(ws.workdir.resolve())
    assert int(snap.dataset.total_frames) > 0
    assert snap.vae.device_name
    assert snap.extra.start and snap.extra.end and snap.extra.time_elapsed

    # eval fixture (tests.py:24-41)
    assert (ws.audio_log_dir / "test_audio.txt").exists()
    orig, sr = read_wav(ws.audio_log_dir / "test_original.wav")
    assert sr == 44100 and len(orig) >= 6000

    # periodic + final reconstructions (train.py:218-237, 261-286)
    recs = sorted(ws.audio_log_dir.glob("test_reconst_*.wav"))
    names = [r.name for r in recs]
    assert "test_reconst_00002.wav" in names  # epoch 2 checkpoint
    assert "test_reconst_00004.wav" in names  # final (epochs)
    rec, _ = read_wav(recs[-1])
    # reconstruction is nonzero audio of the test-set length (padded)
    assert np.abs(rec).max() > 0
    assert len(rec) % 512 == 0

    # checkpoints + best/last models
    assert (ws.checkpoint_dir / "ckpt_00004.npz").exists() or \
        list(ws.checkpoint_dir.glob("ckpt_*.npz"))
    assert (ws.model_dir / "best_model.npz").exists()
    assert (ws.model_dir / "last_model.npz").exists()

    # TB events written
    assert list(ws.log_dir.glob("events.out.tfevents.*"))


def test_epoch_trainer_missing_test_dir_raises(scratch_dataset):
    import shutil

    from rawaudiovae_kelsey_tpu.train.epoch import train

    shutil.rmtree(scratch_dataset / "test_audio")
    cfg = small_cfg(scratch_dataset)
    with pytest.raises(FileNotFoundError):
        train(cfg, verbose=False)


def test_epoch_trainer_generate_test_false(scratch_dataset):
    """Quirk #8 fix: generate_test=False actually disables the fixture."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.dataset.generate_test = False
    cfg.training.epochs = 2
    cfg.training.checkpoint_interval = 0
    ctx = train(cfg, verbose=False)
    assert not list(ctx.workspace.workdir.glob("audio_logs/*"))


def test_stream_trainer_full_contract(scratch_dataset):
    from rawaudiovae_kelsey_tpu.train.stream import train

    cfg = small_cfg(scratch_dataset)
    cfg.training.total_num_frames = 32 * 20  # 20 batches
    cfg.training.checkpoint_interval = 8
    ctx = train(cfg, verbose=False)
    ws = ctx.workspace

    # console log teed (train_iterable.py:117-133)
    assert ws.console_log_path.exists()
    assert "Total number of batches: 20" in ws.console_log_path.read_text()

    recs = [r.name for r in sorted(ws.audio_log_dir.glob("test_reconst_*.wav"))]
    assert "test_reconst_00008.wav" in recs   # batch 8 checkpoint
    assert "test_reconst_00020.wav" in recs   # final
    assert (ws.model_dir / "last_model.npz").exists()
    ckpts = sorted(ws.checkpoint_dir.glob("ckpt_*.npz"))
    assert [c.name for c in ckpts][-1] == "ckpt_00020.npz"


def test_stream_trainer_resume(scratch_dataset):
    """Run 10 batches, then resume with a 20-batch budget → second run does
    only the remaining 10 and ends at ckpt_00020."""
    from rawaudiovae_kelsey_tpu.train.stream import train

    cfg = small_cfg(scratch_dataset)
    cfg.training.total_num_frames = 32 * 10
    cfg.training.checkpoint_interval = 5
    train(cfg, verbose=False)

    cfg2 = small_cfg(scratch_dataset)
    cfg2.training.total_num_frames = 32 * 20
    cfg2.training.checkpoint_interval = 5
    cfg2.training.resume = True
    ctx2 = train(cfg2, verbose=False)
    txt = ctx2.workspace.console_log_path.read_text()
    assert int(ctx2.start_step) == 10
    assert (ctx2.workspace.checkpoint_dir / "ckpt_00020.npz").exists()


def test_epoch_trainer_device_resident(scratch_dataset):
    """Device-resident mode: whole epochs in one jitted call; same workspace
    contract, loss decreases across epochs."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.epochs = 4
    ctx = train(cfg, verbose=False)
    ws = ctx.workspace
    assert (ws.model_dir / "last_model.npz").exists()
    assert (ws.checkpoint_dir / "ckpt_00004.npz").exists()
    assert list(ws.audio_log_dir.glob("test_reconst_*.wav"))
    # read Loss/train_total per epoch back from the TB event file and check
    # the curve went down
    import glob

    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    (f,) = glob.glob(str(ws.log_dir / "events.out.tfevents.*"))
    totals = {}
    for e in tb.LegacyEventFileLoader(f).Load():
        for v in e.summary.value:
            if v.tag == "Loss/train_total":
                totals[e.step] = v.simple_value
    assert len(totals) == 4
    assert totals[3] < totals[0]


def test_resident_corpus_layout(scratch_dataset):
    """The 1x-memory corpus layout (dynamic-slice assembly) also trains."""
    from rawaudiovae_kelsey_tpu.parallel.resident import choose_layout
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    # budget too small for the frames matrix but enough for raw samples
    cfg.tpu.resident_budget_gb = 100e3 / (1 << 30)
    assert choose_layout(15000, 512, 128, 4, int(100e3)) == "corpus"
    cfg.training.epochs = 2
    ctx = train(cfg, verbose=False)
    assert (ctx.workspace.model_dir / "last_model.npz").exists()


def test_normalize_examples(scratch_dataset):
    """normalize_examples=True (dead in the reference, default.ini:35)
    peak-normalizes written reconstructions."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.extra.normalize_examples = True
    cfg.training.epochs = 2
    cfg.training.checkpoint_interval = 0
    ctx = train(cfg, verbose=False)
    rec, _ = read_wav(
        sorted(ctx.workspace.audio_log_dir.glob("test_reconst_*.wav"))[-1]
    )
    assert float(np.abs(rec).max()) == pytest.approx(1.0, abs=1e-5)


def test_resident_checkpoint_pipelining_bitexact(scratch_dataset):
    """The dispatch-ahead at resident checkpoint boundaries (train/epoch.py
    `_run_resident`: snapshot → next group in flight → boundary actions from
    the snapshot) must not perturb training: a run WITH periodic checkpoints
    trains bit-identically to one without any, and the boundary checkpoint
    holds exactly the boundary-epoch state."""
    import jax

    from rawaudiovae_kelsey_tpu.train import checkpoint as ckpt
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.epochs = 5
    cfg.training.checkpoint_interval = 2  # boundaries at epochs 2 and 4
    cfg.extra.description = "pipe_ckpt"
    ctx_a = train(cfg, verbose=False)

    cfg2 = small_cfg(scratch_dataset)
    cfg2.tpu.device_resident = "always"
    cfg2.training.epochs = 5
    cfg2.training.checkpoint_interval = 0  # no boundaries → no pipelining
    cfg2.extra.description = "pipe_none"
    ctx_b = train(cfg2, verbose=False)

    pa = jax.tree_util.tree_leaves(jax.device_get(ctx_a.state.params))
    pb = jax.tree_util.tree_leaves(jax.device_get(ctx_b.state.params))
    for la, lb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # ckpt_00002 = state after epochs 0..2 (3 of 5 epochs) — the snapshot,
    # not the state advanced by the group dispatched ahead of the drain
    end_step = int(jax.device_get(ctx_a.state.step))
    assert end_step % 5 == 0
    restored, _ = ckpt.restore_checkpoint(
        ctx_a.workspace.checkpoint_dir / "ckpt_00002.npz", ctx_a.state
    )
    assert int(jax.device_get(restored.step)) == end_step * 3 // 5


def test_async_boundary_matches_sync(scratch_dataset):
    """`[tpu] async_checkpoint` moves boundary host I/O (state fetch +
    histogram/best/periodic writes) to a background worker.  Artifacts must
    be byte-identical to the synchronous path: same checkpoint files, same
    best/last models, same final state."""
    import jax

    from rawaudiovae_kelsey_tpu.train.epoch import train

    runs = {}
    for mode in (True, False):
        cfg = small_cfg(scratch_dataset)
        cfg.tpu.device_resident = "always"
        cfg.training.epochs = 5
        cfg.training.checkpoint_interval = 2
        cfg.tpu.async_checkpoint = mode
        cfg.extra.description = f"async_{mode}"
        runs[mode] = train(cfg, verbose=False)

    pa = jax.tree_util.tree_leaves(jax.device_get(runs[True].state.params))
    pb = jax.tree_util.tree_leaves(jax.device_get(runs[False].state.params))
    for la, lb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert runs[True].best_loss == runs[False].best_loss

    for rel in ("model/checkpoints/ckpt_00002.npz",
                "model/checkpoints/ckpt_00004.npz",
                "model/checkpoints/ckpt_00005.npz",
                "model/best_model.npz", "model/last_model.npz"):
        fa = runs[True].workspace.workdir / rel
        fb = runs[False].workspace.workdir / rel
        assert fa.exists() and fb.exists(), rel
        assert fa.read_bytes() == fb.read_bytes(), rel


def test_async_boundary_stream_matches_sync(scratch_dataset):
    """Same equality for the resident stream trainer's boundaries."""
    import jax

    from rawaudiovae_kelsey_tpu.train.stream import train

    runs = {}
    for mode in (True, False):
        cfg = small_cfg(scratch_dataset)
        cfg.tpu.device_resident = "always"
        cfg.training.total_num_frames = 32 * 20
        cfg.training.checkpoint_interval = 8
        cfg.tpu.async_checkpoint = mode
        cfg.extra.description = f"async_st_{mode}"
        runs[mode] = train(cfg, verbose=False)

    pa = jax.tree_util.tree_leaves(jax.device_get(runs[True].state.params))
    pb = jax.tree_util.tree_leaves(jax.device_get(runs[False].state.params))
    for la, lb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    ck_a = sorted(p.name for p in
                  (runs[True].workspace.checkpoint_dir).glob("*.npz"))
    ck_b = sorted(p.name for p in
                  (runs[False].workspace.checkpoint_dir).glob("*.npz"))
    assert ck_a == ck_b and ck_a
    for name in ck_a:
        assert (runs[True].workspace.checkpoint_dir / name).read_bytes() == \
            (runs[False].workspace.checkpoint_dir / name).read_bytes()


def test_async_boundary_writer_error_surfaces():
    """A failed boundary write must fail the RUN (at the next submit or
    flush), not vanish with the worker thread."""
    from rawaudiovae_kelsey_tpu.train.loop import AsyncBoundaryWriter

    w = AsyncBoundaryWriter()

    def boom():
        raise OSError("disk full")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="boundary I/O failed"):
        w.flush()
    # the error is consumed: the writer is reusable afterwards
    seen = []
    w.submit(lambda: seen.append(1))
    w.flush()
    assert seen == [1]


def test_async_boundary_io_error_fails_training(scratch_dataset, monkeypatch):
    """Integration: an OSError inside the async boundary closure (e.g. the
    checkpoint write hitting a full disk) propagates out of train()."""
    from rawaudiovae_kelsey_tpu.train import epoch as ep

    def explode(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ep.L, "save_periodic_checkpoint", explode)
    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.epochs = 6
    cfg.training.checkpoint_interval = 2
    cfg.extra.description = "async_err"
    with pytest.raises((RuntimeError, OSError)):
        ep.train(cfg, verbose=False)


def test_epoch_mesh_indivisible_batch_size_rejected(scratch_dataset):
    """Review regression: a batch_size not divisible by the mesh device
    count would make pad_batches_for_mesh wrap rows in EVERY batch,
    silently double-weighting them in every mean loss — the host-fed mesh
    path must reject the config loudly instead."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.training.batch_size = 30  # 8 devices: indivisible
    cfg.tpu.device_resident = "never"
    with pytest.raises(ValueError, match="divisible by the mesh"):
        train(cfg, verbose=False)


def test_resident_interrupt_after_dispatch_ahead(scratch_dataset, capsys):
    """Review regression: a stop signal landing AFTER the boundary's
    dispatch-ahead decision but BEFORE the stop check must not return a
    context whose state silently ran ahead of the saved interrupt
    checkpoint.  The pre-dispatched group is folded in: its losses drain
    (logged, not dropped) and the interrupt checkpoint holds the
    post-group state, consistent with the returned context."""
    import jax

    from rawaudiovae_kelsey_tpu.train import checkpoint as ckpt
    from rawaudiovae_kelsey_tpu.train import epoch as ep

    class FlipStop:
        # falsy at the dispatch-ahead decision, truthy at the stop check
        def __init__(self):
            self.calls = 0

        def __bool__(self):
            self.calls += 1
            return self.calls > 1

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.epochs = 5
    cfg.training.checkpoint_interval = 2  # boundary at 2; ahead group 3..4
    cfg.extra.description = "pipe_stop"
    ctx = ep.L.setup(cfg, use_mesh=False)
    try:
        ctx = ep._run(ctx, cfg, verbose=False, stop=FlipStop())
    finally:
        ep.L.finish(ctx)

    # all 5 epochs trained (the ahead group was folded in, not dropped)
    end_step = int(jax.device_get(ctx.state.step))
    assert end_step % 5 == 0 and end_step > 0
    # interrupt checkpoint is labeled with the LAST trained epoch and holds
    # exactly the returned state
    path = ctx.workspace.checkpoint_dir / "ckpt_00004.npz"
    assert path.exists()
    restored, _ = ckpt.restore_checkpoint(path, ctx.state)
    assert int(jax.device_get(restored.step)) == end_step
    for la, lb in zip(
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
        jax.tree_util.tree_leaves(jax.device_get(ctx.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # the ahead group's losses were drained into the console/TB trail
    # (the epoch trainer doesn't tee stdout — reference parity — so read
    # the captured stream)
    txt = capsys.readouterr().out
    assert "====> Epoch: 4 " in txt
    assert "Interrupted after epoch 4" in txt


def test_stream_trainer_device_resident(scratch_dataset):
    """Device-resident stream mode: exact stream replay via index batches;
    full workspace contract."""
    from rawaudiovae_kelsey_tpu.train.stream import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.total_num_frames = 32 * 20
    cfg.training.checkpoint_interval = 8
    ctx = train(cfg, verbose=False)
    ws = ctx.workspace
    txt = ws.console_log_path.read_text()
    assert "Device-resident stream" in txt
    # the whole-loop e2e summary (benchmarks/erokia_run.py parses this
    # exact shape for the production-run report)
    assert re.search(r"Resident stream e2e: 20 batches in [\d.]+s = "
                     r"[\d,]+ frames/s", txt), txt[-500:]
    recs = [r.name for r in sorted(ws.audio_log_dir.glob("test_reconst_*.wav"))]
    assert "test_reconst_00008.wav" in recs
    assert "test_reconst_00020.wav" in recs
    assert (ws.checkpoint_dir / "ckpt_00020.npz").exists()
    assert (ws.model_dir / "last_model.npz").exists()


def test_resident_stream_best_gate_uses_real_losses(scratch_dataset):
    """Review regression: the resident stream's best-model gate must see the
    drained window losses (it previously compared empty 0.0 windows and froze
    best_model at the first checkpoint)."""
    import json

    from rawaudiovae_kelsey_tpu.train.stream import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.total_num_frames = 32 * 24
    cfg.training.checkpoint_interval = 8
    ctx = train(cfg, verbose=False)
    assert np.isfinite(ctx.best_loss) and ctx.best_loss > 0.0
    metas = sorted(ctx.workspace.checkpoint_dir.glob("ckpt_*.json"))
    best_losses = [json.loads(m.read_text()).get("best_loss") for m in metas]
    assert all(b is None or b > 0.0 for b in best_losses), best_losses
    # TB got the per-batch loss history (drain happened)
    import glob

    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    (f,) = glob.glob(str(ctx.workspace.log_dir / "events.out.tfevents.*"))
    n_loss = sum(
        1 for e in tb.LegacyEventFileLoader(f).Load()
        for v in e.summary.value if v.tag == "Loss/Batch"
    )
    assert n_loss == 24


def test_resident_stream_always_over_budget_raises(scratch_dataset):
    from rawaudiovae_kelsey_tpu.train.stream import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.tpu.resident_budget_gb = 1e-9  # nothing fits
    cfg.training.total_num_frames = 32 * 4
    with pytest.raises(ValueError, match="device_resident=always"):
        train(cfg, verbose=False)


def _loss_batch_history(ctx):
    import glob

    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    (f,) = glob.glob(str(ctx.workspace.log_dir / "events.out.tfevents.*"))
    hist = {}
    for e in tb.LegacyEventFileLoader(f).Load():
        for v in e.summary.value:
            if v.tag == "Loss/Batch":
                hist[e.step] = v.simple_value
    return [hist[k] for k in sorted(hist)]


def test_stream_resident_mesh_matches_host_fed(scratch_dataset):
    """Resident streaming under the 8-device mesh (frames replicated, index
    batches sharded over the data axis) must reproduce the host-fed mesh
    stream: same stream order, same fold_in(rng, step) keys → same per-batch
    losses up to fp32 reduction order."""
    from rawaudiovae_kelsey_tpu.train.stream import train

    runs = {}
    for mode in ("always", "never"):
        cfg = small_cfg(scratch_dataset)
        cfg.tpu.device_resident = mode
        cfg.training.total_num_frames = 32 * 12
        cfg.training.checkpoint_interval = 6
        ctx = train(cfg, verbose=False)
        assert ctx.mesh is not None  # really ran on the 8-device mesh
        runs[mode] = _loss_batch_history(ctx)
    assert len(runs["always"]) == len(runs["never"]) == 12
    np.testing.assert_allclose(runs["always"], runs["never"],
                               rtol=1e-4, atol=1e-6)


def test_stream_resident_mesh_indivisible_batch(scratch_dataset):
    """A batch size that doesn't divide the mesh's data axis stays
    data-parallel: the index batch is padded to the axis multiple and the
    pad rows are zero-weighted (make_weighted_loss_fn), so the per-batch
    losses match the host-fed unpadded run exactly (up to reduction
    order)."""
    from rawaudiovae_kelsey_tpu.train import loop as L
    from rawaudiovae_kelsey_tpu.train import stream

    runs = {}
    for use_mesh in (True, False):
        cfg = small_cfg(scratch_dataset)
        cfg.tpu.device_resident = "always"
        cfg.training.batch_size = 36  # 36 % 8 != 0 → 4 pad rows
        cfg.training.total_num_frames = 36 * 6
        cfg.training.checkpoint_interval = 0
        ctx = L.setup(cfg, use_mesh=use_mesh)
        try:
            ctx = stream._run(ctx, cfg, verbose=False)
        finally:
            L.finish(ctx)
        assert (ctx.mesh is not None) == use_mesh
        runs[use_mesh] = _loss_batch_history(ctx)
        assert (ctx.workspace.model_dir / "last_model.npz").exists()
    assert len(runs[True]) == len(runs[False]) == 6
    assert np.isfinite(runs[True]).all()
    np.testing.assert_allclose(runs[True], runs[False],
                               rtol=1e-4, atol=1e-6)


def test_epoch_trainer_mesh_sharded_resident(scratch_dataset):
    """Auto mode on the 8-device mesh takes the sharded-resident path: whole
    epochs on the mesh, complete workspace contract."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.training.epochs = 3
    cfg.training.checkpoint_interval = 2
    # auto-resident on the mesh (corpus tiny; batch 32 divides 8 devices)
    ctx = train(cfg, verbose=True)
    assert ctx.mesh is not None
    assert (ctx.workspace.model_dir / "last_model.npz").exists()
    assert list(ctx.workspace.audio_log_dir.glob("test_reconst_*.wav"))


def test_epoch_trainer_host_fed_mesh_path(scratch_dataset):
    """device_resident=never keeps the host-fed prefetcher path (with mesh
    batch padding) exercised."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "never"
    cfg.training.epochs = 2
    cfg.training.checkpoint_interval = 0
    ctx = train(cfg, verbose=False)
    assert ctx.mesh is not None  # really ran under the 8-device mesh
    assert (ctx.workspace.model_dir / "last_model.npz").exists()


def test_epoch_trainer_orbax_async_and_resume(scratch_dataset):
    """checkpoint_format=orbax through the full epoch trainer with the
    default async_checkpoint: every periodic checkpoint must be committed
    by the time train() returns (finish() waits for in-flight orbax saves),
    and a resumed run picks up from the newest one."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.tpu.checkpoint_format = "orbax"
    cfg.training.epochs = 4
    cfg.training.checkpoint_interval = 2
    cfg.extra.description = "orbax_e2e"
    ctx = train(cfg, verbose=False)
    names = sorted(p.name for p in ctx.workspace.checkpoint_dir.iterdir()
                   if p.is_dir())
    assert "orbax_00002" in names and "orbax_00004" in names
    # no uncommitted tmp dirs left behind
    assert not [n for n in names if "tmp" in n]
    end_step = int(jax.device_get(ctx.state.step))

    cfg2 = small_cfg(scratch_dataset)
    cfg2.tpu.device_resident = "always"
    cfg2.tpu.checkpoint_format = "orbax"
    cfg2.training.epochs = 6
    cfg2.training.checkpoint_interval = 2
    cfg2.training.resume = True
    cfg2.extra.description = "orbax_e2e"
    ctx2 = train(cfg2, verbose=False)
    assert int(jax.device_get(ctx2.state.step)) > end_step


def test_keep_checkpoints_e2e(scratch_dataset):
    """[training] keep_checkpoints=1 through the full epoch trainer: only
    the newest periodic checkpoint survives, best/last are untouched, and
    a resume still works from the survivor."""
    import jax

    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.training.epochs = 5
    cfg.training.checkpoint_interval = 2
    cfg.training.keep_checkpoints = 1
    cfg.extra.description = "keep1"
    ctx = train(cfg, verbose=False)
    names = sorted(p.name for p in ctx.workspace.checkpoint_dir.iterdir())
    assert names == ["ckpt_00005.json", "ckpt_00005.npz"]
    assert (ctx.workspace.model_dir / "best_model.npz").exists()
    assert (ctx.workspace.model_dir / "last_model.npz").exists()
    end_step = int(jax.device_get(ctx.state.step))

    cfg2 = small_cfg(scratch_dataset)
    cfg2.tpu.device_resident = "always"
    cfg2.training.epochs = 7
    cfg2.training.checkpoint_interval = 2
    cfg2.training.keep_checkpoints = 1
    cfg2.training.resume = True
    cfg2.extra.description = "keep1"
    ctx2 = train(cfg2, verbose=False)
    assert int(jax.device_get(ctx2.state.step)) > end_step


def test_orbax_async_with_retention(scratch_dataset):
    """Review regression (confirmed crash): orbax + async_checkpoint +
    keep_checkpoints — retention prunes a committed orbax dir whose meta
    sidecar is still pending; the deferred-meta drain must drop it instead
    of writing into the deleted path (FileNotFoundError out of finish())."""
    pytest.importorskip("orbax.checkpoint")

    from rawaudiovae_kelsey_tpu.train.epoch import train

    cfg = small_cfg(scratch_dataset)
    cfg.tpu.device_resident = "always"
    cfg.tpu.checkpoint_format = "orbax"
    cfg.training.epochs = 7
    cfg.training.checkpoint_interval = 2
    cfg.training.keep_checkpoints = 1
    cfg.extra.description = "orbax_keep"
    ctx = train(cfg, verbose=False)  # must not raise at finish()
    names = sorted(p.name for p in ctx.workspace.checkpoint_dir.iterdir()
                   if p.is_dir())
    assert names == ["orbax_00007"]
    # the survivor has its sidecar (drained before or at the final wait)
    import json
    meta = json.loads(
        (ctx.workspace.checkpoint_dir / "orbax_00007" / "meta.json")
        .read_text())
    assert meta["epoch"] == 7


def test_stream_resident_samples_layout_matches_frames(scratch_dataset):
    """resident_layout=samples (hop-padded sample array + strided
    dynamic-slice gather) must reproduce the frames-layout run exactly:
    same stream order, same windows, same fold_in keys -> identical
    Loss/Batch sequences.  The samples layout is the default (auto) on the
    single-device path when windows overlap -- hop < segment here, so the
    'auto' run below IS the samples path (asserted via the console line)."""
    import contextlib
    import io as _io

    from rawaudiovae_kelsey_tpu.train import loop as L
    from rawaudiovae_kelsey_tpu.train import stream

    runs = {}
    for layout in ("samples", "frames"):
        cfg = small_cfg(scratch_dataset)
        cfg.tpu.device_resident = "always"
        cfg.tpu.resident_layout = layout
        cfg.training.total_num_frames = 32 * 10
        cfg.training.checkpoint_interval = 5
        # use_mesh=False: pin the plain single-device branch specifically
        # (the replicated-mesh branch also takes the samples layout under
        # auto and is exercised by test_stream_resident_mesh_matches_host_fed)
        buf = _io.StringIO()
        ctx = L.setup(cfg, use_mesh=False)
        try:
            with contextlib.redirect_stdout(buf):
                ctx = stream._run(ctx, cfg, verbose=False)
        finally:
            L.finish(ctx)
        txt = buf.getvalue()
        if layout == "samples":
            assert "samples layout" in txt, txt[-400:]
        else:
            assert "samples layout" not in txt
        runs[layout] = _loss_batch_history(ctx)
    assert len(runs["samples"]) == len(runs["frames"]) == 10
    np.testing.assert_array_equal(runs["samples"], runs["frames"])
