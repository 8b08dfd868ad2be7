"""Checkpoint round-trip, latest-discovery, params-only snapshots, and the
torn-write guard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.config import Config  # noqa: F401
from rawaudiovae_kelsey_tpu.models import build_model
from rawaudiovae_kelsey_tpu.parallel import build_train_step
from rawaudiovae_kelsey_tpu.train import (
    TrainState,
    build_optimizer,
    latest_checkpoint,
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)


@pytest.fixture
def cfg():
    c = Config()
    c.audio.segment_length = 128
    c.audio.hop_length = 32
    c.vae.n_units = 64
    c.vae.latent_dim = 16
    c.training.learning_rate = 1e-3
    return c


def _mk(cfg, seed=0):
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    return model, opt, TrainState.create(params, opt.init(params), seed=seed)


def test_roundtrip_bitexact(cfg, tmp_path):
    model, opt, state = _mk(cfg)
    step = build_train_step(model, cfg, opt)
    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(-1, 1, (16, 128)).astype(np.float32))
    for _ in range(3):
        state, _ = step(state, batch)
    path = save_checkpoint(tmp_path, state, {"epoch": 3, "best_loss": 0.5})

    _, _, template = _mk(cfg, seed=99)  # different values, same structure
    restored, meta = restore_checkpoint(path, template)
    assert meta["epoch"] == 3 and meta["best_loss"] == 0.5
    assert int(jax.device_get(restored.step)) == 3
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state)),
                    jax.tree_util.tree_leaves(jax.device_get(restored))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(cfg, tmp_path):
    """Train 6 steps straight vs train 3 + checkpoint + restore + 3: identical
    final params (RNG is fold_in(step)-keyed, so resume is seamless)."""
    model, opt, s_straight = _mk(cfg, seed=1)
    step = build_train_step(model, cfg, opt, donate=False)
    batch = jnp.asarray(np.random.default_rng(1)
                        .uniform(-1, 1, (16, 128)).astype(np.float32))
    for _ in range(6):
        s_straight, _ = step(s_straight, batch)

    _, _, s = _mk(cfg, seed=1)
    for _ in range(3):
        s, _ = step(s, batch)
    p = save_checkpoint(tmp_path, s, {})
    _, _, template = _mk(cfg, seed=1)
    s2, _ = restore_checkpoint(p, template)
    for _ in range(3):
        s2, _ = step(s2, batch)

    np.testing.assert_array_equal(
        np.asarray(jax.device_get(s_straight.params["fc1"]["w"])),
        np.asarray(jax.device_get(s2.params["fc1"]["w"])),
    )


def test_latest_checkpoint_discovery(cfg, tmp_path):
    assert latest_checkpoint(tmp_path) is None
    model, opt, state = _mk(cfg)
    save_checkpoint(tmp_path, state)
    state = TrainState(state.params, state.opt_state, state.rng,
                       jnp.asarray(90, jnp.int32))
    p90 = save_checkpoint(tmp_path, state)
    state = TrainState(state.params, state.opt_state, state.rng,
                       jnp.asarray(7, jnp.int32))
    save_checkpoint(tmp_path, state)
    assert latest_checkpoint(tmp_path) == p90
    # stray files don't confuse discovery
    (tmp_path / "notes.txt").write_text("x")
    assert latest_checkpoint(tmp_path) == p90


def test_params_only_snapshot(cfg, tmp_path):
    model, opt, state = _mk(cfg, seed=5)
    p = save_params(tmp_path / "best_model.npz", state.params)
    template = build_model(cfg).init(jax.random.PRNGKey(0))
    loaded = load_params(p, template)
    np.testing.assert_array_equal(
        np.asarray(loaded["fc4"]["b"]),
        np.asarray(jax.device_get(state.params["fc4"]["b"])),
    )


def test_shape_mismatch_rejected(cfg, tmp_path):
    model, opt, state = _mk(cfg)
    p = save_checkpoint(tmp_path, state)
    cfg2 = Config()
    cfg2.audio.segment_length = 256
    cfg2.audio.hop_length = 32
    cfg2.vae.n_units = 64
    cfg2.vae.latent_dim = 16
    _, _, wrong_template = _mk(cfg2)
    with pytest.raises(ValueError, match="shape"):
        restore_checkpoint(p, wrong_template)


def test_no_torn_checkpoint(cfg, tmp_path):
    """Writes go through a tmp file + atomic rename; a *.npz.tmp must never
    be picked up as a checkpoint."""
    model, opt, state = _mk(cfg)
    save_checkpoint(tmp_path, state)
    (tmp_path / "ckpt_99999.npz.tmp").write_bytes(b"torn")
    latest = latest_checkpoint(tmp_path)
    assert latest is not None and latest.name == "ckpt_00000.npz"


def test_orbax_roundtrip(cfg, tmp_path):
    """Optional orbax backend ([tpu] checkpoint_format = orbax)."""
    pytest.importorskip("orbax.checkpoint")
    from rawaudiovae_kelsey_tpu.train.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    model, opt, state = _mk(cfg, seed=3)
    path = save_checkpoint_orbax(tmp_path, state)
    _, _, template = _mk(cfg, seed=77)
    restored = restore_checkpoint_orbax(path, template)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored.params["fc1"]["w"])),
        np.asarray(jax.device_get(state.params["fc1"]["w"])),
    )
    assert int(jax.device_get(restored.step)) == 0


def test_corrupted_checkpoint_rejected(cfg, tmp_path):
    """A truncated/garbage npz raises a clean error, not a crash."""
    model, opt, state = _mk(cfg)
    p = save_checkpoint(tmp_path, state)
    p.write_bytes(p.read_bytes()[: p.stat().st_size // 3])
    _, _, template = _mk(cfg)
    with pytest.raises(Exception) as exc:
        restore_checkpoint(p, template)
    assert not isinstance(exc.value, (SystemExit, KeyboardInterrupt))


def test_missing_meta_sidecar_ok(cfg, tmp_path):
    """The json sidecar is optional (meta defaults to {})."""
    model, opt, state = _mk(cfg)
    p = save_checkpoint(tmp_path, state, {"epoch": 1})
    p.with_suffix(".json").unlink()
    _, _, template = _mk(cfg)
    restored, meta = restore_checkpoint(p, template)
    assert meta == {}
    assert int(jax.device_get(restored.step)) == 0


def test_orbax_driver_roundtrip(cfg, tmp_path):
    """checkpoint_format=orbax flows through the ACTUAL driver dispatch
    (save_periodic_checkpoint) then latest/restore."""
    pytest.importorskip("orbax.checkpoint")
    from types import SimpleNamespace

    from rawaudiovae_kelsey_tpu.config.workspace import Workspace
    from rawaudiovae_kelsey_tpu.train.loop import save_periodic_checkpoint

    cfg.tpu.checkpoint_format = "orbax"
    model, opt, state = _mk(cfg, seed=8)
    ws = Workspace(tmp_path)
    ctx = SimpleNamespace(cfg=cfg, state=state, workspace=ws, best_loss=0.25)
    p = save_periodic_checkpoint(ctx, {"epoch": 4}, label=4)
    # async_checkpoint (default): the dir commits at the next wait point —
    # latest_checkpoint is one, so the scan below must both wait and find it
    assert latest_checkpoint(ws.checkpoint_dir) == p
    assert p.is_dir() and p.name == "orbax_00004"
    _, _, template = _mk(cfg, seed=1)
    restored, meta = restore_checkpoint(p, template)
    assert meta["epoch"] == 4 and meta["best_loss"] == 0.25
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored.params["fc1"]["w"])),
        np.asarray(jax.device_get(state.params["fc1"]["w"])),
    )
    # torn meta.json doesn't brick resume
    (p / "meta.json").write_text("{tor")
    _, meta2 = restore_checkpoint(p, _mk(cfg, seed=2)[2])
    assert meta2 == {}


def test_load_params_shape_mismatch_rejected(cfg, tmp_path):
    """Review regression: a wrong-architecture best/last npz must fail at
    load with a clear message, not deep inside the first encode."""
    model, opt, state = _mk(cfg)
    p = save_params(tmp_path / "best_model.npz", state.params)
    cfg2 = Config()
    cfg2.audio.segment_length = 256  # different arch, same leaf count
    cfg2.vae.n_units = 64
    cfg2.vae.latent_dim = 16
    wrong_template = build_model(cfg2).init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape"):
        load_params(p, wrong_template)


def test_save_params_atomic(cfg, tmp_path):
    """Review regression: best/last model writes go through tmp+rename so a
    concurrent reader or crash never sees a torn file."""
    model, opt, state = _mk(cfg)
    path = tmp_path / "best_model.npz"
    save_params(path, state.params)
    before = path.read_bytes()
    save_params(path, state.params)  # overwrite in place
    assert path.read_bytes() == before
    assert not list(tmp_path.glob("*.tmp"))  # no tmp residue


def test_restore_preserves_template_mesh_sharding(cfg, tmp_path):
    """Review regression: restore must re-place mesh-sharded leaves in the
    template's layout (raw numpy would drop model-parallel shardings), while
    single-device scalars stay uncommitted (committing them to one device
    conflicts with mesh leaves inside jit)."""
    from rawaudiovae_kelsey_tpu.parallel import (
        make_mesh,
        named_shardings,
        param_specs,
    )

    model, opt, state = _mk(cfg)
    p = save_checkpoint(tmp_path, state)

    mesh = make_mesh(data_parallel=4, model_parallel=2)
    params = build_model(cfg).init(jax.random.PRNGKey(0))
    specs = param_specs(model.name, params, 2)
    params = jax.device_put(params, named_shardings(mesh, specs))
    template = TrainState.create(params, opt.init(params), seed=0)
    restored, _ = restore_checkpoint(p, template)
    got = restored.params["fc1"]["w"]
    assert isinstance(got, jax.Array)
    assert got.sharding == params["fc1"]["w"].sharding
    # values intact through the re-placement
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(got)),
        np.asarray(jax.device_get(state.params["fc1"]["w"])),
    )


def test_orbax_async_save_commits_on_wait(cfg, tmp_path):
    """wait=False returns immediately after the device→host copy; the dir
    and its meta sidecar are committed by wait_for_orbax() (called by
    restore/latest/finish) — and the state may be mutated/donated after
    save() returns without corrupting the write."""
    pytest.importorskip("orbax.checkpoint")
    from rawaudiovae_kelsey_tpu.train import checkpoint as C

    model, opt, state = _mk(cfg, seed=11)
    want = np.asarray(jax.device_get(state.params["fc1"]["w"])).copy()
    p1 = C.save_checkpoint_orbax(tmp_path, state, {"epoch": 1}, label=1,
                                 wait=False)
    # mutate the live state AFTER the async save started: the snapshot
    # orbax copied must be unaffected
    import dataclasses
    state = dataclasses.replace(state, params=jax.tree_util.tree_map(
        lambda x: x * 0, state.params))
    p2 = C.save_checkpoint_orbax(tmp_path, state, {"epoch": 2}, label=2,
                                 wait=False)
    C.wait_for_orbax()
    assert p1.is_dir() and p2.is_dir()
    import json
    assert json.loads((p1 / "meta.json").read_text())["epoch"] == 1
    assert json.loads((p2 / "meta.json").read_text())["epoch"] == 2
    _, _, template = _mk(cfg, seed=99)
    r1, meta1 = restore_checkpoint(p1, template)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(r1.params["fc1"]["w"])), want)
    r2, _ = restore_checkpoint(p2, template)
    assert float(np.abs(np.asarray(
        jax.device_get(r2.params["fc1"]["w"]))).max()) == 0.0


def test_prune_checkpoints_retention(cfg, tmp_path):
    """[training] keep_checkpoints: oldest periodic checkpoints (npz AND
    committed orbax dirs, one budget) are removed with their sidecars;
    in-flight orbax tmp dirs and non-checkpoint files are untouched."""
    from rawaudiovae_kelsey_tpu.train.checkpoint import prune_checkpoints

    model, opt, state = _mk(cfg)
    for lab in (1, 2, 3):
        save_checkpoint(tmp_path, state, {"epoch": lab}, label=lab)
    orbax_dir = tmp_path / "orbax_00004"
    orbax_dir.mkdir()
    (orbax_dir / "x").write_text("committed")
    tmp_dir = tmp_path / "orbax_00000.orbax-checkpoint-tmp-99"
    tmp_dir.mkdir()
    keepme = tmp_path / "notes.txt"
    keepme.write_text("hi")

    assert prune_checkpoints(tmp_path, 0) == []  # 0 = keep all
    removed = prune_checkpoints(tmp_path, 2)
    names = sorted(p.name for p in removed)
    assert names == ["ckpt_00001.npz", "ckpt_00002.npz"]
    assert not (tmp_path / "ckpt_00001.json").exists()  # sidecar gone too
    assert (tmp_path / "ckpt_00003.npz").exists()
    assert (tmp_path / "ckpt_00003.json").exists()
    assert orbax_dir.exists() and tmp_dir.exists() and keepme.exists()

