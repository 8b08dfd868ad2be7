"""Real multi-process (DCN-style) smoke test: two local processes join via
jax.distributed, build a global mesh, assemble a global batch from
process-local rows, and run one data-parallel train step with an actual
cross-process gradient all-reduce."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.models import build_model
from rawaudiovae_kelsey_tpu.parallel import build_train_step, make_mesh
from rawaudiovae_kelsey_tpu.parallel.mesh import (
    global_batch_from_local,
    host_shard_info,
    is_coordinator,
)
from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

host_id, num_hosts = host_shard_info()
assert (host_id, num_hosts) == (proc_id, 2)

cfg = Config()
cfg.audio.segment_length = 128
cfg.audio.hop_length = 32
cfg.vae.n_units = 64
cfg.vae.latent_dim = 16
cfg.training.learning_rate = 1e-3

mesh = make_mesh()  # 2 global devices (1 per process) on the data axis
model = build_model(cfg)
opt = build_optimizer(cfg)
params = model.init(jax.random.PRNGKey(0))
state = TrainState.create(params, opt.init(params), seed=0)
step = build_train_step(model, cfg, opt, mesh=mesh, donate=False)

# each process contributes its own half of the global batch
local = np.full((8, 128), 0.1 * (proc_id + 1), np.float32)
batch = global_batch_from_local(mesh, local)
assert batch.shape == (16, 128)

state, metrics = step(state, batch)
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss)
print(f"proc{proc_id} coordinator={is_coordinator()} loss={loss:.6f}")
"""


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    import socket

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as sk:  # ephemeral port: avoids cross-run clashes
        sk.bind(("127.0.0.1", 0))
        port = str(sk.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)  # single device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    # both processes computed the SAME global loss (the psum crossed the
    # process boundary)
    losses = sorted(
        line.split("loss=")[1]
        for out in outs for line in out.splitlines() if "loss=" in line
    )
    assert len(losses) == 2 and losses[0] == losses[1], outs
    assert any("coordinator=True" in o for o in outs)
    assert any("coordinator=False" in o for o in outs)


DRIVER_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
port = sys.argv[2]
datapath = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)

import numpy as np

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.train.epoch import train

cfg = Config()
cfg.dataset.datapath = datapath
cfg.dataset.generate_test = False
cfg.audio.segment_length = 256
cfg.audio.hop_length = 64
cfg.vae.n_units = 64
cfg.vae.latent_dim = 16
cfg.training.batch_size = 16
cfg.training.epochs = 2
cfg.training.checkpoint_interval = 0
cfg.extra.description = f"mh_epoch"
cfg.tpu.device_resident = "never"   # exercise the host-fed multihost feed
ctx = train(cfg, verbose=False)
loss = float(ctx.best_loss) if np.isfinite(ctx.best_loss) else -1.0
print(f"proc{proc_id} done mesh={ctx.mesh is not None} "
      f"procs={jax.process_count()}")
"""


@pytest.mark.slow
def test_two_process_epoch_driver(tmp_path):
    """The REAL epoch driver across 2 processes: per-host file sharding,
    global batches assembled from process-local rows, aligned batch counts,
    coordinator-only checkpoint writes."""
    import socket

    import numpy as np

    from rawaudiovae_kelsey_tpu.io import write_wav

    (tmp_path / "audio").mkdir()
    rng = np.random.default_rng(0)
    # 4 files of different sizes → hosts get different corpora
    for i, n in enumerate([9000, 12000, 7000, 15000]):
        write_wav(tmp_path / "audio" / f"t{i}.wav",
                  rng.uniform(-0.5, 0.5, n).astype(np.float32), 44100)

    worker = tmp_path / "worker.py"
    worker.write_text(DRIVER_WORKER)
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = str(sk.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("done mesh=True procs=2" in o for o in outs), outs
    # coordinated workspace: exactly ONE run dir shared by both processes,
    # and the coordinator wrote the model artifacts into it
    runs = sorted((tmp_path / "mh_epoch").glob("run-*"))
    assert len(runs) == 1, (runs, outs)
    ckpts = list((runs[0] / "model").rglob("*.npz"))
    assert ckpts, outs


STREAM_RESIDENT_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
port = sys.argv[2]
datapath = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)

import glob
import numpy as np

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.train.stream import train


def run(mode, desc):
    cfg = Config()
    cfg.dataset.datapath = datapath
    cfg.dataset.generate_test = False
    cfg.audio.segment_length = 256
    cfg.audio.hop_length = 64
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = 16
    cfg.training.batch_size = 16
    cfg.training.total_num_frames = 16 * 8
    cfg.training.checkpoint_interval = 0
    cfg.extra.description = desc
    cfg.tpu.device_resident = mode
    return train(cfg, verbose=False)


def losses(ctx):
    from tensorboard.backend.event_processing import event_file_loader

    hist = {}
    for f in glob.glob(str(ctx.workspace.log_dir / "events.out.tfevents.*")):
        for e in event_file_loader.LegacyEventFileLoader(f).Load():
            for v in e.summary.value:
                if v.tag == "Loss/Batch":
                    hist[e.step] = v.simple_value
    return [hist[k] for k in sorted(hist)]


ctx_r = run("always", "mh_res")
print(f"proc{proc_id} resident mesh={ctx_r.mesh is not None} "
      f"procs={jax.process_count()}")
ctx_h = run("never", "mh_host")
if jax.process_index() == 0:
    lr, lh = losses(ctx_r), losses(ctx_h)
    assert len(lr) == len(lh) == 8, (len(lr), len(lh))
    np.testing.assert_allclose(lr, lh, rtol=1e-4, atol=1e-6)
    print(f"LOSSES_MATCH n={len(lr)}")
"""


@pytest.mark.slow
def test_two_process_resident_stream_matches_host_fed(tmp_path):
    """VERDICT r1 item 3: the device-resident stream path across 2 processes
    (per-host frame shards stitched with make_array_from_process_local_data)
    reproduces the host-fed multi-host loss sequence exactly."""
    import socket

    import numpy as np

    from rawaudiovae_kelsey_tpu.io import write_wav

    (tmp_path / "audio").mkdir()
    rng = np.random.default_rng(1)
    # uneven per-host corpora → exercises the cross-host frame padding
    for i, n in enumerate([9000, 13000, 6000, 17000]):
        write_wav(tmp_path / "audio" / f"t{i}.wav",
                  rng.uniform(-0.5, 0.5, n).astype(np.float32), 44100)

    worker = tmp_path / "worker.py"
    worker.write_text(STREAM_RESIDENT_WORKER)
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = str(sk.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("resident mesh=True procs=2" in o for o in outs), outs
    assert any("LOSSES_MATCH n=8" in o for o in outs), outs


def test_data_axis_process_contiguity_detection():
    """The resident-stream gate must detect whether each process's devices
    tile one contiguous data-axis block (ADVICE r2: jax.make_mesh may
    topology-reorder devices on real pods).  Exercised on stub meshes so
    the non-contiguous branch — unreachable with real local devices — is
    pinned too."""
    import numpy as np

    from rawaudiovae_kelsey_tpu.parallel.mesh import (
        data_axis_process_contiguous,
    )

    class Dev:
        def __init__(self, proc):
            self.process_index = proc

    class StubMesh:
        axis_names = ("data", "model")

        def __init__(self, procs):
            self.devices = np.array(
                [[Dev(p)] for p in procs], dtype=object)

    # process blocks in order: contiguous
    assert data_axis_process_contiguous(StubMesh([0, 0, 1, 1]))
    # reversed blocks still contiguous per process
    assert data_axis_process_contiguous(StubMesh([1, 1, 0, 0]))
    # interleaved: each process's rows are scattered -> NOT contiguous
    assert not data_axis_process_contiguous(StubMesh([0, 1, 0, 1]))
    # single process always contiguous
    assert data_axis_process_contiguous(StubMesh([0, 0, 0, 0]))
    # model-axis replicas of the same block don't break contiguity
    class StubMesh2D:
        axis_names = ("data", "model")

        def __init__(self):
            self.devices = np.array(
                [[Dev(0), Dev(0)], [Dev(1), Dev(1)]], dtype=object)

    assert data_axis_process_contiguous(StubMesh2D())


EPOCH_RESIDENT_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
port = sys.argv[2]
datapath = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)

import glob
import numpy as np
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.train.epoch import train

# unit invariant first: stitching per-host blocks must preserve content.
# Each host contributes a DIFFERENT row count; align wrap-pads to the max.
from jax.experimental import multihost_utils
from rawaudiovae_kelsey_tpu.parallel.mesh import make_mesh
from rawaudiovae_kelsey_tpu.parallel.resident import (
    align_local_rows,
    put_frames_sharded,
)

mesh = make_mesh()
cfgq = Config()
cfgq.tpu.precision = "float32"
rows = 5 if proc_id == 0 else 3
local = (np.arange(rows * 8, dtype=np.float32)
         .reshape(rows, 8) + 100.0 * proc_id)
aligned = align_local_rows(local, mesh)
gathered = multihost_utils.process_allgather(aligned)  # (2, L, 8)
dev = put_frames_sharded(aligned, cfgq, mesh)
assert dev.shape == (aligned.shape[0] * 2, 8), dev.shape
ssq = jax.jit(lambda a: jnp.sum(a * a), out_shardings=None)(dev)
want = float((gathered.astype(np.float64) ** 2).sum())
got = float(jax.device_get(ssq))
assert abs(got - want) / want < 1e-6, (got, want)
print(f"proc{proc_id} STITCH_OK L={aligned.shape[0]}")

cfg = Config()
cfg.dataset.datapath = datapath
cfg.dataset.generate_test = False
cfg.audio.segment_length = 256
cfg.audio.hop_length = 64
cfg.vae.n_units = 64
cfg.vae.latent_dim = 16
cfg.training.batch_size = 16
cfg.training.epochs = 3
cfg.training.checkpoint_interval = 2
cfg.extra.description = "mh_res_epoch"
cfg.tpu.device_resident = "always"
cfg.tpu.multihost = True
ctx = train(cfg, verbose=False)
print(f"proc{proc_id} resident mesh={ctx.mesh is not None} "
      f"procs={jax.process_count()} step={int(jax.device_get(ctx.state.step))}")


def losses(ctx):
    # read ONLY this process's own event file (ctx.writer.path): both
    # workers share log_dir, and merging every file would make the two
    # hosts compare identical merges — a vacuous check that would pass
    # even if their loss sequences diverged
    from tensorboard.backend.event_processing import event_file_loader

    hist = {}
    for e in event_file_loader.LegacyEventFileLoader(
            str(ctx.writer.path)).Load():
        for v in e.summary.value:
            if v.tag == "Loss/Batch":
                hist[e.step] = v.simple_value
    return [hist[k] for k in sorted(hist)]


seq = np.asarray(losses(ctx))
assert np.isfinite(seq).all() and len(seq) > 0, seq
other = multihost_utils.process_allgather(seq)
assert other.shape[0] == 2 and other.shape[1] == len(seq), other.shape
np.testing.assert_array_equal(other[0], other[1])
print(f"proc{proc_id} EPOCH_LOSSES_REPLICATED n={len(seq)}")
"""


@pytest.mark.slow
def test_two_process_resident_epochs(tmp_path):
    """DCN-spanning resident EPOCHS (round 3): per-host file-shard frames
    wrap-pad-aligned and stitched into one sharded frame matrix, whole
    epoch groups on-chip across both processes with the two-pass global
    shuffle, loss sequence bit-identical on every host."""
    import socket

    import numpy as np

    from rawaudiovae_kelsey_tpu.io import write_wav

    (tmp_path / "audio").mkdir()
    rng = np.random.default_rng(7)
    # uneven per-host corpora -> exercises align_local_rows wrap-padding
    for i, n in enumerate([11000, 7000, 15000, 5000]):
        write_wav(tmp_path / "audio" / f"t{i}.wav",
                  rng.uniform(-0.5, 0.5, n).astype(np.float32), 44100)

    worker = tmp_path / "worker.py"
    worker.write_text(EPOCH_RESIDENT_WORKER)
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = str(sk.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("STITCH_OK" in o for o in outs), outs
    assert all("resident mesh=True procs=2" in o for o in outs), outs
    assert all("EPOCH_LOSSES_REPLICATED" in o for o in outs), outs


ORBAX_ASYNC_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
port = sys.argv[2]
datapath = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)

import json
import numpy as np

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.train.epoch import train

cfg = Config()
cfg.dataset.datapath = datapath
cfg.dataset.generate_test = False
cfg.audio.segment_length = 256
cfg.audio.hop_length = 64
cfg.vae.n_units = 64
cfg.vae.latent_dim = 16
cfg.training.batch_size = 16
cfg.training.epochs = 5
cfg.training.checkpoint_interval = 2
cfg.training.keep_checkpoints = 2
cfg.extra.description = "mh_orbax"
cfg.tpu.device_resident = "never"
cfg.tpu.checkpoint_format = "orbax"   # async saves via the persistent ckptr
ctx = train(cfg, verbose=False)
names = sorted(p.name for p in ctx.workspace.checkpoint_dir.iterdir()
               if p.is_dir())
assert not [n for n in names if "tmp" in n], names  # everything committed
if jax.process_index() == 0:
    # retention runs on the coordinator at finish; a peer may scan the
    # shared dir before the coordinator's prune lands, so only proc 0
    # asserts the final census
    assert names == ["orbax_00004", "orbax_00005"], names
    meta = json.loads(
        (ctx.workspace.checkpoint_dir / "orbax_00005" / "meta.json")
        .read_text())
    assert meta["epoch"] == 5, meta
print(f"proc{proc_id} orbax_ok procs={jax.process_count()}")
"""


@pytest.mark.slow
def test_two_process_orbax_async_checkpoints(tmp_path):
    """Async orbax across 2 processes: the persistent AsyncCheckpointer's
    cross-process commit protocol runs behind the training loop, finish()
    waits for the in-flight save on both hosts, deferred meta sidecars land
    in the committed dirs, and retention prunes after the final wait."""
    import socket

    import numpy as np

    from rawaudiovae_kelsey_tpu.io import write_wav

    pytest.importorskip("orbax.checkpoint")
    (tmp_path / "audio").mkdir()
    rng = np.random.default_rng(1)
    for i, n in enumerate([9000, 12000, 7000, 15000]):
        write_wav(tmp_path / "audio" / f"t{i}.wav",
                  rng.uniform(-0.5, 0.5, n).astype(np.float32), 44100)

    worker = tmp_path / "worker.py"
    worker.write_text(ORBAX_ASYNC_WORKER)
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = str(sk.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("orbax_ok procs=2" in o for o in outs), outs
