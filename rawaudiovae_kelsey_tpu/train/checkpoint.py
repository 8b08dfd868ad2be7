"""Checkpoint / resume.

Reference behavior (train.py:206-250, train_iterable.py:220-264): every
``checkpoint_interval`` a dict ``{'epoch'|'batch_id', 'state_dict',
'optimizer'}`` was ``torch.save``-d to ``model/checkpoints/ckpt_{step:05d}``,
plus whole-module pickles ``best_model.pt`` / ``last_model.pt``.  Checkpoints
were **never loaded back** by any training path — resume did not exist
(SURVEY.md §5.3).  Here:

  * ``ckpt_{step:05d}.npz`` carries the full train state (params + Adam
    moments + RNG + step) as flat npz leaves — self-contained, fast, no
    pickle;
  * ``best_model.npz`` / ``last_model.npz`` carry params only (the analogs of
    the reference's module pickles);
  * :func:`restore` / :func:`latest_checkpoint` implement real resume with a
    true best-loss gate (the reference's ``train_loss_prev`` was initialized
    to 1e6 and never reassigned — quirk #7, fixed in the drivers);
  * an optional Orbax backend (``[tpu] checkpoint_format = orbax``) for
    sharded async multi-host checkpoints.

Interop with reference ``torch.save`` checkpoints lives in ``compat/``.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from rawaudiovae_kelsey_tpu.train.state import TrainState

_CKPT_RE = re.compile(r"ckpt_(\d+)\.npz$")
_ORBAX_RE = re.compile(r"orbax_(\d+)$")


def _write_meta(meta_path: Path, extra: Optional[Dict[str, Any]],
                step: int) -> None:
    """Atomic sidecar write (tmp+rename), coordinator process only — a torn
    meta.json would brick resume, and in multihost every process would race
    on the same file."""
    if jax.process_index() != 0:
        return
    meta = dict(extra or {})
    meta["step"] = step
    tmp = _unique_tmp(meta_path)
    tmp.write_text(json.dumps(meta))
    tmp.rename(meta_path)


def _read_meta(meta_path: Path) -> Dict[str, Any]:
    """Sidecar read that tolerates a missing or torn file (resume must not
    brick on metadata)."""
    try:
        return json.loads(meta_path.read_text())
    except (OSError, json.JSONDecodeError):
        return {}


def _unique_tmp(path: Path) -> Path:
    """Writer-private tmp name for the atomic write-then-rename: a FIXED
    ``.tmp`` suffix let two writers (e.g. an async boundary worker and the
    run tail racing in a bug) clobber each other's half-written file and
    crash the rename; with per-writer names the worst outcome is a benign
    last-rename-wins.  Stale tmps from crashes are ignored by every scan
    (no pattern matches them)."""
    import threading

    return path.with_name(
        f"{path.name}.tmp{os.getpid()}-{threading.get_ident()}")


def _flatten_with_meta(tree: Any) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(jax.device_get(l))
              for i, l in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(ckpt_dir: Path, state: TrainState,
                    extra: Optional[Dict[str, Any]] = None,
                    label: Optional[int] = None) -> Path:
    """Write ``ckpt_{label:05d}.npz`` (+ sidecar json of loop metadata such as
    epoch/batch_id/best_loss).  ``label`` mirrors the reference's file naming
    — the epoch (train.py:239) or batch_id (train_iterable.py:253) — and
    defaults to the optimizer step count."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(jax.device_get(state.step))
    if label is None:
        label = step
    path = ckpt_dir / f"ckpt_{label:05d}.npz"
    if jax.process_index() != 0:
        # multihost: only the coordinator writes (concurrent writers on
        # shared storage would interleave into a corrupt file); for sharded
        # multihost state use the orbax format instead
        return path
    arrays, _ = _flatten_with_meta(state)
    tmp = _unique_tmp(path)
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    tmp.rename(path)  # atomic so a crash never leaves a torn checkpoint
    _write_meta(path.with_suffix(".json"), extra, step)
    return path


def restore_checkpoint(path: Path, template: TrainState
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of ``template`` (a freshly-initialized
    state with the right treedef/shapes).  Accepts both npz files and orbax
    directories."""
    path = Path(path)
    if path.is_dir():
        state = restore_checkpoint_orbax(path, template)
        return state, _read_meta(path / "meta.json")
    with np.load(path) as npz:
        leaves = [npz[k] for k in sorted(npz.files)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"{path}: {len(leaves)} leaves but template has {len(t_leaves)}"
        )
    for got, want in zip(leaves, t_leaves):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"{path}: leaf shape {got.shape} != template {np.shape(want)}"
            )
    # re-place each MESH-sharded leaf in the template's device layout:
    # returning raw numpy would silently drop the shardings setup()
    # established (e.g. model-parallel specs), so a resumed run would lay
    # params out replicated — different memory/layouts than a fresh run.
    # Single-device leaves stay numpy: device_put would COMMIT them to one
    # device and conflict with the mesh-spanning leaves inside jit (a fresh
    # state's scalars are uncommitted for the same reason).
    leaves = [
        jax.device_put(got, want.sharding)
        if isinstance(want, jax.Array) and len(want.sharding.device_set) > 1
        else got
        for got, want in zip(leaves, t_leaves)
    ]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, _read_meta(path.with_suffix(".json"))


def _scan_checkpoints(ckpt_dir: Path) -> list:
    """All periodic checkpoints in a dir as sorted (label, path) — npz
    files and COMMITTED orbax dirs both count; orbax tmp dirs never match
    the anchored pattern."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return []
    found = []
    for p in ckpt_dir.iterdir():
        m = _CKPT_RE.search(p.name)
        if m is None and p.is_dir():
            m = _ORBAX_RE.match(p.name)
        if m:
            found.append((int(m.group(1)), p))
    found.sort()
    return found


def latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    """Newest checkpoint in a dir — npz files and orbax dirs both count."""
    if _ASYNC_CKPTR is not None:
        wait_for_orbax()  # same-process scan must see in-flight saves
    found = _scan_checkpoints(ckpt_dir)
    return found[-1][1] if found else None


def prune_checkpoints(ckpt_dir: Path, keep: int) -> list:
    """Delete all but the newest ``keep`` periodic checkpoints (by label) —
    `[training] keep_checkpoints`.  npz files (with their json sidecars) and
    COMMITTED orbax dirs both count toward the same budget; in-flight orbax
    tmp dirs never match the pattern and are never touched.  best/last
    model artifacts live elsewhere and are unaffected.  ``keep <= 0`` keeps
    everything (the reference behavior).  Call from one process only (the
    driver gates on process 0).  Returns the removed paths."""
    if keep <= 0:
        return []
    found = _scan_checkpoints(ckpt_dir)
    removed = []
    import shutil

    for _, p in found[:-keep] if len(found) > keep else []:
        try:
            if p.is_dir():
                shutil.rmtree(p)
            else:
                p.unlink()
                p.with_suffix(".json").unlink(missing_ok=True)
            removed.append(p)
        except OSError:
            pass  # retention is best-effort; never fail a run over cleanup
    return removed


def save_params(path: Path, params: Any) -> Path:
    """Params-only snapshot (best_model / last_model analog).  Atomic like
    :func:`save_checkpoint`: best/last are overwritten mid-run while eval/
    serve/tutorial may be reading them, and a crash mid-write must never
    tear the run's only model artifacts."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays, _ = _flatten_with_meta(params)
    tmp = _unique_tmp(path)
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    tmp.rename(path)
    return path


def load_params(path: Path, template: Any) -> Any:
    with np.load(Path(path)) as npz:
        leaves = [npz[k] for k in sorted(npz.files)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    # same validation as restore_checkpoint: a wrong-architecture npz must
    # fail HERE with a clear message, not deep inside the first encode
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"{path}: {len(leaves)} leaves but template has {len(t_leaves)}"
        )
    for got, want in zip(leaves, t_leaves):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"{path}: leaf shape {got.shape} != template {np.shape(want)}"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------- orbax -----

_ASYNC_CKPTR = None              # process-lifetime StandardCheckpointer
_PENDING_META: list = []         # (path, extra, step) deferred to the wait


def _orbax_checkpointer():
    """Process-lifetime ``StandardCheckpointer``.  Persistent so saves can
    run ASYNC: ``save()`` blocks only for the device→host copy (after which
    donating the live state is safe) while the disk write — and on
    multihost, the cross-process commit protocol — continues on orbax's
    background threads.  A with-block per save would force a full wait every
    time, which is exactly the boundary stall `[tpu] async_checkpoint`
    removes."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def _drain_committed_meta(final: bool = False) -> None:
    """Write the deferred meta sidecars of every save that has COMMITTED
    (orbax renames its tmp dir into place at commit, so ``path.exists()``
    marks it).  With ``final=True`` (post-``wait_until_finished``, nothing
    can still be in flight) a missing dir means retention pruned the
    checkpoint — its meta is dropped, never written into a deleted path."""
    global _PENDING_META
    still = []
    for path, extra, step in _PENDING_META:
        if path.exists():
            try:
                _write_meta(path / "meta.json", extra, step)
            except OSError:
                pass  # pruned by retention between the check and the write
        elif not final:
            still.append((path, extra, step))  # still in flight — keep
    _PENDING_META = still


def wait_for_orbax() -> None:
    """Block until every in-flight orbax save has committed, then write the
    deferred meta sidecars.  Safe to call any time; the trainers call it
    before interrupt/final saves and in ``loop.finish`` so a run never
    exits with a write in flight."""
    if _ASYNC_CKPTR is None:
        return
    _ASYNC_CKPTR.wait_until_finished()
    _drain_committed_meta(final=True)


def save_checkpoint_orbax(ckpt_dir: Path, state: TrainState,
                          extra: Optional[Dict[str, Any]] = None,
                          label: Optional[int] = None,
                          wait: bool = True) -> Path:
    """``wait=False`` (used by the trainers under `[tpu] async_checkpoint`)
    returns as soon as the arrays are copied off-device; the disk write and
    multihost commit finish in background.  The meta sidecar is deferred to
    :func:`wait_for_orbax` — a crash before the wait loses the PENDING save
    (async semantics), never a committed one; resume tolerates a missing
    sidecar."""
    step = int(jax.device_get(state.step))
    if label is None:
        label = step
    path = Path(ckpt_dir).resolve() / f"orbax_{label:05d}"
    ckptr = _orbax_checkpointer()
    # hand orbax the jax.Arrays directly: device_get would crash on
    # non-fully-addressable multi-host arrays and forfeit sharded saving
    ckptr.save(path, state)
    _PENDING_META.append((path, extra, step))
    if wait:
        wait_for_orbax()
    else:
        # opportunistic drain: earlier saves that committed meanwhile get
        # their sidecars NOW, so the meta lag is bounded at ~one boundary
        # (a crash loses only the truly pending save's sidecar, as
        # documented) instead of accumulating for the whole run
        _drain_committed_meta()
    return path


def restore_checkpoint_orbax(path: Path, template: TrainState) -> TrainState:
    wait_for_orbax()  # a same-process restore must see in-flight saves
    ckptr = _orbax_checkpointer()
    return ckptr.restore(Path(path).resolve(), template)
