"""Self-organizing-map training on latent features — TPU-native.

The reference's SOM-cluster workflow consumed artifacts produced by an
external repo (``ktatar/mlaudiosalad``, README.md:14): ``som/clusters.json``
and ``som/data-concatenated.json`` (tutorial cells 28-29).  This module
closes that external dependency: it trains a batch SOM *here*, on latent
trajectories from this framework's own encoder, and writes artifacts in the
exact schema :class:`infer.som.SomClusters` (and the reference notebook)
consume.

TPU mapping: one training iteration is
  * BMU search — ``‖x − w‖²`` for all (sample, unit) pairs via a single
    GEMM (``-2 x·wᵀ`` plus norms) and an argmin — MXU work;
  * batch update — every unit moves toward the neighborhood-weighted mean
    of the samples it wins: two more GEMMs over a (units, samples) weight
    matrix.  The whole fit runs inside one ``lax.fori_loop`` under jit.

Feature extraction: one vector per wav file = the time-mean of its latent
trajectory (``encode_trajectory`` mu, mean-pooled) — the standard audio-
corpus SOM setup.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rawaudiovae_kelsey_tpu.infer.api import encode_trajectory
from rawaudiovae_kelsey_tpu.io import load
from rawaudiovae_kelsey_tpu.models.registry import ModelDef


def train_som(
    features: np.ndarray,
    grid: Tuple[int, int] = (8, 8),
    iters: int = 200,
    sigma0: float = 2.5,
    lr0: float = 0.5,
    seed: int = 0,
) -> np.ndarray:
    """Batch-SOM fit → codebook of shape ``(grid[0]*grid[1], dim)``."""
    x = jnp.asarray(features, jnp.float32)
    n, dim = x.shape
    m = grid[0] * grid[1]
    key = jax.random.PRNGKey(seed)
    # init: random samples (with replacement if the corpus is small)
    init_idx = jax.random.randint(key, (m,), 0, n)
    w0 = x[init_idx] + 1e-3 * jax.random.normal(
        jax.random.fold_in(key, 1), (m, dim)
    )
    # unit coordinates on the grid, for the neighborhood kernel
    gy, gx = jnp.meshgrid(jnp.arange(grid[0]), jnp.arange(grid[1]),
                          indexing="ij")
    coords = jnp.stack([gy.ravel(), gx.ravel()], axis=1).astype(jnp.float32)
    grid_d2 = jnp.sum(
        (coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1
    )  # (m, m)
    x_norm2 = jnp.sum(x * x, axis=1)

    @jax.jit
    def fit(w0):
        def body(t, w):
            frac = t / max(iters - 1, 1)
            sigma = sigma0 * jnp.exp(-frac * 3.0) + 1e-3
            lr = lr0 * jnp.exp(-frac * 3.0)
            # BMU per sample: argmin ‖x−w‖² (GEMM + norms)
            d2 = (x_norm2[:, None] - 2.0 * x @ w.T
                  + jnp.sum(w * w, axis=1)[None, :])
            bmu = jnp.argmin(d2, axis=1)                      # (n,)
            # neighborhood weight of every unit wrt each sample's BMU
            h = jnp.exp(-grid_d2[:, bmu] / (2.0 * sigma * sigma))  # (m, n)
            support = jnp.sum(h, axis=1, keepdims=True)        # (m, 1)
            target = (h @ x) / jnp.maximum(support, 1e-8)      # (m, dim)
            # batch-SOM rule: a unit with no meaningful support HOLDS its
            # position (otherwise the epsilon denominator makes target≈0
            # and dead units get dragged to the origin, where they steal
            # small-norm features at assignment time)
            upd = w + lr * (target - w)
            return jnp.where(support > 1e-6, upd, w)

        return jax.lax.fori_loop(0, iters, body, w0)

    return np.asarray(jax.device_get(fit(w0)))


def assign_clusters(features: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """BMU index per feature row."""
    x = jnp.asarray(features, jnp.float32)
    w = jnp.asarray(codebook, jnp.float32)
    d2 = (jnp.sum(x * x, axis=1)[:, None] - 2.0 * x @ w.T
          + jnp.sum(w * w, axis=1)[None, :])
    return np.asarray(jnp.argmin(d2, axis=1))


def extract_file_features(model: ModelDef, params, audio_dir: Path,
                          sampling_rate: int, mono: str = "mean",
                          batch_size: int = 256
                          ) -> Tuple[np.ndarray, List[Path]]:
    """One latent vector per wav: time-mean of the mu trajectory."""
    files = sorted(Path(audio_dir).glob("*.wav"))
    if not files:
        raise FileNotFoundError(f"no wav files in {audio_dir}")
    feats = []
    kept = []
    for f in files:
        wave, _ = load(f, sr=sampling_rate, mono=mono)
        if len(wave) == 0:
            continue
        mu, _ = encode_trajectory(model, params, wave, batch_size)
        feats.append(mu.mean(axis=0))
        kept.append(f)
    return np.stack(feats), kept


def write_som_artifacts(out_dir: Path, assignments: np.ndarray,
                        files: List[Path],
                        relative_to: Path | None = None) -> Tuple[Path, Path]:
    """Write ``clusters.json`` + ``data-concatenated.json`` in the schema the
    reference notebook consumed (cells 28-29):

        clusters.json           {str(cluster_idx): [sample_index, ...]}
        data-concatenated.json  {str(index): [metadata, wav_path]}
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    clusters: Dict[str, List[int]] = {}
    for i, c in enumerate(assignments.tolist()):
        clusters.setdefault(str(int(c)), []).append(i)
    data = {}
    for i, f in enumerate(files):
        rel = f.relative_to(relative_to) if relative_to else f.name
        data[str(i)] = [{"cluster": int(assignments[i])}, str(rel)]
    clusters_path = out_dir / "clusters.json"
    data_path = out_dir / "data-concatenated.json"
    clusters_path.write_text(json.dumps(clusters, indent=1))
    data_path.write_text(json.dumps(data, indent=1))
    return clusters_path, data_path


def train_som_for_corpus(model: ModelDef, params, audio_dir: Path,
                         out_dir: Path, sampling_rate: int,
                         grid: Tuple[int, int] = (8, 8), iters: int = 200,
                         seed: int = 0, mono: str = "mean"
                         ) -> Tuple[Path, Path]:
    """End-to-end: encode corpus → fit SOM → write reference-schema
    artifacts consumable by :class:`infer.som.SomClusters`."""
    feats, files = extract_file_features(model, params, audio_dir,
                                         sampling_rate, mono)
    codebook = train_som(feats, grid=grid, iters=iters, seed=seed)
    assignments = assign_clusters(feats, codebook)
    return write_som_artifacts(out_dir, assignments, files,
                               relative_to=Path(audio_dir))
