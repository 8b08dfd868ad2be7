"""Batch inference API: encode → interpolate → decode.

Replaces the reference's notebook-only inference layer (tutorial.ipynb) with a
library API.  Contract sources:

  * :func:`encode_trajectory` = ``raw_to_z_dist`` (tutorial cell 14): batched
    no-grad encode of framed audio → (num_frames, latent) mu/logvar
    trajectories;
  * :func:`interpolate_stepwise` = ``raw_interpolate_stepwise_z_dist``
    (cells 16-17): for each α in a grid, lerp the two trajectories, sample,
    decode, concatenate all steps;
  * :func:`interpolate_timevarying` = the meso-scale α(t) interpolation
    (cells 36-37, 53-54): a per-timestep α curve stretched to the trajectory
    length by linear interpolation (the scipy ``interp1d`` of cell 37 — here
    ``np.interp``), broadcast across latent dims (the ``repeat_interleave``
    of cell 37), lerp, sample, decode;
  * :func:`sine_alfa` builds the reference's sine curves
    (``np.sin(np.linspace(-500π, 500π, 20000))``, cell 36).

Sampling is stochastic with an explicit key by default (the reference sampled
at inference too — quirk #13) with a deterministic z = mu switch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rawaudiovae_kelsey_tpu.data.framing import (
    nonoverlapping_frames,
    overlapping_frames,
)
from rawaudiovae_kelsey_tpu.models.registry import ModelDef
from rawaudiovae_kelsey_tpu.models.vae import reparameterize


def frame_audio(audio: np.ndarray, segment_length: int,
                hop: Optional[int] = None) -> np.ndarray:
    """Frame a waveform for encoding.  ``hop=None`` → non-overlapping
    (TestDataset semantics, the normal inference path, tutorial cell 13);
    ``hop=k`` → overlapping (AudioDataset semantics — feeding these to
    :func:`decode_trajectory` + flat concat reproduces the reference's
    ~segment/hop× time-stretch "extension" effect, cell 52)."""
    if hop is None:
        return nonoverlapping_frames(np.asarray(audio, np.float32),
                                     segment_length)
    return np.asarray(
        overlapping_frames(np.asarray(audio, np.float32), segment_length, hop)
    )


def _run_batched(fn, frames: np.ndarray, batch_size: int):
    outs = []
    n = len(frames)
    if n == 0:
        raise ValueError(
            "no frames to process — audio is shorter than one segment "
            "(or an empty trajectory was passed)"
        )
    for i in range(0, n, batch_size):
        chunk = frames[i:i + batch_size]
        pad = 0
        if len(chunk) < batch_size and n > batch_size:
            # keep one compiled shape: pad the tail batch, truncate after
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, chunk[:1].repeat(pad, 0)], axis=0)
        res = fn(jnp.asarray(chunk))
        outs.append(tuple(np.asarray(jax.device_get(r))[:len(r) - pad or None]
                          for r in (res if isinstance(res, tuple) else (res,))))
    return tuple(np.concatenate(parts, axis=0) for parts in zip(*outs))


@functools.lru_cache(maxsize=32)
def _jitted_encode(model: ModelDef):
    """One persistent jitted executable per ModelDef — a fresh jit(lambda)
    per call would retrace/recompile on every invocation."""
    return jax.jit(lambda params, x: model.encode(params, x))


@functools.lru_cache(maxsize=32)
def _jitted_decode(model: ModelDef):
    return jax.jit(lambda params, zz: model.decode(params, zz))


def encode_trajectory(model: ModelDef, params, audio_or_frames: np.ndarray,
                      batch_size: int = 256,
                      hop: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """``raw_to_z_dist``: (mu, logvar) trajectories, each (N, latent).

    Accepts a 1-D waveform (framed at ``hop``) or pre-framed 2-D
    ``(N, segment_length)`` rows.  A ``(samples, channels)`` matrix straight
    from :func:`io.read_wav` is neither — select a channel first.
    """
    frames = audio_or_frames
    if frames.ndim == 1:
        frames = frame_audio(frames, model.segment_length, hop)
    elif frames.ndim != 2 or frames.shape[-1] != model.segment_length:
        raise ValueError(
            f"encode_trajectory: expected a 1-D waveform or (N, "
            f"{model.segment_length}) frames, got shape {frames.shape}. "
            "io.read_wav returns (samples, channels) — pass wave[:, 0] "
            "(or a mono mixdown) for multi-channel audio.")
    encode = functools.partial(_jitted_encode(model), params)
    mu, logvar = _run_batched(encode, frames, batch_size)
    return mu, logvar


def decode_trajectory(model: ModelDef, params, z: np.ndarray,
                      batch_size: int = 256) -> np.ndarray:
    """Decode (N, latent) → (N, segment) frames."""
    decode = functools.partial(_jitted_decode(model), params)
    (frames,) = _run_batched(decode, np.asarray(z, np.float32), batch_size)
    return frames


def sample_z(key: Optional[jax.Array], mu: np.ndarray, logvar: np.ndarray,
             deterministic: bool = False) -> np.ndarray:
    if deterministic or key is None:
        return np.asarray(mu, np.float32)
    return np.asarray(
        reparameterize(key, jnp.asarray(mu), jnp.asarray(logvar))
    )


def interpolate_stepwise(
    model: ModelDef, params,
    mu_a: np.ndarray, logvar_a: np.ndarray,
    mu_b: np.ndarray, logvar_b: np.ndarray,
    alphas=None,
    key: Optional[jax.Array] = None,
    deterministic: bool = False,
    batch_size: int = 256,
) -> np.ndarray:
    """``raw_interpolate_stepwise_z_dist`` (tutorial cells 16-17): decode the
    lerp of two trajectories at each α and concatenate the resulting frame
    sequences.  Default α grid = ``np.arange(0, 1.1, 0.2)`` (cell 17).
    Trajectories must have equal length (use audio_utils.match_audio_size
    upstream, as the reference does at cell 13)."""
    if alphas is None:
        alphas = np.arange(0.0, 1.1, 0.2)
    if mu_a.shape != mu_b.shape:
        raise ValueError(
            f"trajectory shapes differ: {mu_a.shape} vs {mu_b.shape} "
            "(match_audio_size the sources first)"
        )
    if logvar_a.shape != mu_a.shape or logvar_b.shape != mu_b.shape:
        # a (1, latent) logvar would broadcast silently, sampling with the
        # wrong per-frame variance
        raise ValueError(
            f"logvar shapes {logvar_a.shape}/{logvar_b.shape} must match "
            f"the mu trajectories {mu_a.shape}"
        )
    outs = []
    for i, a in enumerate(np.asarray(alphas, np.float32)):
        mu = (1.0 - a) * mu_a + a * mu_b
        logvar = (1.0 - a) * logvar_a + a * logvar_b
        k = None if key is None else jax.random.fold_in(key, i)
        z = sample_z(k, mu, logvar, deterministic)
        outs.append(decode_trajectory(model, params, z, batch_size))
    return np.concatenate(outs, axis=0)


def sine_alfa(n_points: int = 20000, cycles: float = 500.0,
              lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """The reference's time-varying α source (cell 36:
    ``np.sin(np.linspace(-cycles·π, cycles·π, n))``, cell 53 uses cycles=1).
    The reference lerps with the RAW sine in [-1, 1] — half the time the mix
    extrapolates past source A, which is part of the audible effect — so
    that is the default; pass ``lo=0.0`` for a pure within-endpoints
    crossfade."""
    s = np.sin(np.linspace(-cycles * np.pi, cycles * np.pi, n_points))
    return (lo + (s + 1.0) * 0.5 * (hi - lo)).astype(np.float32)


def stretch_alfa(alfa: np.ndarray, length: int) -> np.ndarray:
    """Stretch an α curve to trajectory length by linear interpolation — the
    scipy ``interp1d`` step of tutorial cells 37/54."""
    alfa = np.asarray(alfa, np.float32)
    if len(alfa) == length:
        return alfa
    xs = np.linspace(0.0, 1.0, len(alfa))
    return np.interp(np.linspace(0.0, 1.0, length), xs, alfa).astype(np.float32)


def interpolate_timevarying(
    model: ModelDef, params,
    mu_a: np.ndarray, logvar_a: np.ndarray,
    mu_b: np.ndarray, logvar_b: np.ndarray,
    alfa: np.ndarray,
    key: Optional[jax.Array] = None,
    deterministic: bool = False,
    batch_size: int = 256,
) -> np.ndarray:
    """Meso-scale interpolation (cells 36-37): α varies per frame; the curve
    is stretched to the trajectory length and broadcast across latent dims."""
    if mu_a.shape != mu_b.shape:
        raise ValueError(
            f"trajectory shapes differ: {mu_a.shape} vs {mu_b.shape}"
        )
    if logvar_a.shape != mu_a.shape or logvar_b.shape != mu_b.shape:
        raise ValueError(
            f"logvar shapes {logvar_a.shape}/{logvar_b.shape} must match "
            f"the mu trajectories {mu_a.shape}"
        )
    a = stretch_alfa(alfa, len(mu_a))[:, None]  # (N, 1) broadcast over latent
    mu = (1.0 - a) * mu_a + a * mu_b
    logvar = (1.0 - a) * logvar_a + a * logvar_b
    z = sample_z(key, mu, logvar, deterministic)
    return decode_trajectory(model, params, z, batch_size)


def reconstruct(model: ModelDef, params, audio: np.ndarray,
                key: Optional[jax.Array] = None,
                deterministic: bool = False,
                batch_size: int = 256) -> np.ndarray:
    """encode → sample → decode of a waveform (frames, not yet flattened)."""
    mu, logvar = encode_trajectory(model, params, audio, batch_size)
    z = sample_z(key, mu, logvar, deterministic)
    return decode_trajectory(model, params, z, batch_size)


def encode_trajectory_sharded(model: ModelDef, params, audio: np.ndarray,
                              mesh, batch_frames: int = 0,
                              hop: Optional[int] = None
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-parallel batch encode of a long waveform.

    The reference's "long sequence" story is framing (SURVEY.md §5.7):
    minutes of audio become tens of thousands of independent frames, so the
    context-parallel analog on TPU is sharding the frame axis over the mesh
    ``data`` axis — every chip encodes its shard, no cross-chip dependencies.
    Frames are padded to a device multiple and the pad is dropped on return.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS

    frames = frame_audio(np.asarray(audio, np.float32),
                         model.segment_length, hop)
    n = len(frames)
    if n == 0:
        raise ValueError("audio shorter than one segment — nothing to encode")
    n_dev = mesh.devices.size
    chunk = batch_frames or n
    chunk += -chunk % n_dev
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    # reuse the cached per-model executable (jit caches per input sharding,
    # so sharded calls compile once, not per invocation)
    encode = functools.partial(_jitted_encode(model), params)
    mus, lvs = [], []
    for i in range(0, n, chunk):
        part = frames[i:i + chunk]
        # pad the tail to the FULL chunk (not just a device multiple): a
        # different tail shape would retrace/recompile the executable this
        # loop exists to reuse
        pad = chunk - len(part) if n > chunk else -len(part) % n_dev
        if pad:
            part = np.concatenate([part, part[:1].repeat(pad, 0)], axis=0)
        mu, logvar = encode(jax.device_put(part, sharding))
        keep = len(part) - pad
        mus.append(np.asarray(jax.device_get(mu))[:keep])
        lvs.append(np.asarray(jax.device_get(logvar))[:keep])
    return np.concatenate(mus, axis=0), np.concatenate(lvs, axis=0)
