"""Model registry: one uniform functional interface over all VAE families.

The reference had exactly one model class (rawvae/model.py:5) instantiated
inline by each driver (train.py:158-161); here every variant — dense (the
reference architecture), deep/wide MLP, conv1d — is described by a
:class:`ModelDef` of pure functions, so the train step, checkpointing,
inference API and Pallas kernel dispatch are variant-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Tuple

import jax

from rawaudiovae_kelsey_tpu.config.schema import Config
from rawaudiovae_kelsey_tpu.models import vae, variants


@dataclass(frozen=True)
class ModelDef:
    """A VAE family: init + encode/decode pure functions and static shape
    metadata.  ``encode``/``decode`` close over all static hyperparameters so
    they are directly jittable."""

    name: str
    segment_length: int
    latent_dim: int
    init: Callable[[jax.Array], vae.Params]
    encode: Callable[[vae.Params, jax.Array], Tuple[jax.Array, jax.Array]]
    decode: Callable[[vae.Params, jax.Array], jax.Array]

    def reparameterize(self, key, mu, logvar, deterministic: bool = False):
        return vae.reparameterize(key, mu, logvar, deterministic)

    def forward(self, params, key, x, deterministic: bool = False):
        """(recon, mu, logvar) — the model.py:32-35 contract, including the
        reshape of arbitrary leading dims to (-1, segment_length)."""
        x = x.reshape(-1, self.segment_length)
        mu, logvar = self.encode(params, x)
        z = vae.reparameterize(key, mu, logvar, deterministic)
        return self.decode(params, z), mu, logvar


def _parse_int_list(s: str, default):
    s = s.strip()
    if not s:
        return list(default)
    return [int(t) for t in s.replace(" ", "").split(",") if t]


def _resolve_backend(cfg: Config, arch: str) -> str:
    """``best`` → the measured winner per family and tier (docs/PERF.md):
    the fused Pallas tier for the dense model on a real TPU at the three
    measured precisions (bfloat16 and highest are clear wins since the
    round-3 fused backward; "high" is a declared TIE — same-session pairs
    read pallas 1.744 vs xla 1.733 M and the round-3 driver matrix read
    xla 1.737 vs pallas 1.733 M, both within the ±1 % tunnel noise band,
    so pallas is kept for tier uniformity, not on evidence of a lead),
    XLA for deep/conv1d, for plain float32 (unmeasured corner — mirrors
    bench.resolve_best), and for CPU runs (interpret-mode kernels exist
    for correctness, not speed)."""
    backend = cfg.tpu.backend
    if backend != "best":
        return backend
    if arch != "dense":
        return "xla"
    if cfg.tpu.precision not in ("bfloat16", "high", "highest"):
        return "xla"
    platform = jax.devices()[0].platform.lower()
    on_tpu = "tpu" in platform or "axon" in platform
    return "pallas" if on_tpu else "xla"


def build_model(cfg: Config, backend_override: str | None = None) -> ModelDef:
    """Construct the ModelDef selected by ``cfg.vae.arch``.

    ``backend_override`` bypasses :func:`_resolve_backend` — used by
    :func:`resident_model` to re-route ``best`` for the on-chip epoch/stream
    scans.  Params layouts are backend-independent, so a state initialized
    under one backend runs under another."""
    seg = cfg.audio.segment_length
    latent = cfg.vae.latent_dim
    arch = cfg.vae.arch
    backend = backend_override or _resolve_backend(cfg, arch)

    if arch == "dense":
        n_units = cfg.vae.n_units
        encode_fn, decode_fn = vae.encode, vae.decode
        if backend == "pallas":
            from rawaudiovae_kelsey_tpu.ops import pallas_decode, pallas_encode

            encode_fn, decode_fn = pallas_encode, pallas_decode
        return ModelDef(
            name="dense",
            segment_length=seg,
            latent_dim=latent,
            init=partial(vae.init_dense, segment_length=seg,
                         n_units=n_units, latent_dim=latent),
            encode=encode_fn,
            decode=decode_fn,
        )

    if arch == "deep":
        hidden = _parse_int_list(cfg.vae.hidden_dims, (4096, 2048, 1024, 512))
        encode_fn, decode_fn = variants.encode_deep, variants.decode_deep
        if backend == "pallas":
            from rawaudiovae_kelsey_tpu.ops import (
                deep_decode_pallas,
                deep_encode_pallas,
            )

            encode_fn, decode_fn = deep_encode_pallas, deep_decode_pallas
        return ModelDef(
            name="deep",
            segment_length=seg,
            latent_dim=latent,
            init=partial(variants.init_deep, segment_length=seg,
                         hidden_dims=tuple(hidden), latent_dim=latent),
            encode=encode_fn,
            decode=decode_fn,
        )

    if arch == "conv1d":
        channels = _parse_int_list(cfg.vae.conv_channels, (32, 64, 128, 256))
        kernel, stride = cfg.vae.conv_kernel, cfg.vae.conv_stride
        width = variants.conv_latent_width(seg, len(channels), stride)
        encode_fn = partial(variants.encode_conv1d, stride=stride)
        decode_fn = partial(variants.decode_conv1d, stride=stride,
                            width=width, channels=channels[-1])
        # backend=pallas deliberately resolves to the XLA conv lowering:
        # a per-layer sweep of every configs/conv1d.ini shape at bf16
        # batch 4096 measured XLA implicit-GEMM ahead of the Toeplitz
        # kernel on ALL eight layers (1.7-18.7x — small channel counts
        # starve the MXU in the flat-stream formulation; docs/PERF.md).
        # ops.conv_encode_pallas/conv_decode_pallas remain available as
        # explicit ops (fused epilogues, 4-pass fp32 precision mode).
        return ModelDef(
            name="conv1d",
            segment_length=seg,
            latent_dim=latent,
            init=partial(variants.init_conv1d, segment_length=seg,
                         channels=tuple(channels), kernel=kernel,
                         stride=stride, latent_dim=latent),
            encode=encode_fn,
            decode=decode_fn,
        )

    raise ValueError(f"unknown arch {arch!r}")


def resident_model(cfg: Config, model: ModelDef) -> ModelDef:
    """The ModelDef the DEVICE-RESIDENT trainers should scan with:
    ``backend=best`` routes them to XLA even where the standalone step
    resolves Pallas.  Measured (v5e, bf16 batch 4096, same-session direct
    pairing, round 4): the fused-backward custom calls lose ~19% inside
    the on-chip epoch scan — XLA 4.32 M vs Pallas 3.51 M frames/s steady —
    while standalone the SAME kernels win (4.65 vs 4.52 M).  In-scan they
    need a scoped-vmem raise just to compile (ops/pallas_mlp.vmem_headroom)
    and schedule worse against the loop machinery.  An EXPLICIT
    ``backend=pallas`` is honored unchanged."""
    if cfg.tpu.backend != "best":
        return model
    return build_model(cfg, backend_override="xla")


def tree_dotted_names(params):
    """(dotted-name, leaf) pairs with torch-style names — the ONE place the
    tree-path naming rule lives (model summaries and histogram tags must
    agree)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return [
        (".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                  for p in path), leaf)
        for path, leaf in flat
    ]


def summarize(model: ModelDef, params) -> str:
    """Text model summary — the working interpretation of the reference's
    dead ``plot_model`` key (default.ini:37, quirk #9): layer-by-layer
    shapes and parameter counts printed at driver start."""
    import numpy as np

    lines = [f"model: {model.name}  segment={model.segment_length}  "
             f"latent={model.latent_dim}"]
    total = 0
    total_bytes = 0
    for name, leaf in tree_dotted_names(params):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        total_bytes += n * np.dtype(leaf.dtype).itemsize
        lines.append(f"  {name:<24} {str(tuple(leaf.shape)):<18} {n:>12,}")
    lines.append(f"  total parameters: {total:,} "
                 f"({total_bytes / 1e6:.1f} MB)")
    return "\n".join(lines)
