#!/usr/bin/env python
"""Benchmark harness.

Default (no flags): a MATRIX run — every headline configuration from
BASELINE.json measured in one invocation, emitted as ONE self-describing
JSON line whose top-level fields are the dense-model headline (what the
driver parses) and whose ``configs`` array carries the full matrix:

    dense bf16 batch 4096 (pallas + xla), giant batch 131072/microbatch
    8192, fp32 "high" (pallas + xla), fp32 "highest" (pallas + xla),
    deep variant, conv1d variant, synth bf16, synth int8

Each entry reports backend, precision, batch, frames/s (or x-realtime),
and MFU where bf16 peak applies; the dense entry carries the on-device
pallas-vs-xla loss-parity attestation.  A wall-clock budget
(``--budget``, default 2400 s) bounds the run: configs that don't fit are
listed under ``skipped`` — never silently dropped.

``--single`` restores the one-configuration mode with the original flags:
    --metric train|synth --backend best|xla|pallas --precision P
    --batch N --chain N --steps N --microbatch N --quantize

The torch-CPU baseline is the reference's own training loop re-typed
(architecture/loss per rawvae/model.py:13-46, loop train.py:179-196),
measured on this host (best-of-3; cached high-water in
.bench_torch_baseline.json so a loaded host can only lower our reported
speedup, never raise it).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

CACHE = Path(__file__).parent / ".bench_torch_baseline.json"

SEG, UNITS, LATENT = 1024, 2048, 256
KL_BETA, LR = 1e-4, 1e-4

DEEP_SEG, DEEP_HIDDEN = 4096, (4096, 2048, 1024, 512)
CONV_CHANNELS, CONV_K, CONV_S = (32, 64, 128, 256), 9, 4

V5E_BF16_PEAK = 197e12


def _build_cfg(arch: str, batch: int, precision: str, backend: str,
               microbatch: int = 0):
    from rawaudiovae_kelsey_tpu.config import Config

    cfg = Config()
    cfg.vae.latent_dim = LATENT
    cfg.vae.kl_beta = KL_BETA
    cfg.training.learning_rate = LR
    cfg.training.batch_size = batch
    cfg.tpu.precision = precision
    cfg.tpu.backend = backend
    cfg.tpu.microbatch_size = microbatch
    if arch == "dense":
        cfg.audio.segment_length = SEG
        cfg.vae.n_units = UNITS
    elif arch == "deep":
        cfg.vae.arch = "deep"
        cfg.audio.segment_length = DEEP_SEG
        cfg.audio.hop_length = 512
        cfg.vae.hidden_dims = ",".join(str(d) for d in DEEP_HIDDEN)
    elif arch == "conv1d":
        cfg.vae.arch = "conv1d"
        cfg.audio.segment_length = SEG
        cfg.vae.conv_channels = ",".join(str(c) for c in CONV_CHANNELS)
        cfg.vae.conv_kernel = CONV_K
        cfg.vae.conv_stride = CONV_S
    else:
        raise ValueError(arch)
    return cfg


def flops_per_frame(arch: str) -> float:
    """Train-step FLOPs per frame: 2·(MACs of the forward) × 3 for
    fwd+bwd (the dx and dW passes each re-run the GEMM volume — the
    standard MFU convention, kept from round 2 even though both backends
    now dead-code-eliminate the first-layer dx GEMM)."""
    if arch == "dense":
        fwd = 2.0 * (SEG * UNITS + 2 * UNITS * LATENT + LATENT * UNITS
                     + UNITS * SEG)
    elif arch == "deep":
        dims = [DEEP_SEG, *DEEP_HIDDEN]
        macs = sum(a * b for a, b in zip(dims[:-1], dims[1:]))
        macs += 2 * DEEP_HIDDEN[-1] * LATENT              # latent heads
        rdims = [LATENT, *reversed(DEEP_HIDDEN), DEEP_SEG]
        macs += sum(a * b for a, b in zip(rdims[:-1], rdims[1:]))
        fwd = 2.0 * macs
    elif arch == "conv1d":
        # strided SAME convs: L_out = ceil(L_in/S); MACs = L_out·K·Cin·Cout.
        # transpose convs mirror (each input position scatters K taps) —
        # approximate, good to a few % for MFU purposes.
        macs = 0.0
        chs = [1, *CONV_CHANNELS]
        L = SEG
        for cin, cout in zip(chs[:-1], chs[1:]):
            L_out = -(-L // CONV_S)
            macs += L_out * CONV_K * cin * cout
            L = L_out
        flat = L * CONV_CHANNELS[-1]
        macs += 2 * flat * LATENT + LATENT * flat         # heads + dec_in
        for cin, cout in zip(chs[::-1][:-1], chs[::-1][1:]):
            macs += L * CONV_K * cin * cout
            L *= CONV_S
        fwd = 2.0 * macs
    else:
        raise ValueError(arch)
    return 3.0 * fwd


def bench_jax(arch: str, batch_size: int, steps: int, precision: str,
              backend: str, microbatch: int = 0, chain: int = 100,
              windows: int = 3) -> float:
    """``chain`` optimizer steps per dispatch inside one jitted lax.scan —
    the measurement then reflects device throughput even when host→device
    dispatch latency is high (the axon tunnel's round-trip fluctuates
    ~28-130 ms).  Best of ``windows`` timed windows of ``steps``
    dispatches each: the device's steady-state rate is stable, so the max
    filters host/tunnel noise the same way the torch denominator's
    best-of-3 does."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = _build_cfg(arch, batch_size, precision, backend, microbatch)
    seg = cfg.audio.segment_length
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    one_step = build_train_step(model, cfg, opt, donate=False)

    if chain > 1:
        inner = one_step

        @jax.jit
        def step(state, batch):
            def body(s, _):
                s, m = inner(s, batch)
                return s, m["loss"]
            s, losses = jax.lax.scan(body, state, None, length=chain)
            return s, {"loss": losses[-1]}
    else:
        step = one_step

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.uniform(-1, 1, (batch_size, seg)).astype(np.float32))

    # warmup: compile + steady steps.  Must FETCH a value: through the axon
    # tunnel, compilation is asynchronous and block_until_ready can return
    # before it finishes, which would put the compile inside the timed
    # region.
    for _ in range(3):
        state, m = step(state, batch)
    float(jax.device_get(m["loss"]))
    jax.block_until_ready(state.params)

    best = 0.0
    for _ in range(max(windows, 1)):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch)
        # force materialization of the whole chain (block_until_ready alone
        # is unreliable through the axon tunnel)
        float(jax.device_get(m["loss"]))
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * steps * max(chain, 1) / dt)
    return best


def bench_synth(batch_size: int, steps: int, precision: str,
                backend: str, quantize: bool = False, windows: int = 3):
    """Real-time synthesis factor (BASELINE.json "metric"): seconds of
    44.1 kHz audio the decode path produces per wall-clock second, on
    device-resident latents.  Returns ``(factor, chain_used)``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.models import build_model

    cfg = _build_cfg("dense", batch_size, precision, backend)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if quantize:
        from rawaudiovae_kelsey_tpu.ops import (
            quantize_decoder,
            quantized_decoder_fwd,
        )

        qparams = quantize_decoder(params)
        decode = jax.jit(lambda z: quantized_decoder_fwd(qparams, z))
        precision = "float32"  # int8 path takes fp32 latents
    else:
        if precision == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params
            )
        decode = jax.jit(lambda z: model.decode(params, z))
    z = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch_size, LATENT))
        .astype(np.float32)
    )
    if precision == "bfloat16":
        z = z.astype(jnp.bfloat16)

    # chain the decodes inside one dispatch (same methodology as the train
    # metric); the 1e-30 feedback keeps the loop un-hoistable.
    chain = max(steps, 50)

    @jax.jit
    def decode_chain(z0):
        def body(c, _):
            y = decode(c)
            return c + (y[:, :LATENT] * 1e-30).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, z0, None, length=chain)
        return c

    float(jax.device_get(decode_chain(z)[0, 0]))  # compile (axon async)
    best = float("inf")
    for _ in range(max(windows, 1)):
        t0 = time.perf_counter()
        out = decode_chain(z)
        float(jax.device_get(out[0, 0]))
        best = min(best, time.perf_counter() - t0)
    samples_per_sec = batch_size * SEG * chain / best
    return samples_per_sec / 44100.0, chain


def bench_resident(precision: str, shuffle: str, interval: int,
                   epochs: int = 60, duration_s: int = 120,
                   backend: str = "best") -> dict:
    """Resident-epoch trainer rate through the REAL CLI driver (VERDICT r3
    item 4: make the resident numbers driver-captured): builds a synthetic
    corpus, runs ``train.py``'s entry in-process, and reports the best WARM
    drain-window rate — windows are timed from each group's dispatch, so
    checkpoint-boundary I/O is absorbed, and the first window (which carries
    the jit compile) is discarded.  ``interval=0`` disables periodic
    checkpoints: the whole run is one boundary-free dispatch (the "direct"
    figure); ``interval=20`` matches the documented e2e protocol
    (docs/PERF.md "Checkpoint-boundary host I/O").  Reference semantics
    being measured: train.py:134 DataLoader(shuffle=True) epochs."""
    import contextlib
    import io as _io
    import re
    import shutil
    import tempfile

    import numpy as np

    from rawaudiovae_kelsey_tpu.io import write_wav

    d = Path(tempfile.mkdtemp(prefix="bench_resident_"))
    try:
        (d / "audio").mkdir()
        (d / "test_audio").mkdir()
        sr = 44100
        rng = np.random.default_rng(0)
        t = np.arange(duration_s * sr) / sr
        sig = np.zeros(duration_s * sr, np.float32)
        for f in (220.0, 440.0, 587.0, 880.0):
            sig += (0.2 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        sig += rng.normal(0, 0.01, sig.shape).astype(np.float32)
        write_wav(d / "audio" / "corpus.wav", sig, sr)
        write_wav(d / "test_audio" / "t.wav", sig[:sr], sr)
        ini = d / "bench.ini"
        ini.write_text(f"""
[audio]
sampling_rate = 44100
hop_length = 128
segment_length = {SEG}
[dataset]
datapath = {d}
test_dataset = test_audio
generate_test = False
[VAE]
latent_dim = {LATENT}
n_units = {UNITS}
kl_beta = {KL_BETA}
[training]
epochs = {epochs}
learning_rate = {LR}
batch_size = 4096
checkpoint_interval = {interval}
loss_reduction = mean
[extra]
description = bench_resident
[tpu]
precision = {precision}
backend = {backend}
device_resident = always
resident_shuffle = {shuffle}
async_checkpoint = true
""")
        from rawaudiovae_kelsey_tpu.train.cli import main_epoch

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            main_epoch(["--config", str(ini)])
        stats = _parse_resident_output(buf.getvalue())
        stats.update(epochs=epochs, shuffle=shuffle,
                     checkpoint_interval=interval)
        return stats
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _parse_resident_output(out: str) -> dict:
    """Extract the trainer's own steady-state e2e figure (epochs after the
    first group, whose dispatch carries the jit compile — checkpoints and
    boundary I/O included) as the headline value, plus the warm drain-window
    rates and the boundary-I/O breakdown.  Through the axon tunnel the
    steady figure is LINK-bound, not device-bound, whenever per-boundary
    state bytes exceed link_bw x compute-per-interval — docs/PERF.md
    'Checkpoint-boundary host I/O' quantifies it."""
    import re

    import numpy as np

    # the trainer emits one "[drain]" line per drain window — exact window
    # boundaries, immune to two adjacent windows rounding to the same rate
    drain_rates = [float(m.replace(",", "")) for m in re.findall(
        r"\[drain\] \d+ epochs in [\d.]+s = ([\d,]+) frames/s", out)]
    if drain_rates:
        wins = drain_rates
    else:
        # fallback for outputs without drain markers: epochs drained in one
        # window all print the same rate — collapse consecutive repeats
        rates = [float(m.replace(",", ""))
                 for m in re.findall(r"\(([\d,]+) frames/s\)", out)]
        if not rates:
            raise RuntimeError("no drain-window rates in trainer output:\n"
                               + out[-500:])
        wins = [r for i, r in enumerate(rates)
                if i == 0 or rates[i - 1] != r]
    # drop the compile window (the first drain absorbs the jit compile).
    # With only ONE window there is no warm window at all — the sole
    # window includes the jit compile, so a whole-wall rate would be
    # meaningless; report None rather than a compile-polluted figure.
    warm = wins[1:]
    steady_m = re.search(
        r"steady e2e \(excl\. first-dispatch compile\): \d+ epochs in "
        r"[\d.]+s = ([\d,]+) frames/s", out)
    io_m = re.search(r"\(([\d.]+)s of that is boundary host I/O\)", out)
    # ANCHORED to the trainer's total line — an unanchored "N epochs in
    # Xs" matched the first [drain] window instead and round 4's matrix
    # recorded wall_s_incl_compile 2.13 s < boundary_io_s 2.76 s
    # (internally impossible; VERDICT r4 weak #2)
    wall_m = re.search(
        r"Resident epochs e2e: (\d+) epochs in ([\d.]+)s", out)
    # drain-link meter (trainer's [boundary-link] line): measured
    # device→host bandwidth during state drains, so a reader can tell a
    # device regression from link weather in the artifact itself
    link_m = re.search(
        r"\[boundary-link\] ([\d.]+) MB of state drained in [\d.]+s = "
        r"([\d.]+) MB/s", out)
    # link-normalized projection: the steady window with on-loop boundary
    # wall subtracted (on local PCIe the two figures converge)
    ex_m = re.search(
        r"steady e2e ex-boundary-I/O: \d+ epochs in [\d.]+s = "
        r"([\d,]+) frames/s", out)
    steady = (float(steady_m.group(1).replace(",", ""))
              if steady_m else None)
    return {
        "value": steady if steady is not None else max(wins),
        "steady_e2e": steady,
        "warm_window_max": max(warm) if warm else None,
        "windows": len(wins),
        "warm_window_median": float(np.median(warm)) if warm else None,
        "boundary_io_s": float(io_m.group(1)) if io_m else None,
        "wall_s_incl_compile": float(wall_m.group(2)) if wall_m else None,
        "drained_MB": float(link_m.group(1)) if link_m else None,
        "link_MBps": float(link_m.group(2)) if link_m else None,
        "steady_e2e_ex_io": (float(ex_m.group(1).replace(",", ""))
                             if ex_m else None),
    }


def bench_torch_cpu(batch_size: int, steps: int = 3) -> float:
    """The reference train-step loop on torch CPU (architecture and loss per
    rawvae/model.py, loop per train.py:179-196) — measured, not assumed."""
    import numpy as np
    import torch

    torch.manual_seed(0)

    class RefVAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = torch.nn.Linear(SEG, UNITS)
            self.fc21 = torch.nn.Linear(UNITS, LATENT)
            self.fc22 = torch.nn.Linear(UNITS, LATENT)
            self.fc3 = torch.nn.Linear(LATENT, UNITS)
            self.fc4 = torch.nn.Linear(UNITS, SEG)

        def forward(self, x):
            h1 = torch.relu(self.fc1(x))
            mu, logvar = self.fc21(h1), self.fc22(h1)
            std = torch.exp(0.5 * logvar)
            z = mu + torch.randn_like(std) * std
            return torch.tanh(self.fc4(torch.relu(self.fc3(z)))), mu, logvar

    model = RefVAE()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR)
    x = torch.from_numpy(
        np.random.default_rng(0).uniform(-1, 1, (batch_size, SEG))
        .astype(np.float32)
    )

    def one_step():
        optimizer.zero_grad()
        recon, mu, logvar = model(x)
        loss = torch.nn.functional.mse_loss(recon, x) + KL_BETA * (
            -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        )
        loss.backward()
        optimizer.step()
        return float(loss.item())

    one_step()  # warmup
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            one_step()
        dt = time.perf_counter() - t0
        best = max(best, batch_size * steps / dt)
    return best


def torch_baseline(batch: int, skip_measure: bool = False):
    # per-batch high-water cache: a single-slot record would be wiped by a
    # --single run at another batch size, and the NEXT matrix run on a
    # loaded host would inflate vs_baseline — the documented invariant is
    # that a loaded host can only LOWER the reported speedup
    recs = {}
    if CACHE.exists():
        try:
            recs = json.loads(CACHE.read_text())
        except (OSError, json.JSONDecodeError):
            recs = {}
    if "batch" in recs:  # migrate the old single-slot format
        recs = {str(recs["batch"]): recs.get("torch_cpu_frames_per_sec")}
    cached = recs.get(str(batch))
    baseline = None
    if not skip_measure:
        try:
            baseline = bench_torch_cpu(batch)
            if cached:
                baseline = max(baseline, cached)
            recs[str(batch)] = baseline
            CACHE.write_text(json.dumps(recs))
        except Exception as e:  # noqa: BLE001
            print(f"torch baseline failed: {e}", file=sys.stderr)
    return baseline if baseline is not None else cached


def parity_check(batch_size: int, precision: str) -> float:
    """On-device Pallas-vs-XLA loss attestation: ONE identical 5-step
    train sequence per backend — same init, same batch, same fold_in keys
    — compiled on whatever jax.devices() gives (the real TPU under the
    driver); returns |loss_pallas − loss_xla|.  The CPU suite only ever
    exercises the kernels in interpret mode; this makes compiled-mode
    correctness driver-visible on every bench run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.uniform(-1, 1, (batch_size, SEG)).astype(np.float32)
    )
    losses = {}
    for backend in ("xla", "pallas"):
        cfg = _build_cfg("dense", batch_size, precision, backend)
        model = build_model(cfg)
        opt = build_optimizer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        state = TrainState.create(params, opt.init(params), seed=0)
        step = build_train_step(model, cfg, opt, donate=False)
        for _ in range(5):
            state, m = step(state, batch)
        losses[backend] = float(jax.device_get(m["loss"]))
    return abs(losses["pallas"] - losses["xla"])


def resolve_best(metric: str, precision: str, arch: str = "dense") -> str:
    # Measured winner per tier (docs/PERF.md): since the round-3 fused
    # backward (dh/dh3 in-register, dx dead-code-eliminated like XLA's
    # autodiff), Pallas leads the dense bf16 (4.65 vs 4.52 M frames/s)
    # and "highest" (+11 %) tiers; "high" is a declared TIE (pallas 1.744
    # vs xla 1.733 M same-session, xla 1.737 vs pallas 1.733 M in the
    # round-3 driver matrix — both inside the ±1 % tunnel noise band;
    # pallas kept for tier uniformity).  The synth/int8 decode paths
    # exist only in Pallas.  deep/conv1d keep XLA (whole-graph scheduling
    # wins — 0.393 vs 0.358 M deep; conv sweep).  Plain fp32 (single bf16
    # pass) keeps XLA — unmeasured corner with no production use.
    # Mirrors registry._resolve_backend.
    import jax

    platform = jax.devices()[0].platform.lower()
    if "tpu" not in platform and "axon" not in platform:
        # off-TPU, pallas means interpret mode (orders slower) — mirror
        # registry._resolve_backend's platform guard
        return "xla"
    return winner_table(metric, precision, arch)


def winner_table(metric: str, precision: str, arch: str = "dense") -> str:
    """The measured-winner table itself (no platform guard) — see
    resolve_best for the measurements behind it."""
    if metric == "synth":
        return "pallas"
    if arch != "dense":
        return "xla"
    if precision in ("bfloat16", "high", "highest"):
        return "pallas"
    return "xla"


# The matrix: every BASELINE.json headline configuration, in
# FAMILY-PRIORITY order: the dense bf16 headline pair first (they carry
# the driver headline), then one config per remaining family (deep,
# conv1d, synth×2) so a tight budget still yields evidence for every
# BASELINE.json config, and only then the dense precision-tier
# refinements and the giant-batch run.  Round 3 ran dense tiers first and
# starved deep/conv1d/synth — never again.  conv1d/deep default to their
# measured-best backend (XLA — see docs/PERF.md conv/deep sections;
# backend=pallas routes conv to XLA anyway, models/registry.py:104); a
# deep pallas refinement at the tail keeps that verdict freshly paired.
MATRIX = [
    # --- headline pair ---
    {"name": "dense_bf16_pallas", "arch": "dense", "batch": 4096,
     "precision": "bfloat16", "backend": "pallas"},
    {"name": "dense_bf16_xla", "arch": "dense", "batch": 4096,
     "precision": "bfloat16", "backend": "xla"},
    # --- one per family (BASELINE.json configs #3, #4, #5) ---
    {"name": "deep_bf16_xla", "arch": "deep", "batch": 4096,
     "precision": "bfloat16", "backend": "xla", "steps": 5},
    {"name": "conv1d_bf16_xla", "arch": "conv1d", "batch": 4096,
     "precision": "bfloat16", "backend": "xla", "steps": 5},
    {"name": "synth_bf16", "metric": "synth", "precision": "bfloat16",
     "backend": "pallas", "batch": 4096},
    {"name": "synth_int8", "metric": "synth", "precision": "bfloat16",
     "backend": "pallas", "batch": 4096, "quantize": True},
    # --- resident epochs through the REAL CLI driver (VERDICT r4 item 4:
    # driver-captured e2e + boundary-free direct figures).  The direct run
    # disables checkpoints and spans 320 epochs so the steady window covers
    # four chained 64-epoch dispatches (pure device rate); the e2e run
    # checkpoints every 20 epochs — through the tunnel its steady figure is
    # LINK-bound (state bytes per boundary >> link_bw x compute/interval;
    # see docs/PERF.md), so read it next to boundary_io_s, not as an MFU.
    {"name": "resident_block_direct", "metric": "resident", "batch": 4096,
     "precision": "bfloat16", "backend": "best", "shuffle": "block",
     "interval": 0, "epochs": 320},
    {"name": "resident_block_e2e", "metric": "resident", "batch": 4096,
     "precision": "bfloat16", "backend": "best", "shuffle": "block",
     "interval": 20, "epochs": 60},
    # --- refinements: dense precision tiers ---
    {"name": "dense_high_pallas", "arch": "dense", "batch": 4096,
     "precision": "high", "backend": "pallas"},
    {"name": "dense_high_xla", "arch": "dense", "batch": 4096,
     "precision": "high", "backend": "xla"},
    {"name": "dense_highest_pallas", "arch": "dense", "batch": 4096,
     "precision": "highest", "backend": "pallas"},
    {"name": "dense_highest_xla", "arch": "dense", "batch": 4096,
     "precision": "highest", "backend": "xla"},
    # deep pallas pairing (keeps the deep backend=xla default evidenced)
    {"name": "deep_bf16_pallas", "arch": "deep", "batch": 4096,
     "precision": "bfloat16", "backend": "pallas", "steps": 5},
    # conv1d at batch 8192 (VERDICT r4 item 7): do the bandwidth-bound
    # boundary layers amortize at larger batch, the way the dense family
    # gained at larger µbatch tiles?  Per-layer roofline says no (the
    # boundary convs are bandwidth-bound per FRAME, and batch scales
    # bytes with FLOPs) — this row replaces that prediction with a
    # measurement.
    {"name": "conv1d_bf16_xla_8192", "arch": "conv1d", "batch": 8192,
     "precision": "bfloat16", "backend": "xla", "steps": 5},
    # giant batch: pallas.  An early round-3 pair read "pallas 4.11 M vs
    # xla 4.63 M — the scan overlaps better under XLA"; re-paired on a
    # healthy link the verdict flipped (same-session: pallas 4.83 M @
    # 84.9% MFU vs xla 4.80 M; monolithic batch-8192 pallas 4.78 vs xla
    # 4.65) — the 4.11 reading was degraded-day noise, and the larger
    # µbatch tiles lift MFU above the 4096 configs for BOTH backends.
    # chain 8: a giant step is ~28 ms of device time, so chain-4 windows
    # left a ~15% dispatch tail (measured 4.23 M vs 4.6 M chained deeper).
    # Last on purpose: its 900 s timeout is the matrix's biggest budget
    # hazard, and it refines a family already covered by the headline.
    {"name": "dense_bf16_giant_batch", "arch": "dense", "batch": 131072,
     "precision": "bfloat16", "backend": "pallas", "microbatch": 8192,
     "chain": 8, "steps": 3, "timeout": 900},
]

# Subprocess grouping (round 4): one subprocess per GROUP, not per config
# — measured ~2-4 min of fixed cost per subprocess through the axon
# tunnel (interpreter + jax import + tunnel bring-up + cache-fetch round
# trips) dwarfs the actual timed windows (seconds).  Groups keep the
# family-priority order; the resident pair and the giant-batch run are
# isolated because they are the long/hazardous ones (a lost tunnel RPC
# kills only their group, and partial group output is salvaged + retried
# per-config).
GROUPS = [
    ["dense_bf16_pallas", "dense_bf16_xla"],
    ["deep_bf16_xla", "conv1d_bf16_xla", "synth_bf16", "synth_int8"],
    ["resident_block_direct", "resident_block_e2e"],
    ["dense_high_pallas", "dense_high_xla",
     "dense_highest_pallas", "dense_highest_xla", "deep_bf16_pallas",
     "conv1d_bf16_xla_8192"],
    ["dense_bf16_giant_batch"],
]
assert sorted(n for g in GROUPS for n in g) == \
    sorted(s["name"] for s in MATRIX), "GROUPS out of sync with MATRIX"


def _single_cmd(spec, args) -> list:
    cmd = [sys.executable, str(Path(__file__).resolve()), "--single",
           "--no-torch", "--no-parity",
           "--precision", spec["precision"],
           "--backend", spec.get("backend", "pallas"),
           "--batch", str(spec["batch"]),
           "--chain", str(spec.get("chain", args.chain)),
           "--steps", str(spec.get("steps", args.steps)),
           "--windows", str(args.windows)]
    if spec.get("metric") == "synth":
        cmd += ["--metric", "synth"]
        if spec.get("quantize"):
            cmd += ["--quantize"]
    elif spec.get("metric") == "resident":
        cmd += ["--metric", "resident",
                "--shuffle", spec.get("shuffle", "block"),
                "--interval", str(spec.get("interval", 20)),
                "--epochs", str(spec.get("epochs", 60))]
    else:
        cmd += ["--arch", spec["arch"],
                "--microbatch", str(spec.get("microbatch", 0))]
    return cmd


def run_matrix(args) -> None:
    # Each config runs in its OWN subprocess with a hard timeout: an
    # axon-tunnel RPC that never returns (observed in the wild — a
    # device_get can block forever on a lost async compile) then costs one
    # config, not the whole matrix.  The remote compile cache is shared
    # across processes, so no compilation is repeated.
    import subprocess

    t0 = time.monotonic()
    configs, skipped = [], []
    side = Path(__file__).parent / "BENCH_MATRIX.json"

    def assemble(parity=None, partial=False):
        """One result shape for BOTH the incremental checkpoint and the
        final artifact (round-4 advisor finding: the committed matrix was
        a mid-run checkpoint in a different format, dropping the headline
        fields and the parity attestation)."""
        dense = [c for c in configs
                 if c.get("metric") == "train_frames_per_sec"
                 and c["name"] in ("dense_bf16_pallas", "dense_bf16_xla")
                 and "value" in c]
        headline = max(dense, key=lambda c: c["value"]) if dense else None
        # mid-run checkpoints only read the cached torch figure (cheap);
        # the final call may measure
        baseline = torch_baseline(
            4096, skip_measure=(partial or args.no_torch))
        result = {
            "metric": "train_frames_per_sec",
            "value": headline["value"] if headline else None,
            "unit": "frames/s",
            "vs_baseline": (round(headline["value"] / baseline, 2)
                            if headline and baseline else None),
            "backend": headline["backend"] if headline else None,
            "precision": headline["precision"] if headline else None,
            "batch": headline["batch"] if headline else None,
            "chain": headline.get("chain") if headline else None,
            "mfu": headline.get("mfu") if headline else None,
            "headline_config": headline["name"] if headline else None,
            "torch_cpu_frames_per_sec": baseline,
            "elapsed_s": round(time.monotonic() - t0, 1),
            "configs": configs,
        }
        if partial:
            result["partial"] = True
        if skipped:
            result["skipped"] = skipped
        if parity is not None:
            result["parity"] = parity
        return result

    def checkpoint_side():
        # incremental side-file: if the caller's timeout kills this run,
        # the measured prefix survives (and the repo carries the last
        # full matrix regardless of the driver's parser) — SAME shape as
        # the final artifact, marked "partial"
        try:
            side.write_text(json.dumps(assemble(partial=True), indent=1))
        except OSError:
            pass

    def budget_left() -> float:
        return args.budget - (time.monotonic() - t0)

    def run_json_subprocess(cmd, timeout, attempts=2):
        """Run a bench subprocess, parse its last stdout line as JSON.
        Returns (parsed|None, error|None).  Two attempts by default: the
        axon tunnel occasionally loses an async-compile RPC and the
        subprocess blocks forever in device_get — the retry hits the
        (process-independent) remote compile cache, so a second attempt is
        cheap and usually lands.  The timeout is clamped to the remaining
        budget so attempts and late stages can't run unboundedly past it
        (a caller that sized its kill-timeout to the budget would
        otherwise never see the headline line)."""
        err = "not run"
        for attempt in range(attempts):
            tmo = min(timeout, max(60.0, budget_left()))
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=tmo, cwd=Path(__file__).parent)
                line = proc.stdout.strip().splitlines()[-1] if \
                    proc.stdout.strip() else ""
                if proc.returncode == 0 and line.startswith("{"):
                    return json.loads(line), None
                err = (proc.stderr or proc.stdout)[-300:]
            except subprocess.TimeoutExpired:
                err = f"timeout after {tmo:.0f}s (attempt {attempt + 1})"
            except Exception as e:  # noqa: BLE001 — keep the headline
                err = str(e)[:300]
            if budget_left() <= 0:
                break
        return None, err

    def run_group_subprocess(names, timeout):
        """One grouped subprocess; returns {spec_name: result|{'error'}}
        from whatever JSON lines it printed — on timeout the completed
        prefix is salvaged from TimeoutExpired's captured output."""
        cmd = [sys.executable, str(Path(__file__).resolve()),
               "--group", ",".join(names),
               "--chain", str(args.chain), "--steps", str(args.steps),
               "--windows", str(args.windows)]
        out = ""
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout,
                                  cwd=Path(__file__).parent)
            out = proc.stdout or ""
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"")
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
        except Exception:  # noqa: BLE001 — per-config retry covers it
            out = ""
        results = {}
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if "spec" in d:
                    results[d.pop("spec")] = d
        return results

    by_name = {s["name"]: s for s in MATRIX}

    def record(spec, sub, err):
        entry = {"name": spec["name"],
                 "backend": spec.get("backend", "pallas"),
                 "precision": spec["precision"],
                 "batch": spec["batch"]}
        if sub is None:
            entry["error"] = err
        else:
            entry.update(metric=sub["metric"], value=sub["value"],
                         unit=sub["unit"], chain=sub.get("chain"))
            # resident entries carry their own diagnostics — without the
            # boundary-I/O breakdown and link-bound note, the e2e row
            # reads as a 15x regression next to the direct row instead of
            # a tunnel-drain figure (exactly the misreading the fields
            # were added to prevent)
            for k in ("steady_e2e", "steady_e2e_ex_io", "warm_window_max",
                      "warm_window_median", "windows", "boundary_io_s",
                      "wall_s_incl_compile", "drained_MB", "link_MBps",
                      "epochs", "shuffle", "checkpoint_interval", "note",
                      "mfu"):
                if sub.get(k) is not None:
                    entry[k] = sub[k]
            if spec.get("quantize"):
                entry["precision"] = "int8"
            if "microbatch" in spec:
                entry["microbatch"] = spec["microbatch"]
            if (sub["metric"] == "train_frames_per_sec"
                    and spec["precision"] == "bfloat16"):
                entry["mfu"] = round(
                    sub["value"] * flops_per_frame(spec["arch"])
                    / V5E_BF16_PEAK, 3)
        configs.append(entry)
        print(f"# {entry}", file=sys.stderr, flush=True)
        checkpoint_side()

    for group in GROUPS:
        if budget_left() <= 0:
            skipped.extend({"name": n, "reason": "time budget"}
                           for n in group)
            continue
        specs = [by_name[n] for n in group]
        # group timeout: fixed bring-up once + per-config timed share;
        # the per-config fallback below still has each spec's own timeout
        tmo = min(sum(s.get("timeout", args.config_timeout)
                      for s in specs),
                  max(60.0, budget_left()))
        got = run_group_subprocess(group, tmo)
        for spec in specs:
            sub = got.get(spec["name"])
            if sub is not None and "error" not in sub:
                record(spec, sub, None)
                continue
            # missing or errored inside the group: one isolated retry
            if budget_left() <= 0:
                skipped.append({"name": spec["name"],
                                "reason": "time budget"})
                continue
            err0 = (sub or {}).get("error", "missing from group output")
            sub2, err = run_json_subprocess(
                _single_cmd(spec, args),
                spec.get("timeout", args.config_timeout), attempts=1)
            record(spec, sub2, f"group: {err0}; retry: {err}"
                   if sub2 is None else None)

    parity = None
    if not args.no_parity:
        # subprocess + timeout like every other device-touching stage: a
        # lost tunnel RPC in an in-process parity_check would hang the
        # parent AFTER all measurements completed and the driver would
        # never see the headline line
        parity_cmd = [sys.executable, str(Path(__file__).resolve()),
                      "--parity-only"]
        parity, err = run_json_subprocess(parity_cmd, args.config_timeout)
        if parity is None:
            parity = {"error": err}
    # headline candidates: the two batch-4096 dense configs ONLY — the
    # giant-batch entry (startswith would match it) runs a different
    # chain/microbatch context and its vs_baseline denominator is the
    # batch-4096 torch number (see assemble)
    result = assemble(parity=parity)
    try:
        side.write_text(json.dumps(result, indent=1))
    except OSError:
        pass
    print(json.dumps(result))
    # Compact trailing summary — the LAST stdout line, < ~1 KB.  The
    # driver captures a bounded tail of stdout: round 4's full-matrix
    # line outgrew that window and the official record lost the headline
    # (BENCH_r04.json parsed: null).  This line always fits, repeats the
    # headline fields, and summarizes each config as name: value so the
    # artifact is self-contained; the full matrix lives one line up and
    # in BENCH_MATRIX.json.
    compact = {k: result.get(k) for k in (
        "metric", "value", "unit", "vs_baseline", "backend", "precision",
        "batch", "mfu", "headline_config", "torch_cpu_frames_per_sec",
        "elapsed_s")}
    if isinstance(parity, dict):
        compact["parity_loss_delta"] = parity.get("pallas_vs_xla_loss_delta")
    compact["configs_summary"] = {
        c["name"]: (c["value"] if "value" in c else "error")
        for c in configs}
    if skipped:
        compact["n_skipped"] = len(skipped)
    compact["full_matrix"] = "BENCH_MATRIX.json"
    print(json.dumps(compact))


def single_result(args) -> dict:
    """One configuration's result dict (what ``--single`` prints).  Shared
    by ``run_single`` and the in-process ``--group`` runner — grouping
    amortizes the fixed per-subprocess cost (interpreter + jax import +
    axon tunnel bring-up + compile-cache fetch round trips, ~1-3 min each
    warm) that starved the round-3 matrix."""
    backend = (resolve_best(args.metric, args.precision, args.arch)
               if args.backend == "best" else args.backend)
    if args.metric == "resident":
        stats = bench_resident(args.precision, args.shuffle, args.interval,
                               epochs=args.epochs, backend=args.backend)
        value = stats.pop("value")
        if args.interval:
            # the with-checkpoints figure is LINK-bound through the axon
            # tunnel: each boundary drains the full train state over an
            # ~18 MB/s hop, so steady e2e reads 10-30x below the same
            # protocol on local PCIe (where the fetch hides behind the
            # next group's compute).  warm_window_max is the device-bound
            # figure; docs/PERF.md "Checkpoint-boundary host I/O"
            # quantifies the floor.
            stats["note"] = ("e2e includes checkpoint-boundary state "
                             "drains; axon-tunnel link-bound — see "
                             "docs/PERF.md 'Checkpoint-boundary host I/O'")
        return {
            "metric": "resident_epoch_frames_per_sec",
            "value": round(value, 1),
            "unit": "frames/s",
            "vs_baseline": None,
            "backend": args.backend,
            "precision": args.precision,
            "batch": 4096,
            "mfu": (round(value * flops_per_frame("dense") / V5E_BF16_PEAK,
                          3) if args.precision == "bfloat16" else None),
            **stats,
        }
    if args.metric == "synth":
        rtf, synth_chain = bench_synth(args.batch, args.steps,
                                       args.precision, backend,
                                       quantize=args.quantize,
                                       windows=args.windows)
        return {
            "metric": "realtime_synth_factor",
            "value": round(rtf, 1),
            "unit": "x_realtime",
            "vs_baseline": round(rtf, 1),  # baseline = 1.0 (real time)
            "backend": backend,
            "precision": "int8" if args.quantize else args.precision,
            "batch": args.batch,
            "chain": synth_chain,
        }

    fps = bench_jax(args.arch, args.batch, args.steps, args.precision,
                    backend, microbatch=args.microbatch, chain=args.chain,
                    windows=args.windows)
    # the torch-CPU denominator is the dense 1024/2048/256 reference model
    # — a deep/conv1d rate divided by it would be a meaningless ratio
    baseline = (torch_baseline(args.batch, skip_measure=args.no_torch)
                if args.arch == "dense" else None)
    result = {
        "metric": "train_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "backend": backend,
        "precision": args.precision,
        "batch": args.batch,
        "chain": args.chain,
        "mfu": (round(fps * flops_per_frame(args.arch) / V5E_BF16_PEAK, 3)
                if args.precision == "bfloat16" else None),
    }
    if not args.no_parity:
        if args.arch != "dense":
            # parity_check attests the DENSE pallas-vs-xla step; reporting
            # it under a deep/conv1d line would mislabel the evidence
            result["parity"] = {"skipped": "dense-only attestation"}
        else:
            try:
                result["parity"] = {
                    "pallas_vs_xla_loss_delta": parity_check(args.batch,
                                                             args.precision),
                }
            except Exception as e:  # noqa: BLE001
                result["parity"] = {"error": str(e)[:200]}
    return result


def run_single(args) -> None:
    print(json.dumps(single_result(args)))


def check_docs(tolerance: float = 0.15) -> list:
    """Mechanical doc-drift check (VERDICT r4 item 6): every README
    performance-table row tagged with a BENCH_MATRIX.json config name must
    quote a value within ``tolerance`` of the committed capture.  Returns a
    list of failure strings (empty = docs match the matrix).  Round 4 shipped
    a README claiming 4.65 M / +2.9% next to a committed matrix saying
    4.55 M / +1.0% with nothing to catch the drift — this closes that."""
    import re

    root = Path(__file__).resolve().parent
    matrix = json.loads((root / "BENCH_MATRIX.json").read_text())
    values = {c["name"]: c.get("value") for c in matrix.get("configs", [])}
    failures, checked = [], 0
    num_re = re.compile(
        r"([\d.]+)\s*([Mk])\s*(?:frames/s|[×x]\s*real\s*time)")
    for n, line in enumerate((root / "README.md").read_text().splitlines(),
                             start=1):
        if not line.startswith("|"):
            continue
        tags = [t for t in re.findall(r"`([a-z0-9_]+)`", line)
                if t in values]
        if not tags:
            continue
        tag = tags[0]
        if values[tag] is None:
            failures.append(f"README.md:{n} `{tag}`: matrix row has no value")
            continue
        m = num_re.search(line)
        if not m:
            failures.append(
                f"README.md:{n} `{tag}`: no parseable 'N M/k frames/s' or "
                f"'N k× real time' quantity in the row")
            continue
        claimed = float(m.group(1)) * (1e6 if m.group(2) == "M" else 1e3)
        actual = float(values[tag])
        drift = abs(claimed - actual) / actual
        checked += 1
        if drift > tolerance:
            failures.append(
                f"README.md:{n} `{tag}`: claims {claimed:,.0f} but "
                f"BENCH_MATRIX.json says {actual:,.0f} "
                f"({drift:.0%} > {tolerance:.0%} drift)")
    if checked < 8:
        failures.append(
            f"only {checked} tagged README rows checked (expected >= 8) — "
            f"the config tags in the performance table went missing")
    return failures


def _spec_args(spec: dict, args):
    """argparse.Namespace for one MATRIX spec — the in-process mirror of
    ``_single_cmd`` (keep the two in sync)."""
    import copy

    a = copy.copy(args)
    a.single = True
    a.no_torch = True
    a.no_parity = True
    a.precision = spec["precision"]
    a.backend = spec.get("backend", "pallas")
    a.batch = spec["batch"]
    a.chain = spec.get("chain", args.chain)
    a.steps = spec.get("steps", args.steps)
    a.metric = spec.get("metric", "train")
    a.quantize = bool(spec.get("quantize"))
    a.shuffle = spec.get("shuffle", "block")
    a.interval = spec.get("interval", 20)
    a.epochs = spec.get("epochs", 60)
    a.arch = spec.get("arch", "dense")
    a.microbatch = spec.get("microbatch", 0)
    return a


def run_group(args) -> None:
    """Run several MATRIX configs sequentially IN ONE PROCESS, one JSON
    line per config (flushed as each lands, so a killed group still
    yields its completed prefix to the parent).  Sharing the process
    amortizes interpreter + jax import + axon tunnel bring-up across the
    group — the fixed cost that made round 3's one-subprocess-per-config
    matrix starve its own budget."""
    by_name = {s["name"]: s for s in MATRIX}
    for name in args.group.split(","):
        spec = by_name.get(name)
        if spec is None:
            print(json.dumps({"spec": name, "error": "unknown config"}),
                  flush=True)
            continue
        try:
            res = single_result(_spec_args(spec, args))
            print(json.dumps({"spec": name, **res}), flush=True)
        except Exception as e:  # noqa: BLE001 — next config still runs
            print(json.dumps({"spec": name, "error": str(e)[:300]}),
                  flush=True)


def main() -> None:
    # Persistent XLA compilation cache, shared by the matrix subprocesses
    # (they inherit the env).  Verified to work through the axon tunnel:
    # a cold compile+run of a test graph took 85 s, the cached second run
    # 34 s, with the serialized executable written under .jax_cache/.
    # Round 3's matrix paid ~50 s first-compile per subprocess and ran out
    # of budget; with this cache the driver's end-of-round run hits the
    # executables this session already built.  jax reads the env var
    # natively — set it before any jax import (all imports are lazy).
    import os
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path(__file__).resolve().parent / ".jax_cache"))
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true",
                    help="one configuration instead of the default matrix")
    ap.add_argument("--group", type=str, default="",
                    help="comma-separated MATRIX config names to run "
                         "sequentially in THIS process, one JSON line "
                         "each (run_matrix's amortized subprocess unit)")
    ap.add_argument("--check-docs", action="store_true",
                    help="cross-check README's tagged performance table "
                         "against the committed BENCH_MATRIX.json; exit "
                         "nonzero on >15%% drift (no device work)")
    ap.add_argument("--parity-only", action="store_true",
                    help="print the pallas-vs-xla loss-delta JSON and exit "
                         "(run_matrix's subprocess-isolated attestation)")
    ap.add_argument("--arch", type=str, default="dense",
                    choices=["dense", "deep", "conv1d"])
    ap.add_argument("--steps", type=int, default=10,
                    help="timed dispatches per window")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--backend", type=str, default="best",
                    help="best (measured winner per tier) | xla | pallas")
    ap.add_argument("--no-torch", action="store_true")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the on-device pallas-vs-xla attestation")
    ap.add_argument("--quantize", action="store_true",
                    help="synth metric: int8 weight-only Pallas decode")
    ap.add_argument("--chain", type=int, default=100,
                    help="optimizer steps per dispatch (lax.scan)")
    ap.add_argument("--windows", type=int, default=3,
                    help="timed windows; the best is reported")
    ap.add_argument("--microbatch", type=int, default=0,
                    help="gradient-accumulation microbatch size")
    ap.add_argument("--metric", type=str, default="train",
                    choices=["train", "synth", "resident"])
    ap.add_argument("--shuffle", type=str, default="block",
                    help="resident metric: resident_shuffle mode")
    ap.add_argument("--interval", type=int, default=20,
                    help="resident metric: checkpoint interval "
                         "(0 = boundary-free 'direct' run)")
    ap.add_argument("--epochs", type=int, default=60,
                    help="resident metric: epochs over the synthetic corpus")
    ap.add_argument("--budget", type=float, default=2400.0,
                    help="matrix mode: wall-clock budget in seconds")
    ap.add_argument("--config-timeout", type=float, default=420.0,
                    help="matrix mode: hard per-config subprocess timeout")
    args = ap.parse_args()
    if args.check_docs:
        failures = check_docs()
        for f in failures:
            print(f, file=sys.stderr)
        print(json.dumps({"doc_drift_failures": len(failures)}))
        sys.exit(1 if failures else 0)
    if args.parity_only:
        print(json.dumps({
            "pallas_vs_xla_loss_delta": parity_check(args.batch,
                                                     args.precision),
        }))
        return
    if args.group:
        run_group(args)
        return
    # any targeting flag implies single-config mode — `bench.py --backend
    # pallas` should measure that config, not the whole matrix
    targeted = (args.single or args.metric != "train"
                or args.backend != "best" or args.precision != "bfloat16"
                or args.batch != 4096 or args.arch != "dense"
                or args.microbatch or args.quantize)
    if targeted:
        run_single(args)
    else:
        run_matrix(args)


if __name__ == "__main__":
    main()
