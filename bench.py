#!/usr/bin/env python
"""Benchmark harness.

Measures training throughput (frames/sec) of the TPU-native jitted train step
at the reference's practical configuration — dense VAE 1024/2048/256, batch
4096 (kelsey_iterable.ini:36) — against the PyTorch-CPU baseline defined by
BASELINE.json ("≥10× PyTorch-CPU train.py frames/sec"): the same architecture,
loss and Adam step executed the way the reference's training loop does
(train.py:179-196).

Prints ONE JSON line (self-describing per VERDICT r1 item 2/7):
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
     "backend": "...", "precision": "...", "batch": N, "chain": N,
     "mfu": N, "parity": {"pallas_vs_xla_loss_delta": N}}

Flags:
    --steps N        timed dispatches per window (default 10)
    --chain N        optimizer steps per dispatch (default 100)
    --batch N        batch size (default 4096)
    --precision P    highest | high | float32 | bfloat16 (default bfloat16)
    --backend B      best (default: fastest measured config per tier —
                     xla, except pallas at precision=highest) | xla | pallas
    --no-torch       skip the torch baseline (vs_baseline falls back to a
                     cached measurement if present)
    --no-parity      skip the on-device pallas-vs-xla loss attestation
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


def bench_jax(batch_size: int, steps: int, precision: str, backend: str,
              microbatch: int = 0, chain: int = 100,
              windows: int = 3) -> float:
    """``chain`` > 1 runs that many optimizer steps per dispatch inside one
    jitted lax.scan — the measurement then reflects device throughput even
    when host→device dispatch latency is high (the axon tunnel's round-trip
    fluctuates between ~0.5 and ~5 ms, which would otherwise dominate a
    ~0.9 ms step).  The result is the best of ``windows`` timed windows:
    the device's steady-state rate is stable, so the max filters host/tunnel
    noise the same way the torch denominator's best-of-3 does."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.vae.n_units = UNITS
    cfg.vae.latent_dim = LATENT
    cfg.vae.kl_beta = KL_BETA
    cfg.training.learning_rate = LR
    cfg.training.batch_size = batch_size
    cfg.tpu.precision = precision
    cfg.tpu.backend = backend
    cfg.tpu.microbatch_size = microbatch

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
    batch = jnp.asarray(rng.uniform(-1, 1, (batch_size, SEG)).astype(np.float32))

    # warmup: compile + steady steps.  Must FETCH a value: through the axon
    # tunnel, compilation is asynchronous and block_until_ready can return
    # before it finishes, which would put the compile inside the timed region.
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
                backend: str, quantize: bool = False):
    """Real-time synthesis factor (BASELINE.json "metric"): how many seconds
    of 44.1 kHz audio the decode path (latent → waveform) produces per
    wall-clock second, measured on device-resident latents.  Returns
    ``(factor, chain_used)``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model

    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.vae.n_units = UNITS
    cfg.vae.latent_dim = LATENT
    cfg.tpu.precision = precision
    cfg.tpu.backend = backend
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
    # metric): per-dispatch tunnel latency otherwise dominates and the
    # figure measures the link, not the chip.  The 1e-30 feedback keeps
    # the loop un-hoistable; its cost is negligible next to the GEMMs.
    # --steps below 50 is raised to keep the dispatch amortized; the JSON
    # line reports the chain actually used.
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
    for _ in range(3):
        t0 = time.perf_counter()
        out = decode_chain(z)
        float(jax.device_get(out[0, 0]))
        best = min(best, time.perf_counter() - t0)
    samples_per_sec = batch_size * SEG * chain / best
    return samples_per_sec / 44100.0, chain


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
    # best-of-3 repeats: the denominator of vs_baseline should be torch's
    # BEST case, so host-load dips can only make our reported speedup
    # smaller (conservative), never larger
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            one_step()
        dt = time.perf_counter() - t0
        best = max(best, batch_size * steps / dt)
    return best


def parity_check(batch_size: int, precision: str) -> float:
    """On-device Pallas-vs-XLA loss attestation (VERDICT r1 item 7).

    Runs ONE identical train step per backend — same init, same batch, same
    fold_in key — in compiled mode on whatever jax.devices() gives (the real
    TPU under the driver), and returns |loss_pallas − loss_xla|.  This makes
    compiled-mode kernel correctness driver-visible every bench run; the CPU
    test suite only ever exercises the kernels in interpret mode.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.uniform(-1, 1, (batch_size, SEG)).astype(np.float32)
    )
    losses = {}
    for backend in ("xla", "pallas"):
        cfg = Config()
        cfg.audio.segment_length = SEG
        cfg.vae.n_units = UNITS
        cfg.vae.latent_dim = LATENT
        cfg.vae.kl_beta = KL_BETA
        cfg.training.learning_rate = LR
        cfg.training.batch_size = batch_size
        cfg.tpu.precision = precision
        cfg.tpu.backend = backend
        model = build_model(cfg)
        opt = build_optimizer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        state = TrainState.create(params, opt.init(params), seed=0)
        step = build_train_step(model, cfg, opt, donate=False)
        # several optimizer steps so kernel-numeric differences compound
        # through Adam before the comparison
        for _ in range(5):
            state, m = step(state, batch)
        losses[backend] = float(jax.device_get(m["loss"]))
    return abs(losses["pallas"] - losses["xla"])


def model_flops_per_frame() -> float:
    """Train-step FLOPs per frame: 4 forward GEMMs (SURVEY §3.3) × 3 for
    fwd+bwd (dx and dW each re-run the GEMM volume)."""
    fwd = 2.0 * (SEG * UNITS + 2 * UNITS * LATENT + LATENT * UNITS
                 + UNITS * SEG)
    return 3.0 * fwd


V5E_BF16_PEAK = 197e12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10,
                    help="timed dispatches per window")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--backend", type=str, default="best",
                    help="best (default; resolves to the fastest measured "
                         "config per tier: xla, except pallas at "
                         "precision=highest) | xla | pallas")
    ap.add_argument("--no-torch", action="store_true")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the on-device pallas-vs-xla attestation")
    ap.add_argument("--quantize", action="store_true",
                    help="synth metric: int8 weight-only Pallas decode")
    ap.add_argument("--chain", type=int, default=100,
                    help="optimizer steps per dispatch (lax.scan); "
                         "amortizes host dispatch latency")
    ap.add_argument("--windows", type=int, default=3,
                    help="timed windows; the best is reported")
    ap.add_argument("--microbatch", type=int, default=0,
                    help="gradient-accumulation microbatch size (lets the "
                         "reference default batch 131072 run on one chip)")
    ap.add_argument("--metric", type=str, default="train",
                    choices=["train", "synth"],
                    help="train = frames/sec of the jitted train step; "
                         "synth = real-time synthesis factor of decode")
    args = ap.parse_args()
    # "best": measured steady-state winner per tier (docs/PERF.md).  Since
    # the round-3 fused backward (dh/dh3 in-register, dx dead-code-
    # eliminated like XLA's autodiff), Pallas leads every tier it
    # implements: bf16 4.65 vs 4.52 M frames/s, fp32 "high" 1.744 vs
    # 1.733 M, "highest" +11%, int8/synth (Pallas-only paths).  Plain
    # fp32 (single bf16 pass) keeps XLA — unmeasured corner with no
    # production use (bf16 dominates it in both speed and memory).
    if args.backend == "best":
        if args.metric == "synth" or args.precision in ("bfloat16", "high",
                                                        "highest"):
            backend = "pallas"
        else:
            backend = "xla"
    else:
        backend = args.backend

    if args.metric == "synth":
        rtf, synth_chain = bench_synth(args.batch, args.steps,
                                       args.precision, backend,
                                       quantize=args.quantize)
        print(json.dumps({
            "metric": "realtime_synth_factor",
            "value": round(rtf, 1),
            "unit": "x_realtime",
            "vs_baseline": round(rtf, 1),  # baseline = 1.0 (real time)
            "backend": backend,
            "precision": "int8" if args.quantize else args.precision,
            "batch": args.batch,
            "chain": synth_chain,
        }))
        return

    fps = bench_jax(args.batch, args.steps, args.precision, backend,
                    microbatch=args.microbatch, chain=args.chain,
                    windows=args.windows)

    # The cache keeps the high-water torch rate per batch size so the
    # denominator is pinned: a loaded host can only lower our reported
    # speedup, never raise it.
    cached = None
    if CACHE.exists():
        rec = json.loads(CACHE.read_text())
        if rec.get("batch") == args.batch:
            cached = rec.get("torch_cpu_frames_per_sec")
    baseline = None
    if not args.no_torch:
        try:
            baseline = bench_torch_cpu(args.batch)
            if cached:
                baseline = max(baseline, cached)
            CACHE.write_text(json.dumps(
                {"torch_cpu_frames_per_sec": baseline, "batch": args.batch}
            ))
        except Exception as e:  # noqa: BLE001
            print(f"torch baseline failed: {e}", file=sys.stderr)
    if baseline is None:
        baseline = cached

    result = {
        "metric": "train_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "backend": backend,
        "precision": args.precision,
        "batch": args.batch,
        "chain": args.chain,
        # MFU against v5e's 197 TFLOPS bf16 peak; only meaningful when the
        # MXU runs single-pass bf16
        "mfu": (round(fps * model_flops_per_frame() / V5E_BF16_PEAK, 3)
                if args.precision == "bfloat16" else None),
    }
    if not args.no_parity:
        # never lose the measured headline to an attestation failure —
        # report the error in-band instead
        try:
            result["parity"] = {
                "pallas_vs_xla_loss_delta": parity_check(args.batch,
                                                         args.precision),
            }
        except Exception as e:  # noqa: BLE001
            result["parity"] = {"error": str(e)[:200]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
