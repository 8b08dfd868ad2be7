#!/usr/bin/env python
"""Reference-scale quality parity study (VERDICT r2 item 4).

Trains the REAL hyperparameters — segment 1024, hidden 2048, latent 256,
batch 4096, lr 1e-4, kl_beta 1e-4 (reference default.ini:5,18-19,26 /
kelsey_iterable.ini:22-36) — for a real budget (>=5000 optimizer steps) on a
multi-minute deterministic synthetic corpus, once through the re-typed torch
loop (the reference's own architecture/loss/Adam, rawvae/model.py:13-46 +
train.py:179-196) and once through this framework's train step, and records
loss curves plus held-out reconstruction MSE (deterministic decode at z=mu).

The two sides see the SAME corpus and the SAME train/held-out split; data
order and init RNG differ (quality parity is about converged reconstruction
error, not bit replay — bit replay at matched init is tests/
test_training_parity.py's job).

Usage (each side writes one JSON file):
    python benchmarks/quality_parity.py --side torch --steps 5000 \
        --out qp_torch.json
    python benchmarks/quality_parity.py --side jax --precision bfloat16 \
        --steps 5000 --out qp_jax_bf16.json

Results land in docs/QUALITY.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SEG, UNITS, LATENT = 1024, 2048, 256
KL_BETA, LR, BATCH = 1e-4, 1e-4, 4096
HOP = 128
SR = 44100
CORPUS_SECONDS = 300          # 5 minutes -> ~99k train frames
HELDOUT_SECONDS = 15          # tail region reserved for eval
EVAL_FRAMES = 4096


def make_corpus(seconds: int = CORPUS_SECONDS + HELDOUT_SECONDS,
                seed: int = 0) -> np.ndarray:
    """Deterministic 'musical' corpus: per-second random 3-partial chords
    with exponential decay envelopes plus low-level noise — structured
    enough that a VAE materially beats predicting the mean, varied enough
    that it cannot memorize."""
    rng = np.random.default_rng(seed)
    t = np.arange(SR) / SR
    out = np.empty(seconds * SR, np.float32)
    for s in range(seconds):
        f0 = float(rng.uniform(80.0, 1200.0))
        seg = np.zeros(SR, np.float64)
        for k in range(3):
            f = f0 * (k + 1) * float(rng.uniform(0.99, 1.01))
            amp = 0.5 / (k + 1) * float(rng.uniform(0.5, 1.0))
            phase = float(rng.uniform(0, 2 * np.pi))
            seg += amp * np.sin(2 * np.pi * f * t + phase)
        env = np.exp(-t / float(rng.uniform(0.2, 1.0)))
        seg = seg * env + rng.normal(0.0, 0.01, SR)
        peak = np.abs(seg).max()
        out[s * SR:(s + 1) * SR] = (0.7 * seg / max(peak, 1e-9)).astype(
            np.float32)
    return out


def frame_matrix(corpus: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(train_frames, heldout_frames) — overlapping seg/hop windows; the
    held-out frames come from the corpus tail the train side never sees."""
    split = CORPUS_SECONDS * SR
    train_sig, held_sig = corpus[:split], corpus[split:]

    def frames(sig):
        n = (len(sig) - SEG) // HOP + 1
        idx = np.arange(n)[:, None] * HOP + np.arange(SEG)[None, :]
        return sig[idx]

    tf = frames(train_sig)
    hf = frames(held_sig)
    rng = np.random.default_rng(123)
    hf = hf[rng.permutation(len(hf))[:EVAL_FRAMES]]
    return np.ascontiguousarray(tf), np.ascontiguousarray(hf)


def run_torch(steps: int, eval_every: int, log_every: int,
              order_seed: int = 1) -> dict:
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

        def encode(self, x):
            h1 = torch.relu(self.fc1(x))
            return self.fc21(h1), self.fc22(h1)

        def decode(self, z):
            return torch.tanh(self.fc4(torch.relu(self.fc3(z))))

        def forward(self, x):
            mu, logvar = self.encode(x)
            std = torch.exp(0.5 * logvar)
            z = mu + torch.randn_like(std) * std
            return self.decode(z), mu, logvar

    corpus = make_corpus()
    train_f, held_f = frame_matrix(corpus)
    xt = torch.from_numpy(train_f)
    xh = torch.from_numpy(held_f)
    model = RefVAE()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR)
    order_rng = np.random.default_rng(order_seed)

    def eval_mse():
        with torch.no_grad():
            total, n = 0.0, 0
            for i in range(0, len(xh), BATCH):
                xb = xh[i:i + BATCH]
                mu, _ = model.encode(xb)
                recon = model.decode(mu)
                total += float(((recon - xb) ** 2).sum())
                n += xb.numel()
            return total / n

    loss_curve, eval_curve = [], []
    step = 0
    t0 = time.time()
    while step < steps:
        perm = order_rng.permutation(len(xt))
        for i in range(0, len(xt) - BATCH + 1, BATCH):
            xb = xt[perm[i:i + BATCH]]
            optimizer.zero_grad()
            recon, mu, logvar = model(xb)
            loss = torch.nn.functional.mse_loss(recon, xb) + KL_BETA * (
                -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
            )
            loss.backward()
            optimizer.step()
            step += 1
            if step % log_every == 0:
                loss_curve.append([step, float(loss.item())])
            if step % eval_every == 0 or step == steps:
                m = eval_mse()
                eval_curve.append([step, m])
                el = time.time() - t0
                print(f"torch step {step}/{steps} loss={float(loss):.6f} "
                      f"eval_mse={m:.6f} ({el:.0f}s)", flush=True)
            if step >= steps:
                break
    return {
        "side": "torch", "precision": "float32", "steps": steps,
        "frames_per_sec": steps * BATCH / (time.time() - t0),
        "loss_curve": loss_curve, "eval_curve": eval_curve,
        "final_eval_mse": eval_curve[-1][1],
    }


def run_jax(steps: int, eval_every: int, log_every: int,
            precision: str, order_seed: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = HOP
    cfg.vae.n_units = UNITS
    cfg.vae.latent_dim = LATENT
    cfg.vae.kl_beta = KL_BETA
    cfg.training.learning_rate = LR
    cfg.training.batch_size = BATCH
    cfg.tpu.precision = precision

    corpus = make_corpus()
    train_f, held_f = frame_matrix(corpus)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    dev_frames = jax.device_put(jnp.asarray(train_f, dtype))
    dev_held = jax.device_put(jnp.asarray(held_f, dtype))

    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    one_step = build_train_step(model, cfg, opt, donate=True)

    # frames/held passed as ARGUMENTS, not closed over: a closed-over
    # device array is embedded in the lowered module and the f32 matrix
    # (405 MB) blows the axon compile-RPC body limit (HTTP 413)
    @jax.jit
    def run_chunk(state, idx, frames):
        def body(s, ix):
            s, m = one_step(s, frames[ix])
            return s, m["loss"]
        return jax.lax.scan(body, state, idx)

    @jax.jit
    def eval_mse(params, held):
        mu, _ = model.encode(params, held)
        recon = model.decode(params, mu)
        d = recon.astype(jnp.float32) - held.astype(jnp.float32)
        return jnp.mean(d * d)

    order_rng = np.random.default_rng(order_seed)
    loss_curve, eval_curve = [], []
    step = 0
    t0 = time.time()
    chunk = eval_every
    pending_perm: list[np.ndarray] = []
    while step < steps:
        if not pending_perm:
            perm = order_rng.permutation(len(train_f))
            n_b = len(train_f) // BATCH
            pending_perm = list(
                perm[: n_b * BATCH].reshape(n_b, BATCH)
            )
        take = min(chunk, steps - step, len(pending_perm))
        idx = jnp.asarray(np.stack(pending_perm[:take]))
        del pending_perm[:take]
        state, losses = run_chunk(state, idx, dev_frames)
        losses = np.asarray(jax.device_get(losses), np.float64)
        for j in range(take):
            if (step + j + 1) % log_every == 0:
                loss_curve.append([step + j + 1, float(losses[j])])
        step += take
        if step % eval_every == 0 or step >= steps:
            m = float(jax.device_get(eval_mse(state.params, dev_held)))
            eval_curve.append([step, m])
            print(f"jax[{precision}] step {step}/{steps} "
                  f"loss={float(losses[-1]):.6f} eval_mse={m:.6f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return {
        "side": "jax", "precision": precision, "steps": steps,
        "frames_per_sec": steps * BATCH / (time.time() - t0),
        "loss_curve": loss_curve, "eval_curve": eval_curve,
        "final_eval_mse": eval_curve[-1][1],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "jax"], required=True)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--order-seed", type=int, default=1,
                    help="data-order RNG seed (trajectory-noise probe)")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()
    if args.side == "torch":
        res = run_torch(args.steps, args.eval_every, args.log_every,
                        order_seed=args.order_seed)
    else:
        res = run_jax(args.steps, args.eval_every, args.log_every,
                      args.precision, order_seed=args.order_seed)
    Path(args.out).write_text(json.dumps(res))
    print(f"wrote {args.out}: final_eval_mse={res['final_eval_mse']:.6f}")


if __name__ == "__main__":
    main()
