"""Training-quality parity study (BASELINE.json: "reconstruction MSE parity
on the reference wav dataset" — the reference dataset isn't available, so
this is the controlled-proxy version): train the re-typed torch reference
loop and our stream-style loop on the SAME synthetic corpus with the same
hyperparameters, then compare held-out reconstruction MSE.  Both runs use
their frameworks' own RNG/shuffling — the claim is quality equivalence, not
bit equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from rawaudiovae_kelsey_tpu.models import vae

SEG, HOP, UNITS, LATENT = 256, 64, 256, 32
BATCH, STEPS, LR, KL_BETA = 64, 300, 1e-3, 1e-4


def _corpus(rng, n_samples=80_000):
    """Band-limited structured audio: sums of random sines + light noise."""
    t = np.arange(n_samples) / 44100.0
    wave = np.zeros(n_samples)
    for _ in range(6):
        f = rng.uniform(60, 2000)
        wave += rng.uniform(0.05, 0.2) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
        )
    wave += 0.01 * rng.standard_normal(n_samples)
    return np.clip(wave, -0.99, 0.99).astype(np.float32)


@pytest.mark.slow
def test_recon_mse_parity_after_training():
    rng = np.random.default_rng(42)
    train_wave = _corpus(rng)
    test_wave = _corpus(np.random.default_rng(43), 20_000)

    from rawaudiovae_kelsey_tpu.data import AudioFrameDataset, TestFrameDataset

    train_ds = AudioFrameDataset(train_wave, SEG, HOP)
    test_ds = TestFrameDataset(test_wave, SEG)
    test_frames = np.asarray(test_ds.frames)

    # ---------------- torch: the reference loop, re-typed -----------------
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
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            return torch.tanh(self.fc4(torch.relu(self.fc3(z)))), mu, logvar

    torch.manual_seed(0)
    tm = RefVAE()
    topt = torch.optim.Adam(tm.parameters(), lr=LR)
    order = np.random.default_rng(0).permutation(len(train_ds))
    frames = np.asarray(train_ds.frames)
    for step in range(STEPS):
        lo = (step * BATCH) % (len(order) - BATCH)
        xb = torch.from_numpy(
            np.ascontiguousarray(frames[order[lo:lo + BATCH]])
        )
        topt.zero_grad()
        recon, mu, logvar = tm(xb)
        loss = torch.nn.functional.mse_loss(recon, xb) + KL_BETA * (
            -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        )
        loss.backward()
        topt.step()
    with torch.no_grad():
        h = torch.relu(tm.fc1(torch.from_numpy(test_frames)))
        t_recon = torch.tanh(
            tm.fc4(torch.relu(tm.fc3(tm.fc21(h))))
        ).numpy()
    t_mse = float(np.mean((t_recon - test_frames) ** 2))

    # ---------------- ours: the jitted step ------------------------------
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
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    step_fn = build_train_step(model, cfg, opt)
    order = np.random.default_rng(1).permutation(len(train_ds))
    for step in range(STEPS):
        lo = (step * BATCH) % (len(order) - BATCH)
        xb = jnp.asarray(
            np.ascontiguousarray(frames[order[lo:lo + BATCH]])
        )
        state, _ = step_fn(state, xb)
    mu, _ = vae.encode(state.params, jnp.asarray(test_frames))
    j_recon = np.asarray(vae.decode(state.params, mu))
    j_mse = float(np.mean((j_recon - test_frames) ** 2))

    # quality parity: same MSE magnitude after identical budgets
    assert j_mse == pytest.approx(t_mse, rel=0.25), (j_mse, t_mse)
    # and both actually learned structure (MSE way below signal power)
    signal = float(np.mean(test_frames ** 2))
    assert j_mse < signal * 0.5 and t_mse < signal * 0.5
