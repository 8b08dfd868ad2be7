"""Dense raw-audio VAE — pure-functional JAX rebuild of the reference model.

Architecture (reference ``rawvae/model.py:5-35``):

    encoder:  x(seg) → Linear(seg→n_units) → ReLU → {Linear(n_units→latent)}×2
    sample:   z = mu + eps * exp(0.5 * logvar),  eps ~ N(0, I)
    decoder:  z(latent) → Linear(latent→n_units) → ReLU → Linear(n_units→seg) → tanh

Design differences from the reference (intentional, TPU-first):
  * No module objects — params are a pytree of arrays; every function is pure
    and jit/vmap/pjit-compatible.
  * The PRNG is an explicit threefry key (the reference used the ambient
    ``torch.randn_like`` CUDA generator, ``model.py:25``), so reparameterization
    is reproducible and shardable.
  * Weights are stored ``(in, out)`` so the forward pass is ``x @ W + b``
    (torch ``nn.Linear`` stores ``(out, in)`` and computes ``x @ W.T``; the
    checkpoint importer in ``compat/`` transposes).

Loss (reference ``rawvae/model.py:38-46``): mean-MSE reconstruction plus
β-weighted KL with **mean** (not the paper's sum — reference quirk #1, kept for
numerics parity).  The dead reference key ``loss_reduction`` (default.ini:29)
is honored here: ``"sum"`` switches both terms to summed reductions.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _linear_init(key: jax.Array, fan_in: int, fan_out: int,
                 dtype=jnp.float32) -> Dict[str, jax.Array]:
    """torch ``nn.Linear.reset_parameters`` distribution: both W and b are
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5))."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound),
    }


def linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def init_dense(key: jax.Array, segment_length: int, n_units: int,
               latent_dim: int, dtype=jnp.float32) -> Params:
    """Initialize the 5-layer dense VAE (fc1, fc21, fc22, fc3, fc4 — the layer
    names mirror rawvae/model.py:13-17 so checkpoints map 1:1)."""
    k1, k21, k22, k3, k4 = jax.random.split(key, 5)
    return {
        "fc1": _linear_init(k1, segment_length, n_units, dtype),
        "fc21": _linear_init(k21, n_units, latent_dim, dtype),
        "fc22": _linear_init(k22, n_units, latent_dim, dtype),
        "fc3": _linear_init(k3, latent_dim, n_units, dtype),
        "fc4": _linear_init(k4, n_units, segment_length, dtype),
    }


def encode(params: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(batch, seg) → (mu, logvar), each (batch, latent).  model.py:19-21."""
    h1 = jax.nn.relu(linear(params["fc1"], x))
    return linear(params["fc21"], h1), linear(params["fc22"], h1)


def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array,
                   deterministic: bool = False) -> jax.Array:
    """z = mu + eps·exp(0.5·logvar).  model.py:23-26.  ``deterministic=True``
    returns the mean (quirk #13 extension: the reference sampled even at
    inference/export time)."""
    if deterministic:
        return mu
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + eps * std


def decode(params: Params, z: jax.Array) -> jax.Array:
    """(batch, latent) → (batch, seg), tanh-bounded.  model.py:28-30."""
    h3 = jax.nn.relu(linear(params["fc3"], z))
    return jnp.tanh(linear(params["fc4"], h3))


def forward(params: Params, key: jax.Array, x: jax.Array,
            segment_length: int, deterministic: bool = False
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full VAE pass; reshapes input to (-1, segment_length) like
    model.py:33's ``x.view(-1, segment_length)``."""
    x = x.reshape(-1, segment_length)
    mu, logvar = encode(params, x)
    z = reparameterize(key, mu, logvar, deterministic)
    return decode(params, z), mu, logvar


def loss_fn(recon_x: jax.Array, x: jax.Array, mu: jax.Array,
            logvar: jax.Array, kl_beta: float, segment_length: int,
            reduction: str = "mean") -> jax.Array:
    """MSE + β·KLD, both mean-reduced by default (model.py:38-46; the comment
    there says "summed" but the code means — quirk #1, parity kept)."""
    return loss_components(recon_x, x, mu, logvar, kl_beta,
                           segment_length, reduction)[0]


def loss_components(recon_x, x, mu, logvar, kl_beta, segment_length,
                    reduction: str = "mean"):
    """Like :func:`loss_fn` but also returns (mse, kld) for metrics."""
    x = x.reshape(-1, segment_length)
    red = jnp.mean if reduction == "mean" else jnp.sum
    recon_loss = red(jnp.square(recon_x - x))
    kld = -0.5 * red(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return recon_loss + kl_beta * kld, recon_loss, kld


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
