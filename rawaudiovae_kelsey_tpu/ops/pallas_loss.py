"""Fused VAE loss reduction in Pallas.

Completes the SURVEY.md §7 kernel inventory: MSE + β·KL with all four
reductions (Σ(recon−x)², Σ(1+logvar−mu²−e^logvar)) computed in ONE pass over
the batch tiles — squared error, KL integrand, and both partial sums never
leave VMEM; the sequential-grid revisit pattern accumulates into a single
(1, 1) cell per term.

Numerics match ``models/vae.loss_components`` (rawvae/model.py:38-46:
mean-MSE + β·mean-KL, quirk #1) exactly at fp32.  The custom VJP's backward
is the closed-form elementwise gradient (left to XLA fusion — it is a single
elementwise map):

    d recon = 2 (recon − x) / N_x · g
    d mu    = β mu / N_l · g
    d logvar = β (e^logvar − 1) / (2 N_l) · g
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (
    mosaic_precision_scope,
    _interpret,
    _pad_batch,
    _tile,
)


def _loss_kernel(recon_ref, x_ref, mu_ref, logvar_ref, sq_ref, kl_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # SMEM accepts only scalar stores
        sq_ref[0, 0] = 0.0
        kl_ref[0, 0] = 0.0

    diff = recon_ref[:].astype(jnp.float32) - x_ref[:].astype(jnp.float32)
    sq_ref[0, 0] += jnp.sum(diff * diff)
    mu = mu_ref[:].astype(jnp.float32)
    logvar = logvar_ref[:].astype(jnp.float32)
    kl_ref[0, 0] += jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar))


@functools.partial(jax.jit, static_argnames=("block_b",))
def _loss_sums(recon, x, mu, logvar, block_b: int = 128):
    """(Σ(recon−x)², Σ(1+logvar−mu²−e^logvar)) in one fused pass."""
    n = recon.shape[0]
    recon, _ = _pad_batch(recon, block_b)      # zero rows: diff = 0
    x, _ = _pad_batch(x, block_b)
    mu, _ = _pad_batch(mu, block_b)
    # pad logvar rows with 0 and mu rows with... 1+0-0-e^0 = 0 for padded
    # rows automatically (mu=0, logvar=0) — padding is exact.
    logvar, _ = _pad_batch(logvar, block_b)
    B, seg = recon.shape
    latent = mu.shape[1]
    with mosaic_precision_scope():
        sq, kl = pl.pallas_call(
            _loss_kernel,
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, seg), _tile(block_b, seg),
                _tile(block_b, latent), _tile(block_b, latent),
            ],
            out_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            interpret=_interpret(),
        )(recon, x, mu, logvar)
    # padded rows contribute 0 to sq; for kl each padded row contributes
    # latent * (1 + 0 - 0 - 1) = 0 — both sums exact; n only matters for means
    return sq[0, 0], kl[0, 0], n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_loss(recon, x, mu, logvar, kl_beta: float, reduction: str = "mean"):
    """Fused ``mse + kl_beta * KLD`` matching models/vae.loss_fn numerics."""
    sq, kl, n = _loss_sums(recon, x, mu, logvar)
    n_x = n * recon.shape[1]
    n_l = n * mu.shape[1]
    if reduction == "mean":
        return sq / n_x + kl_beta * (-0.5 * kl / n_l)
    return sq + kl_beta * (-0.5 * kl)


def _loss_fwd(recon, x, mu, logvar, kl_beta, reduction):
    out = pallas_loss(recon, x, mu, logvar, kl_beta, reduction)
    return out, (recon, x, mu, logvar)


def _loss_bwd(kl_beta, reduction, res, g):
    recon, x, mu, logvar = res
    n_x = recon.size
    n_l = mu.size
    if reduction == "mean":
        d_recon = (2.0 / n_x) * (recon - x) * g
        d_mu = (kl_beta / n_l) * mu * g
        d_logvar = (kl_beta / (2.0 * n_l)) * (jnp.exp(logvar) - 1.0) * g
    else:
        d_recon = 2.0 * (recon - x) * g
        d_mu = kl_beta * mu * g
        d_logvar = (kl_beta / 2.0) * (jnp.exp(logvar) - 1.0) * g
    return d_recon, -d_recon, d_mu, d_logvar


pallas_loss.defvjp(_loss_fwd, _loss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_loss_components(recon, x, mu, logvar, kl_beta: float,
                           reduction: str = "mean"):
    """Fused (loss, mse, kld) — the models/vae.loss_components contract.

    Available as a standalone op; NOT dispatched by the train step: measured
    end-to-end it costs ~30% (the custom_vjp boundary prevents XLA from
    fusing the loss backward into the decode backward chain — docs/PERF.md).
    """
    sq, kl, n = _loss_sums(recon, x, mu, logvar)
    if reduction == "mean":
        mse = sq / (n * recon.shape[1])
        kld = -0.5 * kl / (n * mu.shape[1])
    else:
        mse = sq
        kld = -0.5 * kl
    return mse + kl_beta * kld, mse, kld


def _components_fwd(recon, x, mu, logvar, kl_beta, reduction):
    out = pallas_loss_components(recon, x, mu, logvar, kl_beta, reduction)
    return out, (recon, x, mu, logvar)


def _components_bwd(kl_beta, reduction, res, cts):
    recon, x, mu, logvar = res
    g_loss, g_mse, g_kld = cts
    # loss = mse + beta*kld, so cotangents combine linearly
    g_m = g_loss + g_mse
    g_k = kl_beta * g_loss + g_kld
    if reduction == "mean":
        d_recon = (2.0 / recon.size) * (recon - x) * g_m
        d_mu = (1.0 / mu.size) * mu * g_k
        d_logvar = (1.0 / (2.0 * mu.size)) * (jnp.exp(logvar) - 1.0) * g_k
    else:
        d_recon = 2.0 * (recon - x) * g_m
        d_mu = mu * g_k
        d_logvar = 0.5 * (jnp.exp(logvar) - 1.0) * g_k
    return d_recon, -d_recon, d_mu, d_logvar


pallas_loss_components.defvjp(_components_fwd, _components_bwd)
