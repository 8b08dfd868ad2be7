"""Pallas on-chip Gaussian sampling for the reparameterization step.

The XLA path samples ``eps ~ N(0, I)`` with ``jax.random.normal`` (threefry)
— that is the framework default and the reproducibility contract.  This
module provides the Pallas-native alternative from the SURVEY.md §7 kernel
plan: the TPU per-core PRNG (``pltpu.prng_seed`` / ``prng_random_bits``)
feeding a Box-Muller transform, fused with ``z = mu + eps·exp(0.5·logvar)``
in one VMEM pass — no HBM round-trip for eps at all.

Numerics: uniforms are built by bit-packing 23 random mantissa bits into
[1, 2) and shifting to (0, 1], so ``log`` never sees 0.  The stream differs
from threefry (documented; parity tests are statistical), but is
deterministic per (seed, grid position).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (
    mosaic_precision_scope,
    DEFAULT_BLOCK_B,
    _interpret,
    _pad_batch,
    _tile,
)


def _bits_to_unit_open(bits: jax.Array) -> jax.Array:
    """uint32 → float32 in (0, 1]: pack 23 bits into the mantissa of
    [1, 2), subtract to [0, 1), then flip to (0, 1]."""
    mantissa = jnp.bitwise_and(bits, jnp.uint32(0x007FFFFF))
    one_to_two = pltpu.bitcast(
        jnp.bitwise_or(mantissa, jnp.uint32(0x3F800000)), jnp.float32
    )
    return 2.0 - one_to_two  # (0, 1]


def _reparam_kernel(seed_ref, mu_ref, logvar_ref, z_ref):
    # distinct stream per batch tile; BOTH key words feed the seed (a
    # single 32-bit word would birthday-collide over long runs, replaying
    # bit-identical noise tensors).  The tile index is spread by a golden-
    # ratio odd constant in the SECOND word: naive seed+program_id would
    # make sequential scalar seeds replay each other's tiles shifted by
    # one block (seed s, tile i+1 == seed s+1, tile i).
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (pl.program_id(0) * 0x9E3779B9))
    shape = mu_ref.shape
    u1 = _bits_to_unit_open(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    )
    u2 = _bits_to_unit_open(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    )
    # Box-Muller
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    eps = r * jnp.cos(2.0 * jnp.pi * u2)
    mu = mu_ref[:].astype(jnp.float32)
    std = jnp.exp(0.5 * logvar_ref[:].astype(jnp.float32))
    z_ref[:] = (mu + eps * std).astype(z_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_reparameterize(seed, mu, logvar, block_b: int = DEFAULT_BLOCK_B):
    """On-chip ``z = mu + eps·exp(0.5·logvar)`` with TPU-PRNG Gaussian eps.

    ``seed``: int32 scalar or 2-vector (e.g. both words of a folded
    threefry key; a scalar is zero-extended).  Off-TPU the TPU PRNG
    primitives have no interpreter support, so a threefry-based Box-Muller
    with the same shape contract runs instead (the sampling stream is
    platform-specific either way).

    Differentiable via a custom VJP (reverse-mode AD cannot trace through a
    raw pallas_call): with eps independent of the inputs,
    ``dz/dmu = 1`` and ``dz/dlogvar = ½·eps·std = ½·(z − mu)``.
    """
    seed = jnp.asarray(seed, jnp.int32).ravel()
    if seed.shape[0] < 2:
        seed = jnp.concatenate([seed, jnp.zeros(2 - seed.shape[0],
                                                jnp.int32)])
    if _interpret():
        key = jax.random.fold_in(
            jax.random.PRNGKey(seed[0].astype(jnp.uint32)),
            seed[1].astype(jnp.uint32),
        )
        u1 = jax.random.uniform(key, mu.shape, jnp.float32,
                                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
        u2 = jax.random.uniform(jax.random.fold_in(key, 1), mu.shape)
        eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
        return (mu.astype(jnp.float32)
                + eps * jnp.exp(0.5 * logvar.astype(jnp.float32))
                ).astype(mu.dtype)
    mu2, n = _pad_batch(mu, block_b)
    logvar2, _ = _pad_batch(logvar, block_b)
    B, latent = mu2.shape
    seed_arr = seed  # normalized (2,) int32 above
    with mosaic_precision_scope():
        z = pl.pallas_call(
            _reparam_kernel,
            grid=(B // block_b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                _tile(block_b, latent),
                _tile(block_b, latent),
            ],
            out_specs=_tile(block_b, latent),
            out_shape=jax.ShapeDtypeStruct((B, latent), mu.dtype),
            interpret=_interpret(),
        )(seed_arr, mu2, logvar2)
    return z[:n]


def sharded_pallas_reparameterize(seed, mu, logvar, mesh, axis: str,
                                  block_b: int = DEFAULT_BLOCK_B):
    """Mesh-sound TPU-PRNG reparameterization (lifts the round-3
    single-device gate).

    Under GSPMD a bare ``pallas_call`` is either replicated (defeating data
    parallelism) or partitioned with ``program_id`` restarting per shard, so
    every shard would draw IDENTICAL eps — correlated noise that silently
    biases training.  This wrapper enters ``shard_map`` over the mesh's
    ``axis`` and XORs a golden-ratio spread of ``axis_index`` into the FIRST
    seed word before the kernel runs (the kernel itself spreads the tile
    index into the SECOND word), so:

      * every (shard, tile) pair seeds a distinct hardware PRNG stream —
        no cross-shard correlation by construction of the seed space;
      * mesh axes OTHER than ``axis`` (e.g. a tensor-parallel ``model``
        axis) see replicated inputs and compute identical seeds, so model-
        parallel replicas draw the SAME eps — required for a consistent z;
      * the sampling distribution is shard-count invariant (each shard runs
        the same Box-Muller kernel); the concrete stream is not, which is
        the module's documented contract (it already differs from threefry).

    The global batch must divide the ``axis`` size (callers pad batches to
    the mesh multiple already); ``shard_map`` enforces it.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    seed = jnp.asarray(seed, jnp.int32).ravel()
    if seed.shape[0] < 2:
        seed = jnp.concatenate([seed, jnp.zeros(2 - seed.shape[0],
                                                jnp.int32)])

    def local(seed_l, mu_l, logvar_l):
        idx = jax.lax.axis_index(axis).astype(jnp.int32)
        # 0x85EBCA6B (Murmur3 mix, odd) as wrap-around int32 — a DIFFERENT
        # odd constant than the kernel's tile spread so the two folds stay
        # independent even though (shard, tile) already keys distinct words
        seed_l = seed_l.at[0].set(seed_l[0] ^ (idx * jnp.int32(-2048144789)))
        return pallas_reparameterize(seed_l, mu_l, logvar_l, block_b)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,  # custom_vjp+pallas inside; replication over the
                          # other axes is by construction (deterministic
                          # per-shard compute)
    )(seed, mu, logvar)


def _reparam_fwd(seed, mu, logvar, block_b):
    z = _reparam_impl(seed, mu, logvar, block_b)
    return z, (jnp.shape(seed), mu, z)


def _reparam_bwd(block_b, res, g):
    import numpy as _np

    seed_shape, mu, z = res
    # integer-dtype primal → float0 tangent (seed is a traced array under
    # jit, so it cannot live in nondiff_argnums)
    d_seed = _np.zeros(seed_shape, dtype=jax.dtypes.float0)
    return d_seed, g, 0.5 * (z - mu) * g


# move the primal computation into a helper the VJP wrappers share
_reparam_impl = pallas_reparameterize.__wrapped__
pallas_reparameterize.defvjp(_reparam_fwd, _reparam_bwd)
