"""Explicit-collective data parallelism via ``shard_map``.

The default train step (parallel/step.py) annotates shardings and lets GSPMD
insert the gradient all-reduce.  This module is the explicit alternative:
``shard_map`` over the mesh ``data`` axis with a hand-placed
``jax.lax.pmean`` of the per-shard gradients — the collective is visible in
the program rather than inferred, which makes comm placement auditable
(exactly one pmean over ICI per step) and is the natural base for manual
overlap tricks later.

Reduction semantics match the GSPMD step for mean-reduced losses: each
shard computes loss/grads on its ``B/n`` rows, pmean averages them —
identical to the global-batch mean gradient.  The reparameterization NOISE
is drawn per shard (the key is folded with the shard index), so losses and
trajectories match the GSPMD step in distribution, not bit-for-bit — the
gradient estimator is equivalent, individual steps are not
(tests/test_train_step.py pins a 20-step trajectory to rtol 5% against the
replicated step and exact cross-shard param replication).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from rawaudiovae_kelsey_tpu.config.schema import Config
from rawaudiovae_kelsey_tpu.models.registry import ModelDef
from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS
from rawaudiovae_kelsey_tpu.parallel.step import (
    Metrics,
    _matmul_precision,
    make_loss_fn,
)
from rawaudiovae_kelsey_tpu.train.state import TrainState


def build_shard_map_train_step(
    model: ModelDef,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Metrics]]:
    """Data-parallel train step with explicit grad pmean.  Params/opt state
    replicated; batch sharded over ``data``.  (Tensor parallelism stays with
    the GSPMD step — this path is dp-only by design.)"""
    if cfg.tpu.microbatch_size:
        raise ValueError(
            "build_shard_map_train_step does not implement microbatch "
            "gradient accumulation; use build_train_step (GSPMD) for "
            "microbatch_size > 0"
        )
    loss_fn = make_loss_fn(model, cfg, mesh=mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    seg = model.segment_length
    prec = _matmul_precision(cfg.tpu.precision)
    # sum-reduced losses combine across shards with psum (a pmean of
    # per-shard sums would silently scale grads by 1/n_shards)
    reduce = (jax.lax.psum
              if cfg.training.loss_reduction.split()[0] == "sum"
              else jax.lax.pmean)

    def per_shard(state: TrainState, local_batch: jax.Array):
        # distinct eps per shard: fold the shard index into the step key
        shard = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), shard
        )
        (loss, (mse, kld)), grads = grad_fn(state.params, key, local_batch)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        # THE collective: one reduction of grads (+ scalar metrics) over ICI
        grads = reduce(grads, DATA_AXIS)
        loss = reduce(loss, DATA_AXIS)
        mse = reduce(mse, DATA_AXIS)
        kld = reduce(kld, DATA_AXIS)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_state = TrainState(
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt_state,
            rng=state.rng,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "mse": mse, "kld": kld}

    shard_mapped = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, batch: jax.Array):
        with jax.default_matmul_precision(prec):
            batch = batch.reshape(-1, seg)
            return shard_mapped(state, batch)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
