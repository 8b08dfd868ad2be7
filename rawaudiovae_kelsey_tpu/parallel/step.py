"""The jitted train step — the framework's hot path.

Replaces the reference's Python-side zero_grad → forward → loss → backward →
step sequence (train.py:184-193) with ONE compiled, donated-buffer update:

  * forward + reparameterization + loss + backward + Adam fused by XLA
    (optionally with Pallas kernels from ``ops/`` on the forward/backward
    GEMM chains);
  * explicit threefry RNG: the per-step key is ``fold_in(state.rng, step)``,
    so runs are bit-reproducible and resume-stable regardless of host order;
  * microbatch gradient accumulation via ``lax.scan`` so the reference's
    default ``batch_size = 131072`` (default.ini:27 — which OOM'd their GPU,
    kelsey_iterable.ini:36) fits in HBM;
  * data parallelism by sharding the batch over the mesh ``data`` axis — the
    gradient all-reduce is the ``psum`` GSPMD inserts, riding ICI;
  * precision policy: "highest" (6-pass fp32 MXU, for parity), "high"
    (bf16 3-pass, ~1e-6 rel err at ~2× the 6-pass speed), "float32" (fp32
    data, single bf16 MXU pass), "bfloat16" (bf16 compute, fp32 master
    params and fp32 loss/optimizer).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rawaudiovae_kelsey_tpu.config.schema import Config
from rawaudiovae_kelsey_tpu.models.registry import ModelDef
from rawaudiovae_kelsey_tpu.models.vae import loss_components
from rawaudiovae_kelsey_tpu.parallel.mesh import DATA_AXIS
from rawaudiovae_kelsey_tpu.train.state import TrainState

Metrics = dict


def _matmul_precision(name: str) -> str:
    return {"highest": "highest", "high": "high", "float32": "default",
            "bfloat16": "default"}[name]


def _make_loss_fn(model: ModelDef, cfg: Config, weighted: bool,
                  mesh=None) -> Callable:
    """Shared builder for the plain and row-weighted loss functions — the
    forward flow (bf16 casting, encode, reparameterize, decode) is
    identical; only the reduction differs."""
    seg = model.segment_length
    kl_beta = cfg.vae.kl_beta
    reduction = cfg.training.loss_reduction.split()[0]
    bf16 = cfg.tpu.precision == "bfloat16"
    tpu_prng = cfg.tpu.rng == "tpu_prng"
    # Under a mesh the kernel runs inside shard_map with a per-shard seed
    # fold (ops/rng.py:sharded_pallas_reparameterize) — the round-3
    # single-device gate is lifted.  shard_map needs the batch to divide
    # the data axis; every sharded caller already pads to the mesh
    # multiple, so a non-divisible shape (checked per-trace below) falls
    # back to threefry loudly rather than failing inside shard_map.
    shard_rng = tpu_prng and mesh is not None and mesh.devices.size > 1
    n_data = int(mesh.shape[DATA_AXIS]) if shard_rng else 1

    def sample(key, mu, logvar):
        if tpu_prng:
            from rawaudiovae_kelsey_tpu.ops.rng import (
                pallas_reparameterize,
                sharded_pallas_reparameterize,
            )

            # pass BOTH words of the folded threefry key: keeping only the
            # low 32 bits would birthday-collide within long runs (a
            # repeated seed replays the exact same noise tensor)
            words = jax.random.key_data(key).ravel()[-2:].astype(jnp.int32)
            if shard_rng:
                if mu.shape[0] % n_data:
                    print(f"[tpu] rng=tpu_prng: batch {mu.shape[0]} does "
                          f"not divide the data axis ({n_data}) — threefry "
                          "for this step shape")
                    return model.reparameterize(key, mu, logvar)
                return sharded_pallas_reparameterize(words, mu, logvar,
                                                     mesh, DATA_AXIS)
            return pallas_reparameterize(words, mu, logvar)
        return model.reparameterize(key, mu, logvar)

    def forward(params, key, batch):
        x = batch.reshape(-1, seg)
        if bf16:
            cparams = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params
            )
            xin = x.astype(jnp.bfloat16)
        else:
            cparams, xin = params, x
        mu, logvar = model.encode(cparams, xin)
        mu = mu.astype(jnp.float32)
        logvar = logvar.astype(jnp.float32)
        z = sample(key, mu, logvar)
        if bf16:
            z = z.astype(jnp.bfloat16)
        recon = model.decode(cparams, z).astype(jnp.float32)
        return x, recon, mu, logvar

    if not weighted:
        # Loss stays on the XLA reduction even under backend=pallas: wiring
        # ops.pallas_loss_components here was measured at 931k frames/s vs
        # 1.34M (the custom_vjp boundary blocks XLA from fusing the loss
        # backward into the decode backward chain) — see docs/PERF.md.
        def loss_fn(params, key, batch):
            x, recon, mu, logvar = forward(params, key, batch)
            loss, mse, kld = loss_components(recon, x, mu, logvar, kl_beta,
                                             seg, reduction)
            return loss, (mse, kld)
    else:
        def loss_fn(params, key, batch, wv):
            x, recon, mu, logvar = forward(params, key, batch)
            wv = wv.astype(jnp.float32)
            se = jnp.sum(jnp.square(recon - x), axis=1)          # (B,)
            kl = -0.5 * jnp.sum(
                1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1
            )
            n_real = jnp.sum(wv)
            if reduction == "mean":
                mse = jnp.dot(se, wv) / (n_real * seg)
                kld = jnp.dot(kl, wv) / (n_real * mu.shape[-1])
            else:
                mse = jnp.dot(se, wv)
                kld = jnp.dot(kl, wv)
            return mse + kl_beta * kld, (mse, kld)

    if cfg.tpu.remat:
        loss_fn = jax.checkpoint(loss_fn)
    return loss_fn


def make_loss_fn(model: ModelDef, cfg: Config, mesh=None) -> Callable:
    """(params, key, batch) → (loss, (mse, kld)); all reductions fp32.
    Pass the mesh when the step runs sharded (routes mesh-aware RNG
    backends)."""
    return _make_loss_fn(model, cfg, weighted=False, mesh=mesh)


def make_weighted_loss_fn(model: ModelDef, cfg: Config, mesh=None) -> Callable:
    """(params, key, batch, row_weights) → (loss, (mse, kld)).

    Row-masked variant of :func:`make_loss_fn`: rows with weight 0 (e.g.
    padding added to make a batch divisible by the mesh's data axis)
    contribute nothing to the loss or gradients, and the reduction
    denominators count only real rows — so the result is bit-comparable to
    the unpadded computation.  Mirrors the reference loss semantics
    (``rawvae/model.py:38-46``) exactly on the surviving rows."""
    return _make_loss_fn(model, cfg, weighted=True, mesh=mesh)


def build_train_step(
    model: ModelDef,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Metrics]]:
    """Compile the full update.  The returned function maps
    ``(state, batch) → (state', metrics)`` with the state buffers donated."""
    loss_fn = make_loss_fn(model, cfg, mesh=mesh)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    micro = cfg.tpu.microbatch_size
    seg = model.segment_length
    prec = _matmul_precision(cfg.tpu.precision)
    # mean-reduced losses average microbatch grads; sum-reduced losses SUM
    # them (averaging would silently scale the effective LR by 1/n_micro)
    mean_reduced = cfg.training.loss_reduction.split()[0] == "mean"

    def step_fn(state: TrainState, batch: jax.Array):
        with jax.default_matmul_precision(prec):
            batch = batch.reshape(-1, seg)
            if mesh is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, NamedSharding(mesh, P(DATA_AXIS))
                )
            base_key = jax.random.fold_in(state.rng, state.step)

            if micro and micro < batch.shape[0]:
                # A ragged final batch (host loaders don't drop_last) is
                # handled as one extra grad call, weighted by its row count,
                # so metrics/grads match the unmicrobatched computation.
                n_micro, rem = divmod(batch.shape[0], micro)
                mbs = batch[: n_micro * micro].reshape(n_micro, micro, seg)

                def scan_body(acc, inp):
                    i, mb = inp
                    (loss, (mse, kld)), grads = grad_fn(
                        state.params, jax.random.fold_in(base_key, i), mb
                    )
                    grads = jax.tree_util.tree_map(
                        lambda g: g.astype(jnp.float32), grads
                    )
                    g_acc, l_acc, m_acc, k_acc = acc
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                    return (g_acc, l_acc + loss, m_acc + mse, k_acc + kld), None

                zeros = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                (gsum, lsum, msum, ksum), _ = jax.lax.scan(
                    scan_body,
                    (zeros, 0.0, 0.0, 0.0),
                    (jnp.arange(n_micro), mbs),
                )
                total = batch.shape[0]
                # grad of the mean over the full batch is the row-count-
                # weighted sum of per-part mean grads; sum-reduction just adds
                w_main = (micro / total) if mean_reduced else 1.0
                grads = jax.tree_util.tree_map(lambda g: g * w_main, gsum)
                loss, mse, kld = lsum * w_main, msum * w_main, ksum * w_main
                if rem:
                    (loss_r, (mse_r, kld_r)), grads_r = grad_fn(
                        state.params,
                        jax.random.fold_in(base_key, n_micro),
                        batch[n_micro * micro:],
                    )
                    w_rem = (rem / total) if mean_reduced else 1.0
                    grads = jax.tree_util.tree_map(
                        lambda g, r: g + r.astype(jnp.float32) * w_rem,
                        grads, grads_r,
                    )
                    loss = loss + loss_r * w_rem
                    mse = mse + mse_r * w_rem
                    kld = kld + kld_r * w_rem
            else:
                (loss, (mse, kld)), grads = grad_fn(
                    state.params, base_key, batch
                )
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads
                )

            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params,
                opt_state=new_opt_state,
                rng=state.rng,
                step=state.step + 1,
            )
            metrics = {"loss": loss, "mse": mse, "kld": kld}
            return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def build_eval_step(model: ModelDef, cfg: Config,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Compiled reconstruction: ``(params, key, batch) → recon``.

    Stochastic by default — the reference sampled the latent even during eval
    reconstruction (``model(test_sample)[0]`` runs reparameterize,
    train.py:224; quirk #13).  ``cfg.tpu.deterministic_inference`` switches to
    z = mu.
    """
    seg = model.segment_length
    deterministic = cfg.tpu.deterministic_inference
    prec = _matmul_precision(cfg.tpu.precision)

    @jax.jit
    def eval_fn(params, key, batch):
        with jax.default_matmul_precision(prec):
            x = batch.reshape(-1, seg)
            if mesh is not None:
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(DATA_AXIS))
                )
            mu, logvar = model.encode(params, x)
            z = model.reparameterize(key, mu, logvar, deterministic)
            return model.decode(params, z)

    return eval_fn
