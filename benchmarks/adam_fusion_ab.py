"""A/B probe: fused Pallas Adam vs the optax path — RETIRED, optax wins.

Round-4 follow-up to ``deep_step_probe.py``, which measured the
optimizer-only chain at ~1.7× its 7-stream HBM floor and hypothesized
that XLA materializes the ``updates`` tree between ``scale_by_adam`` and
``apply_updates``.  This probe built the fix — a Pallas kernel doing the
whole update (read g/m/v/p, write m/v/p) in one 7-stream pass per leaf,
bit-identical to optax (verified to 0 ULP on CPU interpret mode,
including the bias-correction / safe_increment op order) — and measured
it against optax in BOTH dispatch contexts (v5e, same session, paired):

                      optax       fused-pallas
  deep/xla  scan-100  0.446M      0.436M   (-2.2%)
  dense/pl  scan-100  3.717M      3.611M   (-2.8%)
  deep/xla  shallow   0.491M      0.371M   (-24.5%)
  dense/pl  shallow   2.312M      1.951M   (-15.6%)
  conv1d/x  shallow   1.372M      1.329M   (-3.1%)

Conclusion: the hypothesis was wrong.  XLA already fuses the whole
optax elementwise chain into one loop fusion per leaf (no materialized
``updates`` tree) AND overlaps that sweep with the backward's tail; a
per-leaf ``pallas_call`` (14 custom calls on deep) forfeits the overlap
and adds call overhead, losing everywhere — catastrophically in the
shallow (real-trainer) context.  The deep variant's 1.7× "adam-only"
reading was scan-carry machinery, not a fusion defect.  The kernel was
removed from ``ops/``; the trainers keep optax.  deep_step_probe.py's
decomposition remains valid as a *bounding* tool (t_adam measured alone
overstates its marginal cost inside the real step, where it overlaps).

Run on TPU from the repo root:
    python benchmarks/adam_fusion_ab.py [--arch deep] [--mode shallow|scan]

Reference semantics: ``optim.Adam(model.parameters(), lr)`` defaults
(train.py:163); our production path is optax.adam in parallel/step.py.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- kernel
# (the retired ops/pallas_adam.py core, kept here so the negative result
# stays reproducible)

_TILE_BUDGET_ELEMS = (12 * 1024 * 1024) // (7 * 4)


def _adam_kernel(bc1_ref, bc2_ref, p_ref, g_ref, m_ref, v_ref,
                 p_out, m_out, v_out, *, b1, b2, eps, lr):
    g = g_ref[:]
    m = (1.0 - b1) * g + b1 * m_ref[:]
    v = (1.0 - b2) * (g * g) + b2 * v_ref[:]
    upd = (-lr) * ((m / bc1_ref[0, 0])
                   / (jnp.sqrt(v / bc2_ref[0, 0]) + eps))
    p_out[:] = p_ref[:] + upd
    m_out[:] = m
    v_out[:] = v


def _leaf_2d(x):
    if x.ndim == 1:
        return x.reshape(1, -1)
    if x.ndim == 2:
        return x
    return x.reshape(-1, x.shape[-1])


def _row_block(rows, cols):
    """Whole leaf if it fits VMEM, else the largest multiple-of-8
    power-of-two divisor (Mosaic: partial row blocks must be %8)."""
    if rows * cols <= _TILE_BUDGET_ELEMS:
        return rows
    bm = 8
    if rows % bm:
        return None
    while (bm * 2 <= rows and rows % (bm * 2) == 0
           and bm * 2 * cols <= _TILE_BUDGET_ELEMS):
        bm *= 2
    return bm if bm * cols <= _TILE_BUDGET_ELEMS else None


def _leaf_update(p, g, m, v, bc1, bc2, *, b1, b2, eps, lr):
    shape = p.shape
    p2, g2, m2, v2 = (_leaf_2d(x) for x in (p, g, m, v))
    rows, cols = p2.shape
    bm = _row_block(rows, cols)
    if bm is None:
        m_n = (1.0 - b1) * g + b1 * m
        v_n = (1.0 - b2) * (g * g) + b2 * v
        upd = (-lr) * ((m_n / bc1[0, 0]) / (jnp.sqrt(v_n / bc2[0, 0]) + eps))
        return p + upd, m_n, v_n
    tile = lambda: pl.BlockSpec((bm, cols), lambda i: (i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    scalar = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),  # noqa: E731
                                  memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps, lr=lr),
        grid=(rows // bm,),
        in_specs=[scalar(), scalar(), tile(), tile(), tile(), tile()],
        out_specs=[tile(), tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct((rows, cols), jnp.float32)] * 3,
        input_output_aliases={2: 0, 4: 1, 5: 2},
    )(bc1, bc2, p2, g2, m2, v2)
    return tuple(o.reshape(shape) for o in out)


def fused_adam_apply(grads, opt_state, params, *, lr,
                     b1=0.9, b2=0.999, eps=1e-8):
    """Drop-in for optimizer.update + apply_updates on an optax.adam
    state; 0-ULP match to optax (same safe_increment / bias-correction /
    update op order)."""
    head = opt_state[0]
    max_i32 = jnp.iinfo(jnp.int32).max
    count_inc = jnp.where(head.count < max_i32, head.count + 1, max_i32)
    bc1 = (1.0 - jnp.asarray(b1, jnp.float32) ** count_inc).reshape(1, 1)
    bc2 = (1.0 - jnp.asarray(b2, jnp.float32) ** count_inc).reshape(1, 1)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat = zip(flat_p, treedef.flatten_up_to(grads),
               treedef.flatten_up_to(head.mu), treedef.flatten_up_to(head.nu))
    new_p, new_m, new_v = [], [], []
    for p, g, m, v in flat:
        p2, m2, v2 = _leaf_update(p, g, m, v, bc1, bc2,
                                  b1=b1, b2=b2, eps=eps, lr=lr)
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)
    new_state = (head._replace(count=count_inc,
                               mu=treedef.unflatten(new_m),
                               nu=treedef.unflatten(new_v)),) + opt_state[1:]
    return treedef.unflatten(new_p), new_state


# ---------------------------------------------------------------- A/B

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="deep")
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--mode", default="shallow", choices=["shallow", "scan"])
    ap.add_argument("--steps", type=int, default=300,
                    help="shallow: dispatches per window; scan: chain length")
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import bench
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel.step import make_loss_fn
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer
    import dataclasses
    import optax

    cfg = bench._build_cfg(args.arch, args.batch, "bfloat16", args.backend)
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    lr = cfg.training.learning_rate
    loss_fn = make_loss_fn(model, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def make_step(fused):
        def step_fn(state, batch):
            base_key = jax.random.fold_in(state.rng, state.step)
            (loss, _), grads = grad_fn(state.params, base_key, batch)
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads)
            if fused:
                new_params, new_opt = fused_adam_apply(
                    grads, state.opt_state, state.params, lr=lr)
            else:
                updates, new_opt = opt.update(
                    grads, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
            return dataclasses.replace(
                state, params=new_params, opt_state=new_opt,
                step=state.step + 1), {"loss": loss}
        return jax.jit(step_fn)

    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(-1, 1, (args.batch, model.segment_length))
                        .astype(np.float32))

    def timed(fused):
        params = model.init(jax.random.PRNGKey(0))
        st = TrainState.create(params, opt.init(params), seed=0)
        one = make_step(fused)
        if args.mode == "scan":
            @jax.jit
            def run(st, batch):
                def body(s, _):
                    s, m = one(s, batch)
                    return s, m["loss"]
                s, losses = jax.lax.scan(body, st, None, length=args.steps)
                return s, losses[-1]
            st, l = run(st, batch)
            float(jax.device_get(l))
            best = 0.0
            for _ in range(args.windows):
                t0 = time.perf_counter()
                st, l = run(st, batch)
                float(jax.device_get(l))
                best = max(best,
                           args.batch * args.steps
                           / (time.perf_counter() - t0))
            return best
        for _ in range(3):
            st, m = one(st, batch)
        float(jax.device_get(m["loss"]))
        jax.block_until_ready(st.params)
        best = 0.0
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                st, m = one(st, batch)
            float(jax.device_get(m["loss"]))
            jax.block_until_ready(st.params)
            best = max(best,
                       args.batch * args.steps / (time.perf_counter() - t0))
        return best

    # interleaved pairs bound tunnel drift
    a1, b1_, a2, b2_ = (timed(False), timed(True), timed(False), timed(True))
    a, b = max(a1, a2), max(b1_, b2_)
    print(f"{args.arch}/{args.backend} {args.mode}: "
          f"optax {a / 1e6:.3f}M  fused {b / 1e6:.3f}M  "
          f"({(b / a - 1) * 100:+.1f}%)  "
          f"[runs {a1 / 1e6:.3f}/{a2 / 1e6:.3f} vs "
          f"{b1_ / 1e6:.3f}/{b2_ / 1e6:.3f}]")


if __name__ == "__main__":
    main()
