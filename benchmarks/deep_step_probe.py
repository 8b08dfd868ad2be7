"""Decomposition probe: where the deep variant's non-MXU time goes.

The deep train step (BASELINE.json config #3: seg 4096, hidden
4096/2048/1024/512, latent 256, batch 4096, bf16) measured 0.453 M
frames/s = 77 % MFU on XLA, the lowest-utilization dense family, and the
round-3 per-layer fused-backward probe (deep_bwd_probe.py) retired kernel
quality as the cause.  This probe splits the step into its three phases
and times each with the house chained-dispatch methodology, next to an
analytic roofline:

  * ``full``  — loss + grads + Adam update (the real step)
  * ``grads`` — value_and_grad only (grads consumed into the carry)
  * ``adam``  — optimizer update only, fixed grads (pure optimizer
    bandwidth: read g/m/v/p, write m/v/p — 7 fp32 streams over ~56 M
    params ≈ 1.57 GB/step)

Hypothesis being tested (round 4): the 23 % non-MXU share is NOT a
scheduling defect — it is the Adam stream time, unamortized because deep
has ~14× dense's parameter bytes at the same batch.  If
``t_full ≈ t_grads + t_adam`` and ``t_adam ≈ adam_bytes / HBM_bw``, the
residual is pinned: optimizer bandwidth, only addressable by changing
batch size or moment precision, not by scheduling.

OUTCOME (round 4): the decomposition held directionally but the remedy
failed — a fused Pallas Adam (one 7-stream pass per leaf, 0-ULP match to
optax) measured SLOWER in both dispatch contexts (deep shallow -24.5 %,
scan -2.2 %; see ``adam_fusion_ab.py``).  XLA already fuses the optax
elementwise chain per leaf and overlaps it with the backward tail, so
``t_adam`` measured in isolation OVERSTATES its marginal cost inside the
real step.  Use this probe as a bounding tool, not an attribution.

Run on TPU from the repo root:
    python benchmarks/deep_step_probe.py [--batch 4096] [--chain 50]

Reference being measured: the deep/wide variant extends
rawvae/model.py:5-35's single-hidden-layer VAE; Adam per train.py:163.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _timed(run, *args, windows=3, chain=50):
    """Best-of-windows seconds per chained step; fetches a real value after
    warmup AND after each window (axon tunnel: async compile +
    block_until_ready unreliability — CLAUDE.md timing methodology)."""
    out = run(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(leaf).ravel()[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = run(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(leaf).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--backend", type=str, default="xla")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="v5e HBM bandwidth for the analytic rows")
    args = ap.parse_args()

    import bench
    from rawaudiovae_kelsey_tpu.models import build_model, param_count
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.parallel.step import make_loss_fn
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = bench._build_cfg("deep", args.batch, args.precision, args.backend)
    seg = cfg.audio.segment_length
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    one_step = build_train_step(model, cfg, opt, donate=False)
    loss_fn = make_loss_fn(model, cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(-1, 1, (args.batch, seg))
                        .astype(np.float32))
    chain = args.chain

    @jax.jit
    def run_full(state, batch):
        def body(s, _):
            s, m = one_step(s, batch)
            return s, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=chain)
        return losses[-1], s

    @jax.jit
    def run_grads(state, batch):
        # grads consumed into the carried batch (1e-30 feedback — the
        # house un-hoistable dependency), Adam excluded
        def body(b, _):
            (loss, _), grads = grad_fn(state.params, state.rng, b)
            dep = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return b + (dep * 1e-30).astype(b.dtype), loss
        b, losses = jax.lax.scan(body, batch, None, length=chain)
        return losses[-1], b

    # fixed grads for the optimizer-only chain: one real backward's output
    (_, _), grads0 = jax.jit(grad_fn)(state.params, state.rng, batch)

    @jax.jit
    def run_adam(state, grads):
        def body(s, _):
            updates, opt_state = opt.update(grads, s.opt_state, s.params)
            import optax
            params = optax.apply_updates(s.params, updates)
            import dataclasses
            return dataclasses.replace(
                s, params=params, opt_state=opt_state,
                step=s.step + 1), ()
        s, _ = jax.lax.scan(body, state, None, length=chain)
        return jax.tree_util.tree_leaves(s.params)[0].ravel()[:1], s

    t_full = _timed(run_full, state, batch, chain=chain)
    t_grads = _timed(run_grads, state, batch, chain=chain)
    t_adam = _timed(run_adam, state, grads0, chain=chain)

    n_params = param_count(params)
    flops_frame = bench.flops_per_frame("deep")
    mxu_floor = args.batch * flops_frame / bench.V5E_BF16_PEAK
    adam_bytes = 7 * 4 * n_params          # r g/m/v/p + w m/v/p, fp32
    adam_floor = adam_bytes / (args.hbm_gbps * 1e9)

    print(f"deep step decomposition  B={args.batch} chain={chain} "
          f"{args.precision}/{args.backend}  params={n_params/1e6:.1f}M")
    print(f"  full step : {t_full*1e3:7.3f} ms   "
          f"({args.batch/t_full/1e6:.3f} M frames/s, "
          f"MFU {args.batch*flops_frame/bench.V5E_BF16_PEAK/t_full:.1%})")
    print(f"  grads only: {t_grads*1e3:7.3f} ms   "
          f"(MXU floor {mxu_floor*1e3:.3f} ms)")
    print(f"  adam only : {t_adam*1e3:7.3f} ms   "
          f"(7-stream fp32 floor {adam_floor*1e3:.3f} ms @ "
          f"{args.hbm_gbps:.0f} GB/s)")
    print(f"  grads+adam: {(t_grads+t_adam)*1e3:7.3f} ms vs full "
          f"{t_full*1e3:.3f} ms -> overlap/residual "
          f"{(t_grads+t_adam-t_full)*1e3:+.3f} ms")
    print(f"  non-MXU share of full step: "
          f"{(t_full-mxu_floor)/t_full:.1%} "
          f"(adam floor alone is {adam_floor/t_full:.1%})")


if __name__ == "__main__":
    main()
