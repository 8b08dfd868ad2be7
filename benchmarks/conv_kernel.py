"""Microbenchmark: halo-window Toeplitz conv vs XLA implicit-GEMM conv.

Target shape from VERDICT round-1 item 1: (B=256, L=1024, Cin=32) -> Cout=64,
K=9, S=4 — the conv1d variant's hot layer.  Methodology per docs/PERF.md:
chained dispatch inside one jitted scan; the carry feeds each op's gradients
back into the inputs at 1e-30 so nothing is loop-invariant and XLA cannot
hoist the conv or its backward out of the loop; gradients are taken w.r.t.
input AND weights (dw is real work).  A no-op chain calibrates the loop
overhead.  Run from /root/repo: python benchmarks/conv_kernel.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rawaudiovae_kelsey_tpu.models import variants
from rawaudiovae_kelsey_tpu.ops.pallas_conv import (
    conv1d_pallas,
    conv1d_transpose_pallas,
)


def timed(fn, args, chain, reps=3):
    out = jax.device_get(fn(*args))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        val = float(jax.device_get(jnp.asarray(out).ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / chain)
        assert np.isfinite(val)
    return best


def bench_one(name, fwd_fn, x, w, b, chain):
    """fwd_fn(x, w, b) -> y.  Times forward-only and forward+backward
    (grads w.r.t. x, w, b — the train-step shape)."""
    @jax.jit
    def fwd_chain(x0):
        def body(c, _):
            y = fwd_fn(c, w, b)
            return c + jnp.sum(y) * 1e-30, ()
        c, _ = jax.lax.scan(body, x0, None, length=chain)
        return jnp.sum(c)

    def loss(xx, ww, bb):
        return 0.5 * jnp.sum(fwd_fn(xx, ww, bb).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step_chain(x0, w0, b0):
        def body(c, _):
            xx, ww, bb = c
            gx, gw, gb = g(xx, ww, bb)
            return (xx + gx * 1e-30, ww + gw * 1e-30, bb + gb * 1e-30), ()
        (xx, _, _), _ = jax.lax.scan(body, (x0, w0, b0), None, length=chain)
        return jnp.sum(xx)

    f = timed(fwd_chain, (x,), chain) * 1e3
    s = timed(step_chain, (x, w, b), chain) * 1e3
    print(f"{name:44s} fwd {f:8.3f} ms   fwd+bwd {s:8.3f} ms")
    return f, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    # loop-overhead floor: body is a single cheap elementwise op
    x0 = jnp.asarray(rng.standard_normal((256, 1024, 32)), dt)

    @jax.jit
    def noop_chain(v):
        def body(c, _):
            return c * 1.0000001, ()
        c, _ = jax.lax.scan(body, v, None, length=args.chain)
        return jnp.sum(c)

    print(f"chain overhead floor: "
          f"{timed(noop_chain, (x0,), args.chain) * 1e3:.3f} ms/iter")

    cases = [
        ("conv  (256,1024,32)->64 K9 S4", 256, 1024, 32, 64, 9, 4, False),
        ("convT (256, 256,64)->32 K9 S4", 256, 256, 64, 32, 9, 4, True),
    ]
    tol = 5e-2 if dt == jnp.bfloat16 else 1e-4
    for name, B, L, cin, cout, K, S, transpose in cases:
        x = jnp.asarray(rng.standard_normal((B, L, cin)), dt)
        w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.05, dt)
        b = jnp.asarray(rng.standard_normal(cout) * 0.05, dt)
        if transpose:
            xla_f = lambda v, ww, bb: variants._conv_transpose(
                {"w": ww, "b": bb}, v, S).astype(v.dtype)
            pal_f = lambda v, ww, bb: conv1d_transpose_pallas(v, ww, bb, S,
                                                              "none")
        else:
            xla_f = lambda v, ww, bb: variants._conv(
                {"w": ww, "b": bb}, v, S).astype(v.dtype)
            pal_f = lambda v, ww, bb: conv1d_pallas(v, ww, bb, S, "none")
        d = float(jnp.max(jnp.abs(xla_f(x, w, b).astype(jnp.float32)
                                  - pal_f(x, w, b).astype(jnp.float32))))
        print(f"{name}: max|Δ| = {d:.2e}")
        assert d < tol, d
        bench_one("  xla    " + name, xla_f, x, w, b, args.chain)
        bench_one("  pallas " + name, pal_f, x, w, b, args.chain)


if __name__ == "__main__":
    main()
