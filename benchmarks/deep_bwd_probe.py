"""A/B probe: fused per-layer backward for large (deep-variant) linears.

The deep variant's backward today is plain XLA dots (`ops/pallas_linear._bwd`)
— XLA materializes the activation cotangent ``da = act'(y)·dy`` (B×N) in HBM
and reads it back for dx, dW and db.  The candidate kernels here recompute
``da`` in-register inside BOTH consumer dots at zero extra HBM traffic:

  * ``dw_fused``: grid (nj, bc), dW panel (k, block_n) resident in VMEM f32 —
    y/dy tiles are indexed (bc, nj) so each is read exactly ONCE across the
    grid; db accumulates in the same kernel.  Avoided traffic per layer:
    da write + da read + db read (~3·|da|).
  * ``dx_fused``: grid (bi, nc), dx accumulator (block_b, k) resident — y/dy
    read once; W streamed (re-read B/block_b times, same economics as any
    blocked dot).

Run on TPU from the repo root:
    python benchmarks/deep_bwd_probe.py [--n 4096] [--k 4096] [--batch 4096]

Decision rule (CLAUDE.md round-3 notes): wire into pallas_linear's VJP only
if the fused pair beats the XLA-dot backward by >3% at the deep variant's
big-layer shapes; otherwise document why recompute-fusion cannot win when
the cotangent's operands are as large as the cotangent itself.

VERDICT (measured round 3, v5e, chain-50 in-jit dependency chain): the
fused pair lands at 98–100% of the XLA-dot backward at EVERY deep layer
shape (4096²: 2.61 vs 2.60 ms; 4096×2048: 1.79 vs 1.78; 2048×1024:
1.19 vs 1.17; 1024×512: 1.04 vs 1.03) — XLA fuses the activation
cotangent into the dot prologues already, and the dots' mandatory x/W/dy
HBM streams dominate the ~3·|da| the recompute saves.  Retired; the
deep-variant backward stays on XLA dots (docs/PERF.md).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (  # noqa: E402
    _interpret,
    mosaic_precision_scope,
)

VMEM_LIMIT = 64 * 1024 * 1024


def _da(act, y_ref, dy_ref, dtype):
    y = y_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    if act == "relu":
        da = jnp.where(y > 0.0, dy, 0.0)
    elif act == "tanh":
        da = dy * (1.0 - y * y)
    else:
        da = dy
    return da.astype(dtype)


def _dw_kernel(x_ref, y_ref, dy_ref, dw_ref, db_ref, *, act, dtype):
    bc = pl.program_id(1)

    @pl.when(bc == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    da = _da(act, y_ref, dy_ref, dtype)
    dw_ref[:] += jax.lax.dot_general(
        x_ref[:], da, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(da, axis=0, keepdims=True, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("act", "block_b", "block_n"))
def dw_fused(x, y, dy, act="relu", block_b=512, block_n=512):
    B, k = x.shape
    n = y.shape[1]
    with mosaic_precision_scope():
        dw, db = pl.pallas_call(
            functools.partial(_dw_kernel, act=act, dtype=x.dtype),
            grid=(n // block_n, B // block_b),
            in_specs=[
                pl.BlockSpec((block_b, k), lambda j, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, block_n), lambda j, c: (c, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, block_n), lambda j, c: (c, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k, block_n), lambda j, c: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda j, c: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((k, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
            ],
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(x, y, dy)
    return dw, db.reshape(-1)


def _dx_kernel(y_ref, dy_ref, w_ref, dx_ref, acc_ref, *, act, dtype, nn):
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    da = _da(act, y_ref, dy_ref, dtype)
    # da (bb, bn) @ W[nc]ᵀ — W block is (bn, k) already row-sliced
    acc_ref[:] += jax.lax.dot_general(
        da, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(nc == nn - 1)
    def _():
        dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "block_b", "block_n"))
def dx_fused(y, dy, w, act="relu", block_b=512, block_n=512):
    B, n = y.shape
    k = w.shape[0]
    nn = n // block_n
    with mosaic_precision_scope():
        dx = pl.pallas_call(
            functools.partial(_dx_kernel, act=act, dtype=y.dtype, nn=nn),
            grid=(B // block_b, nn),
            in_specs=[
                pl.BlockSpec((block_b, block_n), lambda i, c: (i, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, block_n), lambda i, c: (i, c),
                             memory_space=pltpu.VMEM),
                # W is (k, n): take the (k, block_n) column panel, contract
                # da's n-block against it
                pl.BlockSpec((k, block_n), lambda i, c: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, k), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, k), y.dtype),
            scratch_shapes=[pltpu.VMEM((block_b, k), jnp.float32)],
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(y, dy, w)
    return dx


@functools.partial(jax.jit, static_argnames=("act",))
def xla_bwd(x, y, dy, w, act="relu"):
    if act == "relu":
        da = jnp.where(y > 0, dy, 0.0)
    elif act == "tanh":
        da = dy * (1.0 - y * y)
    else:
        da = dy
    da = da.astype(dy.dtype)
    dx = (da @ w.T).astype(x.dtype)
    dw = jax.lax.dot_general(x, da, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    db = jnp.sum(da, axis=0, dtype=jnp.float32)
    return dx, dw, db


@functools.partial(jax.jit, static_argnames=("act",))
def fused_bwd(x, y, dy, w, act="relu"):
    dw, db = dw_fused(x, y, dy, act)
    dx = dx_fused(y, dy, w, act)
    return dx, dw, db


def _time_chained(bwd_fn, x, y, dy, w, act, chain=50, windows=3):
    """Device time per backward via a TRUE dependency chain inside one jit:
    independent repeated calls with large outputs do NOT amortize the
    ~28 ms tunnel dispatch (measured: a bare 4096^3 matmul reads 4 TF that
    way vs 77 TF chained).  Each step's dy consumes the previous step's
    full dx/dw/db scaled by 1e-30 — forces complete materialization,
    serializes the chain, perturbs nothing measurably."""

    @jax.jit
    def run(x, y, dy, w):
        # operands as ARGUMENTS, not closure constants: constants embed in
        # the executable and re-ship through the tunnel per call
        def step(dyc, _):
            dx, dw, db = bwd_fn(x, y, dyc, w, act)
            dep = (dx * 1e-30 if dx.shape == dy.shape  # non-square probes
                   else dx.sum() * 1e-30)
            nxt = (dy + dep + (dw.sum() + db.sum()) * 1e-30).astype(dy.dtype)
            return nxt, ()
        out, _ = jax.lax.scan(step, dy, None, length=chain)
        # return ONE element: device_get of the full (B, n) carry drags
        # ~32 MB back through the ~18 MB/s tunnel INSIDE the timed window
        # (measured: it turned a 2.7 ms backward into "36 ms")
        return out[0, :1]

    out = run(x, y, dy, w)
    jax.block_until_ready(out)
    float(jax.device_get(out).ravel()[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = run(x, y, dy, w)
        jax.block_until_ready(out)
        float(jax.device_get(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--act", type=str, default="relu")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    kx, ky, kd, kw = jax.random.split(key, 4)
    x = jax.random.normal(kx, (args.batch, args.k), dt)
    y = jax.random.normal(ky, (args.batch, args.n), dt)
    dy = jax.random.normal(kd, (args.batch, args.n), dt) * 0.01
    w = jax.random.normal(kw, (args.k, args.n), dt) * 0.01

    # parity first
    rx, rw, rb = xla_bwd(x, y, dy, w, args.act)
    fx, fw, fb = fused_bwd(x, y, dy, w, args.act)
    import numpy as np
    for name, a, b in (("dx", rx, fx), ("dw", rw, fw), ("db", rb, fb)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1e-30, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        print(f"parity {name}: rel max err {err:.2e}")
        assert err < 2e-2, (name, err)

    flops = 2 * args.batch * args.k * args.n * 2  # dx + dw dots
    t_xla = _time_chained(xla_bwd, x, y, dy, w, args.act)
    t_fused = _time_chained(fused_bwd, x, y, dy, w, args.act)

    def only_dw(x, y, dyc, w, act):
        dw, db = dw_fused(x, y, dyc, act)
        return jnp.zeros((1, 1), dyc.dtype), dw, db

    def only_dx(x, y, dyc, w, act):
        dx = dx_fused(y, dyc, w, act)
        return dx, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)

    t_dw = _time_chained(only_dw, x, y, dy, w, args.act)
    t_dx = _time_chained(only_dx, x, y, dy, w, args.act)
    print(f"shape B={args.batch} k={args.k} n={args.n} act={args.act} "
          f"dtype={args.dtype}")
    print(f"xla   bwd: {t_xla*1e3:8.3f} ms  {flops/t_xla/1e12:6.1f} TF")
    print(f"fused bwd: {t_fused*1e3:8.3f} ms  {flops/t_fused/1e12:6.1f} TF "
          f"({t_xla/t_fused*100:.1f}% of xla speed... >100 = fused wins)")
    print(f"  dw_fused alone: {t_dw*1e3:8.3f} ms")
    print(f"  dx_fused alone: {t_dx*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
