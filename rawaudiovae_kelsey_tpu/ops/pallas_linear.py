"""Generic fused linear+activation Pallas kernel with output-dim tiling.

The dense-VAE kernels in ``pallas_mlp.py`` pin whole weight matrices in VMEM
— fine at the reference sizes, impossible for the deep/wide variant's
4096-wide layers (a 4096×4096 fp32 weight is 64 MB against a ~16 MB scoped
limit).  This kernel tiles the **output** dimension instead: grid =
``(batch_tiles, n_tiles)``, each step holds one ``(k, block_n)`` weight
column-panel plus one ``(block_b, k)`` activation tile, computes the full-k
contraction in a single MXU pass, and applies bias + activation in-register.
Constraints: ``k`` (the contraction dim) must fit a tile alongside its panel
— true for any layer up to k≈8192 fp32 at the default blocks.

Forward-only with a custom VJP whose backward uses the same tiling through
``jnp`` einsums under jit (XLA tiles those optimally; the forward fusion —
bias+activation never touching HBM — is where Pallas adds value here).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (
    _act,
    _interpret,
    _pad_batch,
    mosaic_precision_scope,
)

BLOCK_B = 128
BLOCK_N = 256


def _linear_kernel(x_ref, w_ref, b_ref, out_ref, *, act):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = _act(act, acc + b_ref[:]).astype(out_ref.dtype)


def _linear_ksplit_kernel(x_ref, w_ref, b_ref, out_ref, acc_ref, *, act, nk):
    """Contraction-split matmul with the sequential-grid revisit pattern:
    grid (i, j, kc) with kc innermost; the f32 VMEM accumulator carries the
    partial sums across the kc revisits of output block (i, j), and the
    bias + activation epilogue fires on the last k-slice."""
    kc = pl.program_id(2)

    @pl.when(kc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(kc == nk - 1)
    def _epilogue():
        out_ref[:] = _act(act, acc_ref[:]
                          + b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


# k-split tiles: large output panels balance weight re-reads
# ((B/bb)·|W| bytes) against activation re-reads ((N/bn)·|X|): at
# 4096x4096x4096 bf16 total HBM traffic drops from ~1 GB (whole-k 128x256
# tiles re-reading W per batch tile) to ~0.3 GB.  (1024, 512, 512) measured
# best on v5e — 102 TF vs 87 for the whole-k path (a 5-point sweep;
# 512/1024-square panels all land within 93-102, docs/PERF.md).
KSPLIT_BLOCK_B = 1024
KSPLIT_BLOCK = 512
KSPLIT_BLOCK_K = 512


@functools.partial(jax.jit, static_argnames=("act", "block_b", "block_n",
                                             "block_k"))
def linear_ksplit_fwd(x, w, b, act: str = "none",
                      block_b: int = KSPLIT_BLOCK_B,
                      block_n: int = KSPLIT_BLOCK,
                      block_k: int = KSPLIT_BLOCK_K):
    """act(x @ w + b) with batch, output AND contraction dims tiled —
    the large-layer path where both operands stream from HBM."""
    x, nrows = _pad_batch(x, block_b)
    B, k = x.shape
    n = w.shape[1]
    pad_n = (-n) % block_n
    pad_k = (-k) % block_k
    if pad_k:  # zero k-padding adds nothing to the contraction
        x = jnp.pad(x, ((0, 0), (0, pad_k)))
        w = jnp.pad(w, ((0, pad_k), (0, 0)))
    if pad_n:
        w = jnp.pad(w, ((0, 0), (0, pad_n)))
        b = jnp.pad(b, (0, pad_n))
    K, N = k + pad_k, n + pad_n
    nk = K // block_k
    with mosaic_precision_scope():
        out = pl.pallas_call(
            functools.partial(_linear_ksplit_kernel, act=act, nk=nk),
            grid=(B // block_b, N // block_n, nk),
            in_specs=[
                pl.BlockSpec((block_b, block_k), lambda i, j, kc: (i, kc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, block_n), lambda i, j, kc: (kc, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j, kc: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, block_n),
                                   lambda i, j, kc: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32)],
            interpret=_interpret(),
        )(x, w, b.reshape(1, -1))
    return out[:nrows, :n]


@functools.partial(jax.jit, static_argnames=("act", "block_b", "block_n"))
def linear_fwd(x, w, b, act: str = "none",
               block_b: int = BLOCK_B, block_n: int = BLOCK_N):
    """act(x @ w + b) with the output dim tiled so arbitrarily wide layers
    fit VMEM.  Shapes: x (B, k), w (k, n), b (n,)."""
    x, nrows = _pad_batch(x, block_b)
    B, k = x.shape
    n = w.shape[1]
    pad_n = (-n) % block_n
    if pad_n:
        w = jnp.pad(w, ((0, 0), (0, pad_n)))
        b = jnp.pad(b, (0, pad_n))
    N = n + pad_n
    with mosaic_precision_scope():
        out = pl.pallas_call(
            functools.partial(_linear_kernel, act=act),
            grid=(B // block_b, N // block_n),
            in_specs=[
                pl.BlockSpec((block_b, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, block_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
            interpret=_interpret(),
        )(x, w, b.reshape(1, -1))
    return out[:nrows, :n]


def _dispatch_fwd(x, w, b, act):
    """Large layers (both operands streaming, k-split pays for its panel
    revisits) take the contraction-split kernel; smaller ones keep the
    single-pass whole-k kernel."""
    if (x.shape[0] >= KSPLIT_BLOCK_B and w.shape[0] >= 2 * KSPLIT_BLOCK_K
            and w.shape[1] >= KSPLIT_BLOCK):
        return linear_ksplit_fwd(x, w, b, act)
    return linear_fwd(x, w, b, act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_linear(x, w, b, act: str = "none"):
    """Differentiable fused linear+activation (relu | tanh | none)."""
    return _dispatch_fwd(x, w, b, act)


def _fwd(x, w, b, act):
    y = _dispatch_fwd(x, w, b, act)
    return y, (x, w, y)


def _bwd(act, res, dy):
    x, w, y = res
    if act == "relu":
        da = jnp.where(y > 0, dy, 0.0)
    elif act == "tanh":
        da = dy * (1.0 - y * y)
    else:
        da = dy
    da = da.astype(dy.dtype)
    dx = (da @ w.T).astype(x.dtype)
    dw = (x.T @ da).astype(w.dtype)
    db = jnp.sum(da, axis=0).astype(w.dtype)
    return dx, dw, db


pallas_linear.defvjp(_fwd, _bwd)


def deep_encode_pallas(params, x) -> Tuple[jax.Array, jax.Array]:
    """Deep-MLP encoder (models/variants.py layout) on fused kernels."""
    h = x
    for layer in params["enc"]:
        h = pallas_linear(h, layer["w"], layer["b"], "relu")
    mu = pallas_linear(h, params["mu_head"]["w"], params["mu_head"]["b"],
                       "none")
    logvar = pallas_linear(h, params["logvar_head"]["w"],
                           params["logvar_head"]["b"], "none")
    return mu, logvar


def deep_decode_pallas(params, z) -> jax.Array:
    h = z
    for layer in params["dec"][:-1]:
        h = pallas_linear(h, layer["w"], layer["b"], "relu")
    last = params["dec"][-1]
    return pallas_linear(h, last["w"], last["b"], "tanh")
