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
    _interpret,
    _pad_batch,
    mosaic_precision_scope,
)

BLOCK_B = 128
BLOCK_N = 256


def _act(name: str, x):
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "none":
        return x
    raise ValueError(f"unknown activation {name!r}")


def _linear_kernel(x_ref, w_ref, b_ref, out_ref, *, act):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = _act(act, acc + b_ref[:]).astype(out_ref.dtype)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_linear(x, w, b, act: str = "none"):
    """Differentiable fused linear+activation (relu | tanh | none)."""
    return linear_fwd(x, w, b, act)


def _fwd(x, w, b, act):
    y = linear_fwd(x, w, b, act)
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
