"""Pallas TPU kernels for the dense VAE hot path.

The entire device workload of the reference model is four GEMM chains
(SURVEY.md §3.3: ~12.6 MFLOP/frame): encoder ``relu(x@W1+b1)`` feeding two
latent heads, and decoder ``tanh(relu(z@W3+b3)@W4+b4)``.

Design (sized for the ~16 MB VMEM scoped limit of a v5e core):

  * forward: one fused kernel per chain — weights pinned in VMEM across the
    whole grid (constant index_map), batch tiled at ``DEFAULT_BLOCK_B`` rows,
    bias + ReLU/tanh on the VPU in the same pass, hidden activations written
    once as the residual the backward needs;
  * backward: built from small reusable primitives so every kernel fits
    VMEM —
      - :func:`matmul_nt` / masked variants: cotangent × transposed weight
        (input gradients), weights resident;
      - :func:`grad_accum`: ``aᵀ @ b`` + column-sum accumulated across batch
        tiles in VMEM via the sequential-grid revisit pattern (outputs use a
        constant index_map; tile 0 zero-initializes);
  * batch is zero-padded to the tile size; padded rows carry zero cotangents
    so they contribute nothing to weight gradients;
  * biases travel as (1, n) tiles — TPU block shapes must be ≥ 2-D.

All kernels run in interpret mode off-TPU, which is how the CPU test suite
parity-checks them against the XLA implementations (tests/test_pallas.py).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 128          # fp32 tiles; bf16 halves VMEM so 256 fits


def _default_block(dtype) -> int:
    # batch-tile rows sized to the ~16 MB VMEM scoped limit: 16-bit data
    # fits larger tiles (512 rows measured +2% full-step throughput over 256
    # at bf16 batch 4096 — fewer grid steps amortize the weight-resident
    # panels better).  The 3-pass tier's bf16 weight stacks would fit
    # 256-row fp32 tiles, but 256 measured no faster than 128 (1.26 vs
    # 1.28 M frames/s) — one common tile for all tiers.
    return 512 if jnp.dtype(dtype).itemsize <= 2 else DEFAULT_BLOCK_B


def _interpret() -> bool:
    platform = jax.devices()[0].platform.lower()
    return not ("tpu" in platform or "axon" in platform)


def ambient_precision_tier() -> str:
    """The jax.default_matmul_precision tier active at trace time
    ("default" | "high" | "highest" | ...).  Config context managers are
    part of the jit cache key, so reading this inside a jitted function
    retraces correctly per tier."""
    v = jax.config.jax_default_matmul_precision
    return str(v).lower() if v is not None else "default"


def mosaic_precision_scope():
    """Context for tracing Mosaic kernels: Mosaic supports only DEFAULT and
    HIGHEST dot precision — an ambient HIGH (bf16 3-pass) would abort
    compilation, so upgrade it to HIGHEST for any dot that hasn't pinned
    its own precision.  The dense kernels and the Toeplitz conv instead
    run their native bf16 hi/lo split under HIGH (:func:`_ambient_passes`),
    whose dots pin DEFAULT explicitly and ignore the ambient tier."""
    if ambient_precision_tier() in ("high", "tensorfloat32", "bfloat16_3x"):
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


def _split_hi_lo(v):
    """f32 → (bf16 hi, bf16 lo) with v ≈ hi + lo.  The hi part is rounded
    via bit arithmetic, not dtype casts: with --xla_allow_excess_precision
    the compiler folds a bf16→f32 round-trip into identity, which would
    silently zero the lo term and degrade a 3-pass dot to single-pass."""
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        (u + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi.astype(jnp.bfloat16), (v - hi).astype(jnp.bfloat16)


def _ambient_passes(dtype) -> int:
    """Dot passes for the dense kernels at trace time: fp32 data under the
    ambient HIGH tier runs the bf16 hi/lo 3-pass decomposition (~1e-6 rel
    err, XLA's own bf16_3x recipe) natively inside the kernels — Mosaic
    can't express HIGH, and upgrading to HIGHEST (6-pass) would leave the
    tier 2× slower than XLA's 3-pass."""
    if (jnp.dtype(dtype) == jnp.float32
            and ambient_precision_tier() in ("high", "tensorfloat32",
                                             "bfloat16_3x")):
        return 3
    return 1


def _stack_hi_lo(w):
    """f32 weight → (2, …) bf16 stack [hi, lo], computed OUTSIDE the kernel:
    VMEM then holds half the bytes of the f32 original and the split VPU
    work isn't redone on every grid step."""
    hi, lo = _split_hi_lo(w)
    return jnp.stack([hi, lo])


def _dot_default(u, v, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(u, v, dims,
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)


def _mm(a, w, passes: int, transpose_w: bool = False):
    """a @ w (or a @ wᵀ) with f32 accumulation.  passes=3 → the bf16 hi/lo
    3-pass decomposition: ``w`` is then the pre-split (2, …) bf16 stack
    from :func:`_stack_hi_lo` and ``a`` (f32) is split per tile in-kernel;
    the dots pin DEFAULT precision so the ambient tier can't touch them."""
    if passes == 3:
        wh, wl = w[0], w[1]
        if transpose_w:
            wh, wl = wh.T, wl.T
        ah, al = _split_hi_lo(a)
        return (_dot_default(ah, wh) + _dot_default(ah, wl)) \
            + _dot_default(al, wh)
    if transpose_w:
        w = w.T
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _pad_batch(x: jnp.ndarray, block_b: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    rem = n % block_b
    if rem == 0:
        return x, n
    pad = block_b - rem
    return jnp.pad(x, ((0, pad), (0, 0))), n


def _tile(block_b, cols):
    return pl.BlockSpec((block_b, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _whole(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


# ============================================================ forward fused =

def _enc_fwd_kernel(x_ref, w1_ref, b1_ref, w21_ref, b21_ref, w22_ref, b22_ref,
                    mu_ref, logvar_ref, h_ref, *, passes=1):
    x = x_ref[:]
    h = jnp.maximum(_mm(x, w1_ref[:], passes) + b1_ref[:], 0.0)
    h_ref[:] = h.astype(h_ref.dtype)
    mu_ref[:] = (
        _mm(h.astype(x.dtype), w21_ref[:], passes) + b21_ref[:]
    ).astype(mu_ref.dtype)
    logvar_ref[:] = (
        _mm(h.astype(x.dtype), w22_ref[:], passes) + b22_ref[:]
    ).astype(logvar_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def encoder_fwd(w1, b1, w21, b21, w22, b22, x, block_b: int = 0):
    """Fused relu(x@W1+b1) → (mu, logvar, h)."""
    passes = _ambient_passes(x.dtype)
    block_b = block_b or _default_block(x.dtype)
    x, n = _pad_batch(x, block_b)
    B, seg = x.shape
    units = w1.shape[1]
    latent = w21.shape[1]
    if passes == 3:
        w1, w21, w22 = (_stack_hi_lo(w) for w in (w1, w21, w22))
    wspec = (lambda s: _whole((2, *s))) if passes == 3 else _whole
    with mosaic_precision_scope():
        mu, logvar, h = pl.pallas_call(
            functools.partial(_enc_fwd_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, seg),
                wspec((seg, units)), _whole((1, units)),
                wspec((units, latent)), _whole((1, latent)),
                wspec((units, latent)), _whole((1, latent)),
            ],
            out_specs=[
                _tile(block_b, latent), _tile(block_b, latent),
                _tile(block_b, units),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, latent), x.dtype),
                jax.ShapeDtypeStruct((B, latent), x.dtype),
                jax.ShapeDtypeStruct((B, units), x.dtype),
            ],
            interpret=_interpret(),
        )(x, w1, b1.reshape(1, -1), w21, b21.reshape(1, -1),
          w22, b22.reshape(1, -1))
    return mu[:n], logvar[:n], h[:n]


def _dec_fwd_kernel(z_ref, w3_ref, b3_ref, w4_ref, b4_ref, y_ref, h3_ref,
                    *, passes=1):
    z = z_ref[:]
    h3 = jnp.maximum(_mm(z, w3_ref[:], passes) + b3_ref[:], 0.0)
    h3_ref[:] = h3.astype(h3_ref.dtype)
    y_ref[:] = jnp.tanh(
        _mm(h3.astype(z.dtype), w4_ref[:], passes) + b4_ref[:]
    ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def decoder_fwd(w3, b3, w4, b4, z, block_b: int = 0):
    """Fused tanh(relu(z@W3+b3)@W4+b4) → (y, h3)."""
    passes = _ambient_passes(z.dtype)
    block_b = block_b or _default_block(z.dtype)
    z, n = _pad_batch(z, block_b)
    B, latent = z.shape
    units = w3.shape[1]
    seg = w4.shape[1]
    if passes == 3:
        w3, w4 = _stack_hi_lo(w3), _stack_hi_lo(w4)
    wspec = (lambda s: _whole((2, *s))) if passes == 3 else _whole
    with mosaic_precision_scope():
        y, h3 = pl.pallas_call(
            functools.partial(_dec_fwd_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, latent),
                wspec((latent, units)), _whole((1, units)),
                wspec((units, seg)), _whole((1, seg)),
            ],
            out_specs=[_tile(block_b, seg), _tile(block_b, units)],
            out_shape=[
                jax.ShapeDtypeStruct((B, seg), z.dtype),
                jax.ShapeDtypeStruct((B, units), z.dtype),
            ],
            interpret=_interpret(),
        )(z, w3, b3.reshape(1, -1), w4, b4.reshape(1, -1))
    return y[:n], h3[:n]


# ================================================== backward building blocks

def _matmul_nt_kernel(a_ref, w_ref, out_ref, *, passes=1):
    out_ref[:] = _mm(a_ref[:], w_ref[:], passes,
                     transpose_w=True).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def matmul_nt(a, w, block_b: int = 0):
    """(B, n) @ (m, n)ᵀ → (B, m); weights VMEM-resident, batch tiled."""
    passes = _ambient_passes(a.dtype)
    block_b = block_b or _default_block(a.dtype)
    a, nrows = _pad_batch(a, block_b)
    B, n = a.shape
    m = w.shape[0]
    if passes == 3:
        w = _stack_hi_lo(w)
    wspec = _whole((2, m, n)) if passes == 3 else _whole((m, n))
    with mosaic_precision_scope():
        out = pl.pallas_call(
            functools.partial(_matmul_nt_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[_tile(block_b, n), wspec],
            out_specs=_tile(block_b, m),
            out_shape=jax.ShapeDtypeStruct((B, m), a.dtype),
            interpret=_interpret(),
        )(a, w)
    return out[:nrows]


def _matmul_nt_mask_kernel(a_ref, w_ref, gate_ref, out_ref, *, passes=1):
    prod = _mm(a_ref[:], w_ref[:], passes, transpose_w=True)
    # compare in f32: Mosaic rejects bf16 cmpf on this target
    gate = gate_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.where(gate > 0.0, prod, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def matmul_nt_mask(a, w, gate, block_b: int = 0):
    """ReLU-backward step: ``(a @ wᵀ) * (gate > 0)``."""
    passes = _ambient_passes(a.dtype)
    block_b = block_b or _default_block(a.dtype)
    nrows = a.shape[0]
    a, _ = _pad_batch(a, block_b)
    gate, _ = _pad_batch(gate, block_b)
    B, n = a.shape
    m = w.shape[0]
    if passes == 3:
        w = _stack_hi_lo(w)
    wspec = _whole((2, m, n)) if passes == 3 else _whole((m, n))
    with mosaic_precision_scope():
        out = pl.pallas_call(
            functools.partial(_matmul_nt_mask_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[_tile(block_b, n), wspec, _tile(block_b, m)],
            out_specs=_tile(block_b, m),
            out_shape=jax.ShapeDtypeStruct((B, m), a.dtype),
            interpret=_interpret(),
        )(a, w, gate)
    return out[:nrows]


def _matmul_nt2_mask_kernel(a1_ref, w1_ref, a2_ref, w2_ref, gate_ref, out_ref,
                            *, passes=1):
    prod = (_mm(a1_ref[:], w1_ref[:], passes, transpose_w=True)
            + _mm(a2_ref[:], w2_ref[:], passes, transpose_w=True))
    gate = gate_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.where(gate > 0.0, prod, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def matmul_nt2_mask(a1, w1, a2, w2, gate, block_b: int = 0):
    """Two-head ReLU backward: ``(a1@w1ᵀ + a2@w2ᵀ) * (gate > 0)`` — the
    encoder's dh from (dmu, dlogvar)."""
    passes = _ambient_passes(a1.dtype)
    block_b = block_b or _default_block(a1.dtype)
    nrows = a1.shape[0]
    a1, _ = _pad_batch(a1, block_b)
    a2, _ = _pad_batch(a2, block_b)
    gate, _ = _pad_batch(gate, block_b)
    B, n = a1.shape
    m = w1.shape[0]
    if passes == 3:
        w1, w2 = _stack_hi_lo(w1), _stack_hi_lo(w2)
    wspec = _whole((2, m, n)) if passes == 3 else _whole((m, n))
    with mosaic_precision_scope():
        out = pl.pallas_call(
            functools.partial(_matmul_nt2_mask_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, n), wspec,
                _tile(block_b, n), wspec,
                _tile(block_b, m),
            ],
            out_specs=_tile(block_b, m),
            out_shape=jax.ShapeDtypeStruct((B, m), a1.dtype),
            interpret=_interpret(),
        )(a1, w1, a2, w2, gate)
    return out[:nrows]


def _grad_accum_kernel(a_ref, b_ref, dw_ref, db_ref, *, passes=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    a = a_ref[:]
    b = b_ref[:]
    if passes == 3:
        # both operands are batch tiles — split in-kernel (tile-sized work)
        ah, al = _split_hi_lo(a)
        bh, bl = _split_hi_lo(b)
        dims = (((0,), (0,)), ((), ()))       # aᵀ @ b: contract batch dim
        dw_ref[:] += ((_dot_default(ah, bh, dims)
                       + _dot_default(ah, bl, dims))
                      + _dot_default(al, bh, dims))
    else:
        dw_ref[:] += jnp.dot(a.T, b, preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(b, axis=0, keepdims=True, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def grad_accum(a, b, block_b: int = 0):
    """Weight/bias gradients of ``y = a @ W + bias`` given cotangent ``b``:
    ``(aᵀ @ b, colsum(b))`` accumulated over batch tiles in VMEM."""
    block_b = block_b or _default_block(a.dtype)
    a, _ = _pad_batch(a, block_b)
    b, _ = _pad_batch(b, block_b)
    B, n = a.shape
    m = b.shape[1]
    with mosaic_precision_scope():
        dw, db = pl.pallas_call(
            functools.partial(_grad_accum_kernel,
                              passes=_ambient_passes(a.dtype)),
            grid=(B // block_b,),
            in_specs=[_tile(block_b, n), _tile(block_b, m)],
            out_specs=[_whole((n, m)), _whole((1, m))],
            out_shape=[
                jax.ShapeDtypeStruct((n, m), jnp.float32),
                jax.ShapeDtypeStruct((1, m), jnp.float32),
            ],
            interpret=_interpret(),
        )(a, b)
    return dw, db.reshape(-1)


# ======================================================= composite backward

def encoder_bwd(w1, w21, w22, x, h, dmu, dlogvar,
                block_b: int = 0):
    """Backward of :func:`encoder_fwd` → (dx, dW1, db1, dW21, db21, dW22,
    db22), all via Pallas primitives."""
    dh = matmul_nt2_mask(dmu, w21, dlogvar, w22, h, block_b=block_b)
    dx = matmul_nt(dh, w1, block_b=block_b)
    dw1, db1 = grad_accum(x, dh, block_b=block_b)
    dw21, db21 = grad_accum(h, dmu, block_b=block_b)
    dw22, db22 = grad_accum(h, dlogvar, block_b=block_b)
    return dx, dw1, db1, dw21, db21, dw22, db22


def decoder_bwd(w3, w4, z, h3, y, dy, block_b: int = 0):
    """Backward of :func:`decoder_fwd` → (dz, dW3, db3, dW4, db4).  The tanh
    derivative ``da = dy·(1−y²)`` is a cheap elementwise op left to XLA
    fusion; the GEMMs run in Pallas."""
    da = (dy * (1.0 - y * y)).astype(dy.dtype)
    dh3 = matmul_nt_mask(da, w4, h3, block_b=block_b)
    dz = matmul_nt(dh3, w3, block_b=block_b)
    dw4, db4 = grad_accum(h3, da, block_b=block_b)
    dw3, db3 = grad_accum(z, dh3, block_b=block_b)
    return dz, dw3, db3, dw4, db4


# ===================================================== custom-VJP wrappers ==

@jax.custom_vjp
def pallas_encode(params, x):
    """Drop-in for models.vae.encode on the dense layout, Pallas-fused."""
    mu, logvar, _ = encoder_fwd(
        params["fc1"]["w"], params["fc1"]["b"],
        params["fc21"]["w"], params["fc21"]["b"],
        params["fc22"]["w"], params["fc22"]["b"], x,
    )
    return mu, logvar


def _pallas_encode_fwd(params, x):
    mu, logvar, h = encoder_fwd(
        params["fc1"]["w"], params["fc1"]["b"],
        params["fc21"]["w"], params["fc21"]["b"],
        params["fc22"]["w"], params["fc22"]["b"], x,
    )
    return (mu, logvar), (params, x, h)


def _pallas_encode_bwd(res, cts):
    params, x, h = res
    dmu, dlogvar = cts
    dx, dw1, db1, dw21, db21, dw22, db22 = encoder_bwd(
        params["fc1"]["w"], params["fc21"]["w"], params["fc22"]["w"],
        x, h, dmu, dlogvar,
    )
    dt = params["fc1"]["w"].dtype
    dparams = {
        "fc1": {"w": dw1.astype(dt), "b": db1.astype(dt)},
        "fc21": {"w": dw21.astype(dt), "b": db21.astype(dt)},
        "fc22": {"w": dw22.astype(dt), "b": db22.astype(dt)},
        "fc3": jax.tree_util.tree_map(jnp.zeros_like, params["fc3"]),
        "fc4": jax.tree_util.tree_map(jnp.zeros_like, params["fc4"]),
    }
    return dparams, dx


pallas_encode.defvjp(_pallas_encode_fwd, _pallas_encode_bwd)


@jax.custom_vjp
def pallas_decode(params, z):
    """Drop-in for models.vae.decode on the dense layout, Pallas-fused."""
    y, _ = decoder_fwd(
        params["fc3"]["w"], params["fc3"]["b"],
        params["fc4"]["w"], params["fc4"]["b"], z,
    )
    return y


def _pallas_decode_fwd(params, z):
    y, h3 = decoder_fwd(
        params["fc3"]["w"], params["fc3"]["b"],
        params["fc4"]["w"], params["fc4"]["b"], z,
    )
    return y, (params, z, h3, y)


def _pallas_decode_bwd(res, dy):
    params, z, h3, y = res
    dz, dw3, db3, dw4, db4 = decoder_bwd(
        params["fc3"]["w"], params["fc4"]["w"], z, h3, y, dy,
    )
    dt = params["fc3"]["w"].dtype
    dparams = {
        "fc1": jax.tree_util.tree_map(jnp.zeros_like, params["fc1"]),
        "fc21": jax.tree_util.tree_map(jnp.zeros_like, params["fc21"]),
        "fc22": jax.tree_util.tree_map(jnp.zeros_like, params["fc22"]),
        "fc3": {"w": dw3.astype(dt), "b": db3.astype(dt)},
        "fc4": {"w": dw4.astype(dt), "b": db4.astype(dt)},
    }
    return dparams, dz


pallas_decode.defvjp(_pallas_decode_fwd, _pallas_decode_bwd)
