"""Pallas TPU kernels for the dense VAE hot path.

The entire device workload of the reference model is four GEMM chains
(SURVEY.md §3.3: ~12.6 MFLOP/frame): encoder ``relu(x@W1+b1)`` feeding two
latent heads, and decoder ``tanh(relu(z@W3+b3)@W4+b4)``.

Design:

  * forward: one fused kernel per chain — weights pinned in VMEM across the
    whole grid (constant index_map), batch tiled, bias + ReLU/tanh on the
    VPU in the same pass, hidden activations written once as the residual
    the backward needs;
  * backward (round 3): TWO fused kernels per chain, with the big hidden
    cotangents kept entirely in-register —
      - :func:`enc_bwd_dw1`: ``dh = (dmu@W21ᵀ + dlogvar@W22ᵀ)·(h>0)`` feeds
        ``(dW1, db1)`` in the same kernel; ``dh`` (B×units) never touches
        HBM.  :func:`grad_accum2` produces both latent-head gradients from
        ONE read of ``h``;
      - :func:`dec_bwd_fused`: ``dh3`` in-register feeds both ``dz`` (tiled
        output) and ``(dW3, db3)``; :func:`grad_accum` covers ``dW4``;
      - the INPUT gradient ``dx`` stays on separate primitives
        (:func:`matmul_nt2_mask` + :func:`matmul_nt`) so XLA dead-code
        eliminates them whenever only parameter gradients are requested —
        i.e. every training step skips the ``dh@W1ᵀ`` GEMM (12 % of step
        FLOPs), exactly like the XLA backend's autodiff+DCE.  Verified on
        TPU: the compiled train step contains exactly 6 Pallas custom
        calls;
    weight-gradient accumulators use the sequential-grid revisit pattern
    (constant index_map outputs; tile 0 zero-initializes);
  * VMEM: single-pass kernels size their batch tiles against XLA's default
    16 MB scoped budget; the 3-pass fp32 kernels (hi/lo weight stacks +
    f32 accumulators) raise ``vmem_limit_bytes`` to 64 MB — far below
    physical VMEM, see the note at :data:`_VMEM_LIMIT`;
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

# Physical VMEM on a v5e core is far larger than XLA's default 16 MB
# *scoped* budget (a compiler scheduling allowance, not the hardware) —
# measured on this chip: a kernel with a 16 MB resident weight plus 24 MB
# of double-buffered 512-row f32 tiles compiles and runs bit-exact once
# the per-kernel vmem_limit_bytes is raised.  The 3-pass (fp32 "high")
# kernels use that headroom: their hi/lo weight stacks + f32 accumulators
# exceed 16 MB no matter the batch tile (dec_bwd_fused needs 18 MB at
# block 64).  The single-pass tiers stay under the default 16 MB budget:
# raising the limit for them measured SLOWER end-to-end (bf16 full step
# 3.88 vs 4.57 M frames/s — a bigger per-kernel reservation starves the
# scheduler's inter-op overlap), so the limit is applied only where it
# buys feasibility, not speculatively.
_VMEM_LIMIT = 64 * 1024 * 1024

# Context-scoped headroom for single-pass kernels that NEED it (see
# vmem_headroom): inside the device-resident epoch/stream scans XLA's
# scoped-vmem accounting charges a custom call for overlapped loop
# machinery it doesn't charge standalone, and enc_bwd_dw1 (measured
# 16.63 MB there vs under 16 MB standalone) fails AOT compile at the
# 16 MB default.  The raise rides ONLY the resident trainers' traces AND
# only the call sites marked ``headroom=True`` — a blanket raise on every
# single-pass kernel in the scan measured -21% resident direct rate
# (3.45 vs 4.38 M; same starvation effect as the -15% note above), while
# the standalone step keeps the default everywhere.
_VMEM_HEADROOM_DEFAULT = 24 * 1024 * 1024
_vmem_headroom_active = 0


@contextlib.contextmanager
def vmem_headroom(limit_bytes: int = _VMEM_HEADROOM_DEFAULT):
    """Raise vmem_limit_bytes for ``headroom=True`` kernel calls TRACED
    inside this context (pallas_call binds compiler params at trace time,
    so wrapping the body of a jitted trainer is enough).  Used by the
    resident epoch/stream trainers; nestable, last setting wins."""
    global _vmem_headroom_active
    prev = _vmem_headroom_active
    _vmem_headroom_active = limit_bytes
    try:
        yield
    finally:
        _vmem_headroom_active = prev


def _params(passes: int = 1, headroom: bool = False):
    if passes == 3:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    if headroom and _vmem_headroom_active:
        return pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_headroom_active)
    return None


def _default_block(dtype) -> int:
    # batch-tile rows sized to the ~16 MB VMEM scoped limit: 16-bit data
    # fits larger tiles (512 rows measured +2% full-step throughput over 256
    # at bf16 batch 4096 — fewer grid steps amortize the weight-resident
    # panels better).  The 3-pass tier's bf16 weight stacks would fit
    # 256-row fp32 tiles, but 256 measured no faster than 128 (1.26 vs
    # 1.28 M frames/s) — one common tile for all tiers.
    return 512 if jnp.dtype(dtype).itemsize <= 2 else DEFAULT_BLOCK_B


def _act(name: str, x):
    """Activation dispatch shared by the standalone kernels (toeplitz,
    linear) — ONE copy so a new activation can't be added to one and not
    the other."""
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "none":
        return x
    raise ValueError(f"unknown activation {name!r}")


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
            compiler_params=_params(passes),
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
            compiler_params=_params(passes),
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
            compiler_params=_params(passes),
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
            compiler_params=_params(passes),
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
            compiler_params=_params(passes),
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
    passes = _ambient_passes(a.dtype)
    block_b = block_b or _default_block(a.dtype)
    a, _ = _pad_batch(a, block_b)
    b, _ = _pad_batch(b, block_b)
    B, n = a.shape
    m = b.shape[1]
    with mosaic_precision_scope():
        dw, db = pl.pallas_call(
            functools.partial(_grad_accum_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[_tile(block_b, n), _tile(block_b, m)],
            out_specs=[_whole((n, m)), _whole((1, m))],
            out_shape=[
                jax.ShapeDtypeStruct((n, m), jnp.float32),
                jax.ShapeDtypeStruct((1, m), jnp.float32),
            ],
            interpret=_interpret(),
            # headroom: 16.02 MB scoped-vmem charge inside the resident
            # scans (16 K over the default) — needs the raise there too
            compiler_params=_params(passes, headroom=True),
        )(a, b)
    return dw, db.reshape(-1)


# ===================================================== fused backward (r3) =

def _pick_block(row_bytes: int, resident_bytes: int, passes: int = 1,
                candidates=(512, 256, 128, 64)) -> int:
    """Largest batch-tile height whose estimated VMEM footprint fits:
    ``resident`` covers grid-constant blocks (weights, f32 accumulators),
    ``row_bytes`` the per-row cost of all batch-tiled blocks (double-
    buffered by the pipeline, so callers pass 2x the raw row bytes).
    Single-pass kernels budget against the default 16 MB scoped VMEM;
    3-pass kernels run with a raised vmem_limit (see :func:`_params`)."""
    budget = (24 if passes == 3 else 14) * 1024 * 1024
    for b in candidates:
        if resident_bytes + b * row_bytes <= budget:
            return b
    # even the smallest tile exceeds VMEM: fail with an actionable message
    # rather than launching a kernel that dies in an opaque Mosaic
    # RESOURCE_EXHAUSTED at compile time
    raise ValueError(
        f"pallas kernel VMEM-infeasible: resident {resident_bytes} B + "
        f"{candidates[-1]} rows x {row_bytes} B/row exceeds the "
        f"{budget} B budget — this architecture is too wide for the fused "
        "kernels; use [tpu] backend = xla"
    )


def _cols(n: int) -> int:
    return max(n, 128)                  # Mosaic pads the lane dim to 128


def _enc_bwd_dw1_kernel(x_ref, h_ref, dmu_ref, dlogvar_ref, w21_ref, w22_ref,
                        dw1_ref, db1_ref, *, passes=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    prod = (_mm(dmu_ref[:], w21_ref[:], passes, transpose_w=True)
            + _mm(dlogvar_ref[:], w22_ref[:], passes, transpose_w=True))
    gate = h_ref[:].astype(jnp.float32)
    dh = jnp.where(gate > 0.0, prod, 0.0)
    x = x_ref[:]
    dims = (((0,), (0,)), ((), ()))     # xᵀ @ dh: contract the batch dim
    if passes == 3:
        xh, xl = _split_hi_lo(x)
        dhh, dhl = _split_hi_lo(dh)
        dw1_ref[:] += ((_dot_default(xh, dhh, dims)
                        + _dot_default(xh, dhl, dims))
                       + _dot_default(xl, dhh, dims))
        db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True, dtype=jnp.float32)
    else:
        # round dh exactly like the unfused path did when it materialized
        # the intermediate (matmul_nt2_mask wrote bf16) — keeps the fused
        # and primitive backward bit-identical
        dhc = dh.astype(x.dtype)
        dw1_ref[:] += jax.lax.dot_general(
            x, dhc, dims, preferred_element_type=jnp.float32)
        db1_ref[:] += jnp.sum(dhc, axis=0, keepdims=True, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def enc_bwd_dw1(x, h, dmu, dlogvar, w21, w22, block_b: int = 0):
    """Encoder first-layer gradients with the ReLU cotangent kept
    in-register: ``dh = (dmu@w21ᵀ + dlogvar@w22ᵀ)·(h>0)`` feeds
    ``(xᵀ@dh, colsum(dh))`` inside one kernel, so the (B, units)
    intermediate never round-trips HBM (VERDICT r2 item 1)."""
    passes = _ambient_passes(x.dtype)
    seg, units = x.shape[1], h.shape[1]
    latent = dmu.shape[1]
    it = jnp.dtype(x.dtype).itemsize
    if not block_b:
        row = 2 * it * (_cols(seg) + _cols(units) + 2 * _cols(latent))
        # head weights: bf16 pair, or hi/lo stack (4 bytes/elem) at 3-pass
        resident = 2 * (_cols(units) * _cols(latent)
                        * (4 if passes == 3 else it))
        resident += 4 * _cols(seg) * _cols(units) + 4 * _cols(units)  # dw1+db1
        block_b = _pick_block(row, resident, passes)
    x, _ = _pad_batch(x, block_b)
    h, _ = _pad_batch(h, block_b)
    dmu, _ = _pad_batch(dmu, block_b)
    dlogvar, _ = _pad_batch(dlogvar, block_b)
    B = x.shape[0]
    if passes == 3:
        w21, w22 = _stack_hi_lo(w21), _stack_hi_lo(w22)
    wspec = ((lambda s: _whole((2, *s))) if passes == 3 else _whole)
    with mosaic_precision_scope():
        dw1, db1 = pl.pallas_call(
            functools.partial(_enc_bwd_dw1_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, seg), _tile(block_b, units),
                _tile(block_b, latent), _tile(block_b, latent),
                wspec((units, latent)), wspec((units, latent)),
            ],
            out_specs=[_whole((seg, units)), _whole((1, units))],
            out_shape=[
                jax.ShapeDtypeStruct((seg, units), jnp.float32),
                jax.ShapeDtypeStruct((1, units), jnp.float32),
            ],
            interpret=_interpret(),
            # headroom: measured 16.63 MB scoped-vmem charge inside the
            # resident scans (> the 16 MB default) — the one single-pass
            # kernel that needs the raise there
            compiler_params=_params(passes, headroom=True),
        )(x, h, dmu, dlogvar, w21, w22)
    return dw1, db1.reshape(-1)


def _grad_accum2_kernel(a_ref, b1_ref, b2_ref, dw1_ref, db1_ref,
                        dw2_ref, db2_ref, *, passes=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    a = a_ref[:]
    dims = (((0,), (0,)), ((), ()))
    if passes == 3:
        ah, al = _split_hi_lo(a)
        for b_ref, dw_ref, db_ref in ((b1_ref, dw1_ref, db1_ref),
                                      (b2_ref, dw2_ref, db2_ref)):
            b = b_ref[:]
            bh, bl = _split_hi_lo(b)
            dw_ref[:] += ((_dot_default(ah, bh, dims)
                           + _dot_default(ah, bl, dims))
                          + _dot_default(al, bh, dims))
            db_ref[:] += jnp.sum(b, axis=0, keepdims=True,
                                 dtype=jnp.float32)
    else:
        for b_ref, dw_ref, db_ref in ((b1_ref, dw1_ref, db1_ref),
                                      (b2_ref, dw2_ref, db2_ref)):
            b = b_ref[:]
            dw_ref[:] += jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)
            db_ref[:] += jnp.sum(b, axis=0, keepdims=True,
                                 dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def grad_accum2(a, b1, b2, block_b: int = 0):
    """Two :func:`grad_accum` calls sharing ONE read of ``a`` — the
    encoder's latent heads both contract the same (B, units) activation,
    so fusing halves that matrix's HBM reads."""
    passes = _ambient_passes(a.dtype)
    n, m = a.shape[1], b1.shape[1]
    it = jnp.dtype(a.dtype).itemsize
    if not block_b:
        row = 2 * it * (_cols(n) + 2 * _cols(m))
        resident = 2 * (4 * _cols(n) * _cols(m) + 4 * _cols(m))
        block_b = _pick_block(row, resident, passes)
    a, _ = _pad_batch(a, block_b)
    b1, _ = _pad_batch(b1, block_b)
    b2, _ = _pad_batch(b2, block_b)
    B = a.shape[0]
    with mosaic_precision_scope():
        dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_grad_accum2_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[_tile(block_b, n), _tile(block_b, m),
                      _tile(block_b, m)],
            out_specs=[_whole((n, m)), _whole((1, m)),
                       _whole((n, m)), _whole((1, m))],
            out_shape=[
                jax.ShapeDtypeStruct((n, m), jnp.float32),
                jax.ShapeDtypeStruct((1, m), jnp.float32),
                jax.ShapeDtypeStruct((n, m), jnp.float32),
                jax.ShapeDtypeStruct((1, m), jnp.float32),
            ],
            interpret=_interpret(),
            # headroom: backward kernel — same in-scan scoped-vmem
            # accounting as grad_accum (the fwd kernels stay at the
            # default: their prefetch overlap is the -21% penalty)
            compiler_params=_params(passes, headroom=True),
        )(a, b1, b2)
    return dw1, db1.reshape(-1), dw2, db2.reshape(-1)


def _dec_bwd_fused_kernel(da_ref, h3_ref, z_ref, w4_ref, w3_ref,
                          dz_ref, dw3_ref, db3_ref, *, passes=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)

    prod = _mm(da_ref[:], w4_ref[:], passes, transpose_w=True)
    gate = h3_ref[:].astype(jnp.float32)
    dh3 = jnp.where(gate > 0.0, prod, 0.0)
    z = z_ref[:]
    dims = (((0,), (0,)), ((), ()))     # zᵀ @ dh3
    if passes == 3:
        dz_ref[:] = _mm(dh3, w3_ref[:], passes,
                        transpose_w=True).astype(dz_ref.dtype)
        zh, zl = _split_hi_lo(z)
        dhh, dhl = _split_hi_lo(dh3)
        dw3_ref[:] += ((_dot_default(zh, dhh, dims)
                        + _dot_default(zh, dhl, dims))
                       + _dot_default(zl, dhh, dims))
        db3_ref[:] += jnp.sum(dh3, axis=0, keepdims=True, dtype=jnp.float32)
    else:
        dhc = dh3.astype(z.dtype)       # bf16 round, matching matmul_nt_mask
        dz_ref[:] = _mm(dhc, w3_ref[:], passes,
                        transpose_w=True).astype(dz_ref.dtype)
        dw3_ref[:] += jax.lax.dot_general(
            z, dhc, dims, preferred_element_type=jnp.float32)
        db3_ref[:] += jnp.sum(dhc, axis=0, keepdims=True, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def dec_bwd_fused(da, h3, z, w4, w3, block_b: int = 0):
    """Decoder backward minus the dW4 outer product: ``dh3 =
    (da@w4ᵀ)·(h3>0)`` stays in-register feeding both ``dz = dh3@w3ᵀ``
    (tiled output) and ``(zᵀ@dh3, colsum(dh3))`` (accumulated output) —
    the (B, units) intermediate never touches HBM."""
    passes = _ambient_passes(da.dtype)
    seg, units, latent = da.shape[1], h3.shape[1], z.shape[1]
    it = jnp.dtype(da.dtype).itemsize
    if not block_b:
        row = 2 * it * (_cols(seg) + _cols(units) + 2 * _cols(latent))
        wbytes = 4 if passes == 3 else it
        resident = (_cols(units) * _cols(seg) + _cols(latent) * _cols(units)
                    ) * wbytes
        resident += 4 * _cols(latent) * _cols(units) + 4 * _cols(units)
        block_b = _pick_block(row, resident, passes)
    nrows = da.shape[0]
    da, _ = _pad_batch(da, block_b)
    h3, _ = _pad_batch(h3, block_b)
    z, _ = _pad_batch(z, block_b)
    B = da.shape[0]
    if passes == 3:
        w4, w3 = _stack_hi_lo(w4), _stack_hi_lo(w3)
    wspec = ((lambda s: _whole((2, *s))) if passes == 3 else _whole)
    with mosaic_precision_scope():
        dz, dw3, db3 = pl.pallas_call(
            functools.partial(_dec_bwd_fused_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, seg), _tile(block_b, units),
                _tile(block_b, latent),
                wspec((units, seg)), wspec((latent, units)),
            ],
            out_specs=[_tile(block_b, latent),
                       _whole((latent, units)), _whole((1, units))],
            out_shape=[
                jax.ShapeDtypeStruct((B, latent), da.dtype),
                jax.ShapeDtypeStruct((latent, units), jnp.float32),
                jax.ShapeDtypeStruct((1, units), jnp.float32),
            ],
            interpret=_interpret(),
            # headroom: backward kernel (see grad_accum note)
            compiler_params=_params(passes, headroom=True),
        )(da, h3, z, w4, w3)
    return dz[:nrows], dw3, db3.reshape(-1)


# ============================================= fully-fused backward chains =

def _enc_bwd_full_kernel(x_ref, h_ref, dmu_ref, dlogvar_ref, w21_ref, w22_ref,
                         dw1_ref, db1_ref, dw21_ref, db21_ref,
                         dw22_ref, db22_ref, *, passes=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (dw1_ref, db1_ref, dw21_ref, db21_ref, dw22_ref, db22_ref):
            r[:] = jnp.zeros_like(r)

    dmu = dmu_ref[:]
    dlv = dlogvar_ref[:]
    h = h_ref[:]
    x = x_ref[:]
    prod = (_mm(dmu, w21_ref[:], passes, transpose_w=True)
            + _mm(dlv, w22_ref[:], passes, transpose_w=True))
    dh = jnp.where(h.astype(jnp.float32) > 0.0, prod, 0.0)
    dims = (((0,), (0,)), ((), ()))     # aᵀ @ b: contract the batch dim
    if passes == 3:
        xh, xl = _split_hi_lo(x)
        dhh, dhl = _split_hi_lo(dh)
        dw1_ref[:] += ((_dot_default(xh, dhh, dims)
                        + _dot_default(xh, dhl, dims))
                       + _dot_default(xl, dhh, dims))
        db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True, dtype=jnp.float32)
        hh, hl = _split_hi_lo(h)
        for b, dw_ref, db_ref in ((dmu, dw21_ref, db21_ref),
                                  (dlv, dw22_ref, db22_ref)):
            bh, bl = _split_hi_lo(b)
            dw_ref[:] += ((_dot_default(hh, bh, dims)
                           + _dot_default(hh, bl, dims))
                          + _dot_default(hl, bh, dims))
            db_ref[:] += jnp.sum(b, axis=0, keepdims=True, dtype=jnp.float32)
    else:
        dhc = dh.astype(x.dtype)        # bf16 round, matching the split path
        dw1_ref[:] += jax.lax.dot_general(
            x, dhc, dims, preferred_element_type=jnp.float32)
        db1_ref[:] += jnp.sum(dhc, axis=0, keepdims=True, dtype=jnp.float32)
        for b, dw_ref, db_ref in ((dmu, dw21_ref, db21_ref),
                                  (dlv, dw22_ref, db22_ref)):
            dw_ref[:] += jax.lax.dot_general(
                h, b, dims, preferred_element_type=jnp.float32)
            db_ref[:] += jnp.sum(b, axis=0, keepdims=True, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def enc_bwd_full(x, h, dmu, dlogvar, w21, w22, block_b: int = 0):
    """The ENTIRE encoder parameter backward in one kernel: ``dh`` in-
    register feeds (dW1, db1) while the same read of ``h`` feeds both
    latent-head gradients — one pass over every operand, 6 accumulators
    resident (~16.5 MB at block 256 bf16; runs under the raised
    vmem_limit, see :data:`_VMEM_LIMIT`)."""
    passes = _ambient_passes(x.dtype)
    seg, units = x.shape[1], h.shape[1]
    latent = dmu.shape[1]
    it = jnp.dtype(x.dtype).itemsize
    if not block_b:
        row = 2 * it * (_cols(seg) + _cols(units) + 2 * _cols(latent))
        resident = 2 * (_cols(units) * _cols(latent)
                        * (4 if passes == 3 else it))
        resident += 4 * _cols(seg) * _cols(units)           # dw1
        resident += 2 * 4 * _cols(units) * _cols(latent)    # dw21 + dw22
        block_b = _pick_block(row, resident, passes=3)      # raised budget
    x, _ = _pad_batch(x, block_b)
    h, _ = _pad_batch(h, block_b)
    dmu, _ = _pad_batch(dmu, block_b)
    dlogvar, _ = _pad_batch(dlogvar, block_b)
    B = x.shape[0]
    if passes == 3:
        w21, w22 = _stack_hi_lo(w21), _stack_hi_lo(w22)
    wspec = ((lambda s: _whole((2, *s))) if passes == 3 else _whole)
    with mosaic_precision_scope():
        dw1, db1, dw21, db21, dw22, db22 = pl.pallas_call(
            functools.partial(_enc_bwd_full_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, seg), _tile(block_b, units),
                _tile(block_b, latent), _tile(block_b, latent),
                wspec((units, latent)), wspec((units, latent)),
            ],
            out_specs=[_whole((seg, units)), _whole((1, units)),
                       _whole((units, latent)), _whole((1, latent)),
                       _whole((units, latent)), _whole((1, latent))],
            out_shape=[
                jax.ShapeDtypeStruct((seg, units), jnp.float32),
                jax.ShapeDtypeStruct((1, units), jnp.float32),
                jax.ShapeDtypeStruct((units, latent), jnp.float32),
                jax.ShapeDtypeStruct((1, latent), jnp.float32),
                jax.ShapeDtypeStruct((units, latent), jnp.float32),
                jax.ShapeDtypeStruct((1, latent), jnp.float32),
            ],
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(x, h, dmu, dlogvar, w21, w22)
    return (dw1, db1.reshape(-1), dw21, db21.reshape(-1),
            dw22, db22.reshape(-1))


def _dec_bwd_full_kernel(da_ref, h3_ref, z_ref, w4_ref, w3_ref,
                         dz_ref, dw3_ref, db3_ref, dw4_ref, db4_ref,
                         *, passes=1):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (dw3_ref, db3_ref, dw4_ref, db4_ref):
            r[:] = jnp.zeros_like(r)

    da = da_ref[:]
    h3 = h3_ref[:]
    z = z_ref[:]
    prod = _mm(da, w4_ref[:], passes, transpose_w=True)
    dh3 = jnp.where(h3.astype(jnp.float32) > 0.0, prod, 0.0)
    dims = (((0,), (0,)), ((), ()))
    if passes == 3:
        dz_ref[:] = _mm(dh3, w3_ref[:], passes,
                        transpose_w=True).astype(dz_ref.dtype)
        zh, zl = _split_hi_lo(z)
        dhh, dhl = _split_hi_lo(dh3)
        dw3_ref[:] += ((_dot_default(zh, dhh, dims)
                        + _dot_default(zh, dhl, dims))
                       + _dot_default(zl, dhh, dims))
        db3_ref[:] += jnp.sum(dh3, axis=0, keepdims=True, dtype=jnp.float32)
        hh, hl = _split_hi_lo(h3)
        dah, dal = _split_hi_lo(da)
        dw4_ref[:] += ((_dot_default(hh, dah, dims)
                        + _dot_default(hh, dal, dims))
                       + _dot_default(hl, dah, dims))
        db4_ref[:] += jnp.sum(da, axis=0, keepdims=True, dtype=jnp.float32)
    else:
        dhc = dh3.astype(z.dtype)
        dz_ref[:] = _mm(dhc, w3_ref[:], passes,
                        transpose_w=True).astype(dz_ref.dtype)
        dw3_ref[:] += jax.lax.dot_general(
            z, dhc, dims, preferred_element_type=jnp.float32)
        db3_ref[:] += jnp.sum(dhc, axis=0, keepdims=True, dtype=jnp.float32)
        dw4_ref[:] += jax.lax.dot_general(
            h3, da, dims, preferred_element_type=jnp.float32)
        db4_ref[:] += jnp.sum(da, axis=0, keepdims=True, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b",))
def dec_bwd_full(da, h3, z, w4, w3, block_b: int = 0):
    """The ENTIRE decoder backward in one kernel: ``dh3`` in-register
    feeds dz/dW3/db3, and the same reads of ``h3``/``da`` feed dW4/db4 —
    one pass over every operand (~19 MB resident at block 256 bf16, under
    the raised vmem_limit)."""
    passes = _ambient_passes(da.dtype)
    seg, units, latent = da.shape[1], h3.shape[1], z.shape[1]
    it = jnp.dtype(da.dtype).itemsize
    if not block_b:
        row = 2 * it * (_cols(seg) + _cols(units) + 2 * _cols(latent))
        wbytes = 4 if passes == 3 else it
        resident = (_cols(units) * _cols(seg)
                    + _cols(latent) * _cols(units)) * wbytes
        resident += 4 * _cols(latent) * _cols(units)        # dw3
        resident += 4 * _cols(units) * _cols(seg)           # dw4
        block_b = _pick_block(row, resident, passes=3)      # raised budget
    nrows = da.shape[0]
    da, _ = _pad_batch(da, block_b)
    h3, _ = _pad_batch(h3, block_b)
    z, _ = _pad_batch(z, block_b)
    B = da.shape[0]
    if passes == 3:
        w4, w3 = _stack_hi_lo(w4), _stack_hi_lo(w3)
    wspec = ((lambda s: _whole((2, *s))) if passes == 3 else _whole)
    with mosaic_precision_scope():
        dz, dw3, db3, dw4, db4 = pl.pallas_call(
            functools.partial(_dec_bwd_full_kernel, passes=passes),
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, seg), _tile(block_b, units),
                _tile(block_b, latent),
                wspec((units, seg)), wspec((latent, units)),
            ],
            out_specs=[_tile(block_b, latent),
                       _whole((latent, units)), _whole((1, units)),
                       _whole((units, seg)), _whole((1, seg))],
            out_shape=[
                jax.ShapeDtypeStruct((B, latent), da.dtype),
                jax.ShapeDtypeStruct((latent, units), jnp.float32),
                jax.ShapeDtypeStruct((1, units), jnp.float32),
                jax.ShapeDtypeStruct((units, seg), jnp.float32),
                jax.ShapeDtypeStruct((1, seg), jnp.float32),
            ],
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(da, h3, z, w4, w3)
    return (dz[:nrows], dw3, db3.reshape(-1), dw4, db4.reshape(-1))


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


# Backward fusion granularity, read at TRACE time (an outer jit built
# after changing this picks it up; benchmarks/fusion_ab.py measures both):
#   "full"  — one kernel per chain (every operand read once)
#   "split" — two kernels per chain (smaller VMEM residency per kernel)
#   "auto"  — the measured winner per tier (docs/PERF.md): split at
#             single-pass (bf16 4.65 vs 4.12 M frames/s — the leaner
#             kernels keep XLA's inter-op prefetch overlap alive), full at
#             3-pass (1.744 vs 1.730 M — f32 operands make the second
#             read of h/h3 twice as expensive, so fusing it away wins)
BWD_FUSION = "auto"


def _fusion(dtype) -> str:
    if BWD_FUSION != "auto":
        return BWD_FUSION
    if _ambient_passes(dtype) == 3:
        return "full"
    if jnp.dtype(dtype) == jnp.float32:
        # f32 single-pass tiers ("highest" 6-pass / plain "float32"): the
        # fused kernels' f32 accumulator+operand residency forces 64-row
        # batch tiles under the scoped budget and measured 859 k frames/s
        # at `highest` — BELOW the round-2 primitive composition's 951 k,
        # which runs 128-row tiles and already sits at the 6-pass
        # roofline.  Keep the primitives there.
        return "primitive"
    return "split"


def _pallas_encode_bwd(res, cts):
    params, x, h = res
    dmu, dlogvar = cts
    mode = _fusion(x.dtype)
    dh = None
    if mode == "full":
        dw1, db1, dw21, db21, dw22, db22 = enc_bwd_full(
            x, h, dmu, dlogvar, params["fc21"]["w"], params["fc22"]["w"])
    elif mode == "primitive":
        dh = matmul_nt2_mask(dmu, params["fc21"]["w"],
                             dlogvar, params["fc22"]["w"], h)
        dw1, db1 = grad_accum(x, dh)
        dw21, db21 = grad_accum(h, dmu)
        dw22, db22 = grad_accum(h, dlogvar)
    else:
        # split fusion: dh stays in-register inside enc_bwd_dw1 and both
        # head grads share one read of h (grad_accum2)
        dw1, db1 = enc_bwd_dw1(x, h, dmu, dlogvar,
                               params["fc21"]["w"], params["fc22"]["w"])
        dw21, db21, dw22, db22 = grad_accum2(h, dmu, dlogvar)
    # input gradient as SEPARATE primitives: when the caller differentiates
    # only parameters (every training step), XLA dead-code-eliminates both
    # calls — matching the XLA backend, which never pays the dh@W1ᵀ GEMM
    # (12% of step FLOPs).  Folding dx into the fused kernel would make it
    # unremovable.  Primitive mode already materialized dh for dW1 (it is
    # live regardless), so it is reused there instead of re-emitted.
    if dh is None:
        dh = matmul_nt2_mask(dmu, params["fc21"]["w"],
                             dlogvar, params["fc22"]["w"], h)
    dx = matmul_nt(dh, params["fc1"]["w"])
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
    # tanh derivative: cheap elementwise, XLA fuses it into the loss
    # backward's (recon − x) pass
    da = (dy * (1.0 - y * y)).astype(dy.dtype)
    mode = _fusion(da.dtype)
    if mode == "full":
        dz, dw3, db3, dw4, db4 = dec_bwd_full(
            da, h3, z, params["fc4"]["w"], params["fc3"]["w"])
    elif mode == "primitive":
        dh3 = matmul_nt_mask(da, params["fc4"]["w"], h3)
        dz = matmul_nt(dh3, params["fc3"]["w"])
        dw4, db4 = grad_accum(h3, da)
        dw3, db3 = grad_accum(z, dh3)
    else:
        dz, dw3, db3 = dec_bwd_fused(da, h3, z,
                                     params["fc4"]["w"], params["fc3"]["w"])
        dw4, db4 = grad_accum(h3, da)
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
