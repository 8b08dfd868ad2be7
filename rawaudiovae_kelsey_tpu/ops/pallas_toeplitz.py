"""Block-Toeplitz fused GEMM — the halo-window convolution primitive.

The round-1 conv path materialized im2col patches in HBM (K× the activation
bytes) before the GEMM, losing 3× to XLA's implicit-GEMM conv.  This module
replaces it with a single Pallas primitive that reads the **raw, unpadded**
signal exactly once:

    toeplitz_matmul(x, w, b, act, t_out, shift)[b, t]
        = act( Σ_j  x[b, t + j - shift] @ w[j] + b )      (OOB rows ≡ 0)

``x`` is a *flat-stream* view of the signal, ``(B, nb, G)``; each output
row ``t`` reads ``KB`` consecutive G-blocks — the halo — straight from
VMEM.  SAME-padding is folded into ``shift`` plus static per-tap row
ranges inside the kernel (each tap accumulates ``acc[:, a:e] +=
x[:, a+o:e+o] @ w[j]``), so no ``jnp.pad`` copy ever happens.  The only
HBM traffic is one pass over the raw signal and one over the output.
(HBM-minimal is necessary but not sufficient: at the conv1d variant's
small channel counts the per-tap dots starve the MXU and XLA's
implicit-GEMM conv wins anyway — measured per-layer in docs/PERF.md, so
the model registry routes conv models to XLA and this primitive is an
explicit op-level capability.)  Both conv directions map onto it:

* **Strided conv1d** (encoder, reference analog ``rawvae/model.py:13-21``):
  flat window t covers ``[t*S*Cin - lo*Cin, … + K*Cin)``.  With ``G =
  S*Cin`` every window starts at constant offset ``r0 = q*G - lo*Cin``
  within block ``t - q``; placing the flattened weight at row ``r0`` of a
  ``(KB, G, Cout)`` tap stack makes the conv a Toeplitz matmul with
  ``shift = q`` over the freely-reshaped ``(B, L/S, S*Cin)`` raw signal.

* **Transpose conv1d** (decoder, ``rawvae/model.py:24-30`` analog): the
  polyphase identity.  Output phase ``r`` (``n = t*S + r``) is a
  unit-stride correlation of the *undilated* input with the sub-kernel of
  taps ``j ≡ (lo - r) (mod S)``.  Packing all S sub-kernels into one
  ``(Kp, Cin, S*Cout)`` weight makes the whole transpose conv a single
  Toeplitz matmul with ``G = Cin, shift = -dmin`` whose ``(B, L, S*Cout)``
  output reshapes — free, row-major — to the interleaved ``(B, L*S,
  Cout)`` result.  No input dilation, no S× wasted zero-FLOPs.

The primitive is closed under differentiation: ``dx[u] = Σ_j dy[u-j] @
w[j]ᵀ`` is another shifted Toeplitz matmul (tap-reversed, channel-
transposed, ``shift = KB-1``), and ``dW[j]`` is one GEMM per tap on the
same static row ranges — forward *and* backward touch HBM minimally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (
    _act,
    _interpret,
    _split_hi_lo,
    ambient_precision_tier,
    mosaic_precision_scope,
)

# Per-grid-step VMEM budget (bytes).  The v5e scoped limit is 16 MB and the
# stack must hold the double-buffered in/out blocks, the f32 accumulator
# scratch, and a slice+dot temporary pair — see pick_batch_tile.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pad_tile(sub: int, lane: int, itemsize: int) -> tuple[int, int]:
    """VMEM blocks are stored in (sublane, lane) tiles: lane dim padded to
    128, sublane dim to 8 fp32 / 16 bf16 / 32 int8.  A (…, nb, 4) block
    therefore occupies 32× its nominal bytes — this padding, not the
    nominal size, is what Mosaic's stack allocator charges (measured via a
    scoped-VMEM OOM at nominal 5 MB / actual 16.8 MB on a G=32, n=4
    shape)."""
    s = {4: 8, 2: 16, 1: 32}.get(itemsize, 8)
    return -(-sub // s) * s, -(-lane // 128) * 128


def pick_batch_tile(B: int, nb: int, G: int, t: int, n: int,
                    itemsize: int, kb: int = 3) -> int:
    """Largest batch tile fitting the VMEM budget.  Footprint per batch row
    (all dims tile-padded, see :func:`_pad_tile`): double-buffered in
    (nb×G) and out (t×n) blocks, the loaded tile (or its bf16 hi/lo split —
    same bytes), and the f32 panel values.  The tap loop is unrolled and
    Mosaic keeps ~4 live (nb, n) f32 values per tap — the panel, the
    shifted slice, its padded copy, and an add temporary — plus the
    accumulator and bias broadcast, so budget (4·kb + 3) panels.  0 means
    even one row does not fit (caller must fall back)."""
    nb_i, g_i = _pad_tile(nb, G, itemsize)
    t_i, n_i = _pad_tile(t, n, itemsize)
    nb_f, n_f = _pad_tile(nb, n, 4)
    per_row = (2 * itemsize * (nb_i * g_i + t_i * n_i)  # pipelined in/out
               + itemsize * nb_i * g_i                  # loaded / hi+lo
               + (4 * kb + 3) * 4 * nb_f * n_f)         # f32 panel values
    if per_row > _VMEM_BUDGET:
        return 0
    return int(min(B, 32, _VMEM_BUDGET // per_row))


def _tap_ranges(kb: int, shift: int, t: int, nb: int):
    """Static (tap j, offset o) → (a, e): valid output rows [a, e) read
    input rows [a+o, e+o); rows outside read zeros (SAME padding)."""
    out = []
    for j in range(kb):
        o = j - shift
        a = max(0, -o)
        e = min(t, nb - o)
        if e > a:
            out.append((j, o, a, e))
    return out


def _dot(a, bmat):
    return jax.lax.dot_general(
        a, bmat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _toeplitz_kernel(x_ref, w_ref, b_ref, o_ref, *, kb, t, shift, act,
                     passes):
    """Every MXU operand read is a full aligned tile: per tap j the kernel
    computes the panel P_j = x @ w[j] over ALL nb input rows, then shifts
    the (n-wide, much smaller) result in registers — y[τ] += P_j[τ+j-shift]
    with out-of-range rows zero.  No haloed scratch copies, no unaligned
    operand slices, no HBM padding.

    fp32 inputs run single-pass bf16 by default (the tier XLA uses for
    Precision.DEFAULT convs); ``passes=4`` runs the bf16 hi/lo-split
    4-pass dot (~1e-7 rel err — faster than a native fp32 6-pass while
    matching fp32 accuracy).  Accumulation is always f32."""
    f32 = x_ref.dtype == jnp.float32
    nb = x_ref.shape[1]
    x = x_ref[:]
    if f32 and passes == 4:
        xh, xl = _split_hi_lo(x)
    acc = None
    for j in range(kb):
        wj = w_ref[j]
        if f32 and passes == 4:
            wh, wl = _split_hi_lo(wj)
            # (xh+xl)(wh+wl) exactly, f32-accumulated — error is just the
            # bf16 rounding of the lo residuals
            p = ((_dot(xh, wh) + _dot(xl, wl))
                 + (_dot(xh, wl) + _dot(xl, wh)))
        else:
            p = _dot(x, wj)
        o = j - shift                       # y[τ] += P[τ + o]
        lo_src = max(0, o)
        hi_src = min(nb, t + o)
        if hi_src <= lo_src:
            continue
        seg = jax.lax.slice_in_dim(p, lo_src, hi_src, axis=1)
        pad_lo = lo_src - o
        pad_hi = t - (hi_src - o)
        if pad_lo or pad_hi:
            seg = jnp.pad(seg, ((0, 0), (pad_lo, pad_hi), (0, 0)))
        acc = seg if acc is None else acc + seg
    if acc is None:
        acc = jnp.zeros(o_ref.shape, jnp.float32)
    y = acc + b_ref[:].astype(jnp.float32)           # (1,1,N) broadcasts
    o_ref[:] = _act(act, y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "t_out", "shift",
                                             "passes"))
def toeplitz_fwd(x: jax.Array, w: jax.Array, b: jax.Array,
                 act: str = "none", t_out: int | None = None,
                 shift: int = 0, passes: int = 1) -> jax.Array:
    """act(Σ_j x[:, t+j-shift, :] @ w[j] + b): x (B, nb, G), w (KB, G, N),
    b (N,) → (B, t_out, N); out-of-range input rows contribute zero."""
    B, nb, G = x.shape
    kb, _, N = w.shape
    t = nb - kb + 1 if t_out is None else t_out
    tb = pick_batch_tile(B, nb, G, t, N, x.dtype.itemsize, kb)
    if tb == 0:
        raise ValueError("toeplitz block exceeds VMEM budget; use fallback")
    if (passes == 1 and x.dtype == jnp.float32
            and ambient_precision_tier() in ("high", "tensorfloat32",
                                             "bfloat16_3x")):
        # the ambient HIGH tier maps to this kernel's native bf16 hi/lo
        # split (~1e-6 rel err) instead of Mosaic's unsupported 3-pass
        passes = 4
    pad_b = (-B) % tb
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    with mosaic_precision_scope():
        out = pl.pallas_call(
            functools.partial(_toeplitz_kernel, kb=kb, t=t, shift=shift,
                              act=act, passes=passes),
            grid=((B + pad_b) // tb,),
            in_specs=[
                pl.BlockSpec((tb, nb, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kb, G, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, t, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B + pad_b, t, N), x.dtype),
            interpret=_interpret(),
        )(x, w, b.reshape(1, 1, -1))
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def toeplitz_matmul(x, w, b, act: str = "none", t_out: int | None = None,
                    shift: int = 0, passes: int = 1):
    """Differentiable fused block-Toeplitz matmul (relu | tanh | none)."""
    return toeplitz_fwd(x, w, b, act, t_out, shift, passes)


def _tm_fwd(x, w, b, act, t_out, shift, passes):
    y = toeplitz_fwd(x, w, b, act, t_out, shift, passes)
    return y, (x, w, y)


def _tm_bwd(act, t_out, shift, passes, res, dy):
    x, w, y = res
    kb = w.shape[0]
    nb = x.shape[1]
    t = y.shape[1]
    if act == "relu":
        da = jnp.where(y > 0, dy, 0.0).astype(dy.dtype)
    elif act == "tanh":
        da = (dy * (1.0 - y * y)).astype(dy.dtype)
    else:
        da = dy
    # dx[u] = Σ_j da[u - (j - shift)] @ w[j]ᵀ.  With taps reversed
    # (j' = kb-1-j) this is a shifted Toeplitz matmul over the raw da:
    # offset j' - (kb-1-shift) = -(j - shift).
    # The dx pass swaps panel widths (G↔N), so its VMEM footprint differs
    # from the forward's — when IT doesn't fit, take per-tap XLA einsums
    # instead of raising mid-differentiation of an op documented as
    # closed under autodiff.
    G = w.shape[1]
    if pick_batch_tile(da.shape[0], t, da.shape[2], nb, G,
                       da.dtype.itemsize, kb) > 0:
        wrev = jnp.flip(w, axis=0).transpose(0, 2, 1)     # (KB, N, G)
        dx = toeplitz_fwd(da, wrev, jnp.zeros((w.shape[1],), da.dtype),
                          "none", nb, kb - 1 - shift, passes).astype(x.dtype)
    else:
        dxf = jnp.zeros((x.shape[0], nb, G), jnp.float32)
        for j, o, a, e in _tap_ranges(kb, shift, t, nb):
            contrib = jnp.einsum(
                "btn,gn->btg", jax.lax.slice_in_dim(da, a, e, axis=1), w[j],
                preferred_element_type=jnp.float32)
            dxf = dxf.at[:, a + o:e + o, :].add(contrib)
        dx = dxf.astype(x.dtype)
    # dW[j] = Σ_t x[t + j - shift]ᵀ da[t] over the valid rows — one GEMM
    # per tap on a shifted view (XLA fuses the slice into the GEMM).
    dws = {}
    for j, o, a, e in _tap_ranges(kb, shift, t, nb):
        dws[j] = jnp.einsum(
            "btg,btn->gn", jax.lax.slice_in_dim(x, a + o, e + o, axis=1),
            jax.lax.slice_in_dim(da, a, e, axis=1),
            preferred_element_type=jnp.float32)
    zero = jnp.zeros(w.shape[1:], jnp.float32)
    dw = jnp.stack([dws.get(j, zero) for j in range(kb)]).astype(w.dtype)
    db = jnp.sum(da, axis=(0, 1)).astype(w.dtype)
    return dx, dw, db


toeplitz_matmul.defvjp(_tm_fwd, _tm_bwd)
