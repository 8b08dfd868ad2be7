"""conv1d / transpose-conv1d on the fused halo-window Pallas path.

The MXU has no convolution unit — XLA lowers convs to implicit GEMM.  This
module maps the conv1d VAE family (BASELINE.json config #4; reference hot
path analog ``rawvae/model.py:13-30``) onto the block-Toeplitz primitive
(:mod:`ops.pallas_toeplitz`): the raw signal is read once from HBM as a
flat stream, the K-sample halo windows are gathered *in VMEM*, and bias +
activation fuse into the GEMM epilogue.  No im2col patches ever touch HBM,
in forward or backward.

**Status (measured):** XLA's implicit-GEMM lowering beats this path on
every layer of the conv1d variant (1.7–18.7× per-layer at bf16 batch
4096 — small channel counts starve the MXU per tap; full sweep in
docs/PERF.md), so ``backend = pallas`` routes conv models to the XLA
lowering and these functions are an explicit op-level API: guaranteed
epilogue fusion, the 4-pass fp32 precision mode, and the documented
conv-as-Toeplitz mapping.

Mappings (derivations in pallas_toeplitz's module docstring):

* ``conv1d_pallas``: SAME-padded stride-S conv via the free reshape to
  ``(B, nb, S*Cin)`` — windows are runs of ``ceil(K/S)`` whole blocks.
* ``conv1d_transpose_pallas``: the polyphase identity — all S output
  phases packed as one unit-stride Toeplitz matmul with a ``(Kp, Cin,
  S*Cout)`` combined weight; its ``(B, L, S*Cout)`` output is row-major
  identical to the interleaved ``(B, L*S, Cout)`` result.  Matches
  ``jax.lax.conv_transpose`` SAME semantics (unflipped kernel),
  parity-tested against models/variants.py.

When a layer's flat stream exceeds the per-step VMEM budget the wrappers
fall back to the round-1 formulation (XLA patch extraction + n-tiled fused
GEMM), which has no VMEM floor.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.ops.pallas_linear import pallas_linear
from rawaudiovae_kelsey_tpu.ops.pallas_toeplitz import (
    pick_batch_tile,
    toeplitz_matmul,
)


def _same_pad(length: int, kernel: int, stride: int) -> tuple[int, int]:
    out = -(-length // stride)
    total = max(0, (out - 1) * stride + kernel - length)
    return total // 2, total - total // 2


def conv1d_pallas(x: jax.Array, w: jax.Array, b: jax.Array, stride: int,
                  act: str = "none") -> jax.Array:
    """SAME-padded strided conv1d: x (B, L, Cin), w (K, Cin, Cout) →
    (B, ceil(L/stride), Cout) with fused bias+activation."""
    B, L, cin = x.shape
    K, _, cout = w.shape
    G = stride * cin
    if L % stride:                       # flat stream not block-viewable
        return _conv1d_im2col(x, w, b, stride, act)
    T = L // stride
    lo, _ = _same_pad(L, K, stride)
    # window t reads flat [t*G - lo*cin, … + K*cin): constant offset r0
    # inside block t - q — fold the left pad into the tap stack's row
    # placement, no jnp.pad copy.
    q = -(-(lo * cin) // G)
    r0 = q * G - lo * cin
    KB = -(-(r0 + K * cin) // G)
    # gate on both the forward and the VJP's dx Toeplitz (G/N swapped)
    if (pick_batch_tile(B, T, G, T, cout, x.dtype.itemsize, KB) == 0
            or pick_batch_tile(B, T, cout, T, G, x.dtype.itemsize, KB) == 0):
        return _conv1d_im2col(x, w, b, stride, act)
    xf = x.reshape(B, T, G)                        # free: row-major
    wpad = jnp.pad(w.reshape(K * cin, cout),
                   ((r0, KB * G - r0 - K * cin), (0, 0))).reshape(
                       KB, G, cout)
    return toeplitz_matmul(xf, wpad, b, act, T, q)


def _transpose_plan(K: int, stride: int, cin: int, cout: int):
    """Static polyphase placement: tap j of phase r = (lo - j) % S lands at
    combined-weight row δ(r,j) = (r + j - lo)//S (shifted by -δmin)."""
    total_fwd = max(0, K - stride)        # forward SAME pad for L*S → L
    pb = total_fwd // 2
    lo = K - 1 - pb
    rows, phases, taps = [], [], []
    for r in range(stride):
        j0 = (lo - r) % stride
        for j in range(j0, K, stride):
            rows.append((r + j - lo) // stride)
            phases.append(r)
            taps.append(j)
    dmin = min(rows)
    kp = max(rows) - dmin + 1
    rows = np.asarray(rows) - dmin
    return dmin, kp, rows, np.asarray(phases), np.asarray(taps)


def conv1d_transpose_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                            stride: int, act: str = "none") -> jax.Array:
    """SAME-padded transpose conv1d matching ``jax.lax.conv_transpose``:
    x (B, L, Cin), w (K, Cin, Cout) → (B, L*stride, Cout)."""
    B, L, cin = x.shape
    K, _, cout = w.shape
    dmin, kp, rows, phases, taps = _transpose_plan(K, stride, cin, cout)
    if (pick_batch_tile(B, L, cin, L, stride * cout, x.dtype.itemsize,
                        kp) == 0
            or pick_batch_tile(B, L, stride * cout, L, cin,
                               x.dtype.itemsize, kp) == 0):
        return _conv1d_transpose_im2col(x, w, b, stride, act)
    # window t reads raw x rows [t + dmin, t + dmin + kp); out-of-range
    # rows contribute zero inside the kernel — no jnp.pad copy.
    w4 = jnp.zeros((kp, stride, cin, cout), w.dtype).at[rows, phases].set(
        w[taps])
    wt = w4.transpose(0, 2, 1, 3).reshape(kp, cin, stride * cout)
    y = toeplitz_matmul(x, wt, jnp.tile(b, stride), act, L, -dmin)
    return y.reshape(B, L * stride, cout)


# ------------------------------------------------------- im2col fallback --
# Round-1 formulation: XLA extracts patches (K× activation bytes in HBM),
# the n-tiled fused GEMM does the FLOPs.  Slower, but no VMEM floor — used
# only when a layer's flat stream overflows the Toeplitz kernel's budget.

def _conv1d_im2col(x, w, b, stride, act):
    B, L, cin = x.shape
    K, _, cout = w.shape
    lo, hi = _same_pad(L, K, stride)
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    out_len = -(-L // stride)
    starts = jnp.arange(out_len) * stride
    idx = starts[:, None] + jnp.arange(K)[None, :]
    patches = xp[:, idx, :]
    flat = patches.reshape(B * out_len, K * cin)
    y = pallas_linear(flat, w.reshape(K * cin, cout), b, act)
    return y.reshape(B, out_len, cout)


def _conv1d_transpose_im2col(x, w, b, stride, act):
    B, L, cin = x.shape
    K, _, cout = w.shape
    out_len = L * stride
    dil_len = (L - 1) * stride + 1
    dil = jnp.zeros((B, dil_len, cin), x.dtype).at[:, ::stride, :].set(x)
    total_fwd = max(0, (L - 1) * stride + K - out_len)
    pb = total_fwd // 2
    lo = K - 1 - pb
    hi = (out_len + K - 1) - dil_len - lo
    xp = jnp.pad(dil, ((0, 0), (lo, hi), (0, 0)))
    starts = jnp.arange(out_len)
    idx = starts[:, None] + jnp.arange(K)[None, :]
    patches = xp[:, idx, :]
    flat = patches.reshape(B * out_len, K * cin)
    y = pallas_linear(flat, w.reshape(K * cin, cout), b, act)
    return y.reshape(B, out_len, cout)


def conv_encode_pallas(params, x, stride: int):
    """conv1d-family encoder (models/variants.py layout) on the fused path."""
    h = x[..., None]
    for layer in params["enc"]:
        h = conv1d_pallas(h, layer["w"], layer["b"], stride, "relu")
    h = h.reshape(h.shape[0], -1)
    mu = pallas_linear(h, params["mu_head"]["w"], params["mu_head"]["b"],
                       "none")
    logvar = pallas_linear(h, params["logvar_head"]["w"],
                           params["logvar_head"]["b"], "none")
    return mu, logvar


def conv_decode_pallas(params, z, stride: int, width: int, channels: int):
    h = pallas_linear(z, params["dec_in"]["w"], params["dec_in"]["b"], "relu")
    h = h.reshape(z.shape[0], width, channels)
    for layer in params["dec"][:-1]:
        h = conv1d_transpose_pallas(h, layer["w"], layer["b"], stride, "relu")
    last = params["dec"][-1]
    h = conv1d_transpose_pallas(h, last["w"], last["b"], stride, "tanh")
    return h[..., 0]
