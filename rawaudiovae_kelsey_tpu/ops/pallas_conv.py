"""conv1d / transpose-conv1d on the Pallas fused-GEMM path.

The MXU has no convolution unit — XLA lowers convs to implicit GEMM.  This
module makes that mapping explicit for the conv1d VAE family (BASELINE.json
config #4): XLA extracts the im2col patches (a layout transform it does
well), and the actual FLOPs — patches × reshaped kernel, plus bias and
activation — run through the n-tiled fused Pallas GEMM
(:func:`ops.pallas_linear.pallas_linear`), so the epilogue never touches HBM.

Transpose convolution reuses the same kernel via the standard
input-dilation identity: ``conv_transpose(x, w, s) = conv(dilate(x, s),
flip(w), 1)`` with matching SAME padding — exactly how
``jax.lax.conv_transpose`` defines it, parity-tested against the XLA
implementations in models/variants.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.ops.pallas_linear import pallas_linear


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
    lo, hi = _same_pad(L, K, stride)
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    out_len = -(-L // stride)
    # im2col: window t covers xp[:, t*stride : t*stride+K, :]
    starts = jnp.arange(out_len) * stride
    idx = starts[:, None] + jnp.arange(K)[None, :]        # (out_len, K)
    patches = xp[:, idx, :]                               # (B, out_len, K, Cin)
    flat = patches.reshape(B * out_len, K * cin)
    wmat = w.reshape(K * cin, cout)
    y = pallas_linear(flat, wmat, b, act)
    return y.reshape(B, out_len, cout)


def conv1d_transpose_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                            stride: int, act: str = "none") -> jax.Array:
    """SAME-padded transpose conv1d matching ``jax.lax.conv_transpose``:
    x (B, L, Cin), w (K, Cin, Cout) → (B, L*stride, Cout)."""
    B, L, cin = x.shape
    K, _, cout = w.shape
    # dilate the input with stride-1 zeros
    out_len = L * stride
    dil_len = (L - 1) * stride + 1
    dil = jnp.zeros((B, dil_len, cin), x.dtype).at[:, ::stride, :].set(x)
    # lax.conv_transpose(SAME) = unit-stride conv of the dilated input with
    # the UNFLIPPED kernel (transpose_kernel=False default), padded by
    # K-1 minus the corresponding forward conv's SAME padding
    total_fwd = max(0, (L - 1) * stride + K - out_len)
    pb = total_fwd // 2
    lo = K - 1 - pb
    # pad the right side to exactly cover the last im2col window
    # (index out_len - 1 + K - 1): for K < stride the naive K-1-pa pad
    # under-covers and gather would clamp-read real data
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
