"""Model variants beyond the reference's single dense VAE.

BASELINE.json names two extra configs the framework must cover:
  * "deep/wide variant: 4-layer encoder/decoder, 256-dim latent, 4096-sample
    frames" — :func:`init_deep` / :func:`encode_deep` / :func:`decode_deep`
  * "conv1d encoder/decoder variant over raw frames (strided conv +
    transpose-conv kernels)" — :func:`init_conv1d` / :func:`encode_conv1d` /
    :func:`decode_conv1d`

Both reuse the dense VAE's reparameterization and loss (models/vae.py), so a
variant swap touches only the encode/decode pair.  Convolutions run in NWC
layout so XLA tiles them onto the MXU; the MXU accumulates in f32
internally, and activations stay in the compute dtype (bf16 under
``[tpu] precision = bfloat16``).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.models.vae import Params, _linear_init, linear


# ---------------------------------------------------------------- deep MLP --

def init_deep(key: jax.Array, segment_length: int, hidden_dims: Sequence[int],
              latent_dim: int, dtype=jnp.float32) -> Params:
    """Deep/wide MLP VAE: encoder seg→h0→h1→…→hk (ReLU each) → two latent
    heads; decoder mirrors back to seg with tanh output."""
    dims = [segment_length, *hidden_dims]
    n_enc = len(dims) - 1
    keys = jax.random.split(key, 2 * n_enc + 3)
    params: Params = {"enc": [], "dec": []}
    for i in range(n_enc):
        params["enc"].append(_linear_init(keys[i], dims[i], dims[i + 1], dtype))
    params["mu_head"] = _linear_init(keys[n_enc], dims[-1], latent_dim, dtype)
    params["logvar_head"] = _linear_init(keys[n_enc + 1], dims[-1], latent_dim, dtype)
    rdims = [latent_dim, *reversed(hidden_dims), segment_length]
    for i in range(len(rdims) - 1):
        params["dec"].append(
            _linear_init(keys[n_enc + 2 + i], rdims[i], rdims[i + 1], dtype)
        )
    return params


def encode_deep(params: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    h = x
    for layer in params["enc"]:
        h = jax.nn.relu(linear(layer, h))
    return linear(params["mu_head"], h), linear(params["logvar_head"], h)


def decode_deep(params: Params, z: jax.Array) -> jax.Array:
    h = z
    for layer in params["dec"][:-1]:
        h = jax.nn.relu(linear(layer, h))
    return jnp.tanh(linear(params["dec"][-1], h))


# ------------------------------------------------------------------ conv1d --

def _conv_init(key: jax.Array, kernel: int, in_ch: int, out_ch: int,
               dtype=jnp.float32) -> Dict[str, jax.Array]:
    """torch Conv1d-style init: U(±1/sqrt(in_ch·kernel)) for both W and b.
    Kernel layout WIO (width, in, out) to match NWC convolutions."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    return {
        "w": jax.random.uniform(wkey, (kernel, in_ch, out_ch), dtype, -bound, bound),
        "b": jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound),
    }


_DN = ("NWC", "WIO", "NWC")


def _conv(p, x, stride: int) -> jax.Array:
    # No preferred_element_type: the MXU accumulates f32 internally either
    # way, and forcing an f32 *output* under bf16 training broke dtype
    # matching in the next layer and in the conv VJP (lax convs require
    # identical operand dtypes).  Output dtype follows the operands.
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding="SAME",
        dimension_numbers=_DN,
    )
    return y + p["b"]


def _conv_transpose(p, x, stride: int) -> jax.Array:
    y = jax.lax.conv_transpose(
        x, p["w"], strides=(stride,), padding="SAME",
        dimension_numbers=_DN,
    )
    return y + p["b"]


def conv_latent_width(segment_length: int, n_layers: int, stride: int) -> int:
    w = segment_length
    for _ in range(n_layers):
        w = -(-w // stride)  # ceil, matches SAME padding
    return w


def init_conv1d(key: jax.Array, segment_length: int, channels: Sequence[int],
                kernel: int, stride: int, latent_dim: int,
                dtype=jnp.float32) -> Params:
    """Strided-conv encoder / transpose-conv decoder VAE over raw frames.

    encoder: (B, seg, 1) → convs stride ``stride`` with ``channels`` → flatten
    → two latent heads.  decoder: latent → linear → (B, w, C) → transpose
    convs back to (B, seg, 1) → tanh.  ``segment_length`` must be divisible by
    ``stride ** len(channels)`` so shapes stay static and MXU-tileable.
    """
    n = len(channels)
    if segment_length % (stride ** n) != 0:
        raise ValueError(
            f"segment_length {segment_length} not divisible by "
            f"stride**layers = {stride ** n}"
        )
    keys = jax.random.split(key, 2 * n + 3)
    params: Params = {"enc": [], "dec": []}
    chs: List[int] = [1, *channels]
    for i in range(n):
        params["enc"].append(_conv_init(keys[i], kernel, chs[i], chs[i + 1], dtype))
    w = conv_latent_width(segment_length, n, stride)
    flat = w * channels[-1]
    params["mu_head"] = _linear_init(keys[n], flat, latent_dim, dtype)
    params["logvar_head"] = _linear_init(keys[n + 1], flat, latent_dim, dtype)
    params["dec_in"] = _linear_init(keys[n + 2], latent_dim, flat, dtype)
    rchs = [*reversed(channels), 1]
    for i in range(n):
        params["dec"].append(
            _conv_init(keys[n + 3 + i], kernel, rchs[i], rchs[i + 1], dtype)
        )
    return params


def encode_conv1d(params: Params, x: jax.Array, stride: int
                  ) -> Tuple[jax.Array, jax.Array]:
    h = x[..., None]  # (B, seg) → (B, seg, 1)
    for layer in params["enc"]:
        h = jax.nn.relu(_conv(layer, h, stride))
    h = h.reshape(h.shape[0], -1)
    return linear(params["mu_head"], h), linear(params["logvar_head"], h)


def decode_conv1d(params: Params, z: jax.Array, stride: int,
                  width: int, channels: int) -> jax.Array:
    h = jax.nn.relu(linear(params["dec_in"], z))
    h = h.reshape(z.shape[0], width, channels)
    for layer in params["dec"][:-1]:
        h = jax.nn.relu(_conv_transpose(layer, h, stride))
    h = jnp.tanh(_conv_transpose(params["dec"][-1], h, stride))
    return h[..., 0]  # (B, seg, 1) → (B, seg)
