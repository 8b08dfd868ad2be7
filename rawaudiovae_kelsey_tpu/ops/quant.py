"""Int8 weight-only quantization for the serving path.

Production serving of the decoder (latent → waveform) at small batch is
HBM-bandwidth-bound: every request reads ~10 MB of fp32 decoder weights.
Per-output-channel symmetric int8 quantization cuts that 4×; the Pallas
kernel streams the int8 weights into VMEM once per grid, dequantizes to the
compute dtype in-register, and runs the same fused relu/tanh GEMM chain as
``ops/pallas_mlp.decoder_fwd``.

Quality: int8 per-channel on these dense layers costs ~1e-2 absolute on the
tanh output (validated in tests/test_quant.py) — inaudible against the
VAE's own reconstruction error, and strictly opt-in
(``InferenceServer(..., quantize=True)``).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (
    mosaic_precision_scope,
    DEFAULT_BLOCK_B,
    _interpret,
    _pad_batch,
    _tile,
    _whole,
)


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: ``w ≈ q * scale`` with
    ``q ∈ [-127, 127]``, ``scale`` shaped (1, out)."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_weight(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def quantize_decoder(params) -> Dict:
    """Quantize the dense decoder (fc3, fc4) for serving; biases stay fp32."""
    q3, s3 = quantize_weight(params["fc3"]["w"])
    q4, s4 = quantize_weight(params["fc4"]["w"])
    return {
        "fc3": {"q": q3, "scale": s3, "b": jnp.asarray(params["fc3"]["b"])},
        "fc4": {"q": q4, "scale": s4, "b": jnp.asarray(params["fc4"]["b"])},
    }


def _qdec_kernel(z_ref, q3_ref, s3_ref, b3_ref, q4_ref, s4_ref, b4_ref,
                 y_ref):
    z = z_ref[:]
    w3 = q3_ref[:].astype(jnp.float32) * s3_ref[:]
    h3 = jnp.maximum(
        jnp.dot(z, w3, preferred_element_type=jnp.float32) + b3_ref[:], 0.0
    )
    w4 = q4_ref[:].astype(jnp.float32) * s4_ref[:]
    y_ref[:] = jnp.tanh(
        jnp.dot(h3, w4, preferred_element_type=jnp.float32) + b4_ref[:]
    ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def quantized_decoder_fwd(qparams, z, block_b: int = DEFAULT_BLOCK_B):
    """Fused int8-weight decode: tanh(relu(z@W3+b3)@W4+b4) with W3/W4
    dequantized in VMEM."""
    z = jnp.asarray(z, jnp.float32)
    z, n = _pad_batch(z, block_b)
    B, latent = z.shape
    units = qparams["fc3"]["q"].shape[1]
    seg = qparams["fc4"]["q"].shape[1]
    with mosaic_precision_scope():
        y = pl.pallas_call(
            _qdec_kernel,
            grid=(B // block_b,),
            in_specs=[
                _tile(block_b, latent),
                _whole((latent, units)), _whole((1, units)), _whole((1, units)),
                _whole((units, seg)), _whole((1, seg)), _whole((1, seg)),
            ],
            out_specs=_tile(block_b, seg),
            out_shape=jax.ShapeDtypeStruct((B, seg), jnp.float32),
            interpret=_interpret(),
        )(z, qparams["fc3"]["q"], qparams["fc3"]["scale"],
          qparams["fc3"]["b"].reshape(1, -1),
          qparams["fc4"]["q"], qparams["fc4"]["scale"],
          qparams["fc4"]["b"].reshape(1, -1))
    return y[:n]


def quantized_decode_xla(qparams, z):
    """XLA reference implementation of the same computation (parity tests,
    and the non-Pallas fallback)."""
    w3 = dequantize_weight(qparams["fc3"]["q"], qparams["fc3"]["scale"])
    w4 = dequantize_weight(qparams["fc4"]["q"], qparams["fc4"]["scale"])
    h3 = jax.nn.relu(jnp.asarray(z, jnp.float32) @ w3 + qparams["fc3"]["b"])
    return jnp.tanh(h3 @ w4 + qparams["fc4"]["b"])
