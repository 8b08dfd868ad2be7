"""Int8 weight-only quantized serving path: quantization math, kernel parity,
end-to-end accuracy, server integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.models import vae
from rawaudiovae_kelsey_tpu.ops import (
    quantize_decoder,
    quantize_weight,
    quantized_decode_xla,
    quantized_decoder_fwd,
)

SEG, UNITS, LATENT = 256, 512, 64


@pytest.fixture(scope="module")
def params():
    return vae.init_dense(jax.random.PRNGKey(0), SEG, UNITS, LATENT)


def test_quantize_weight_roundtrip():
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((128, 256)).astype(np.float32)
    )
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (1, 256)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    # per-channel max error bounded by scale/2
    err = np.abs(deq - np.asarray(w))
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()
    # zero column doesn't divide by zero
    w0 = w.at[:, 0].set(0.0)
    q0, s0 = quantize_weight(w0)
    assert float(jnp.abs(q0[:, 0]).max()) == 0


def test_kernel_matches_xla_reference(params):
    qparams = quantize_decoder(params)
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal((100, LATENT))
        .astype(np.float32)
    )
    y_kernel = quantized_decoder_fwd(qparams, z)
    y_xla = quantized_decode_xla(qparams, z)
    np.testing.assert_allclose(np.asarray(y_kernel), np.asarray(y_xla),
                               atol=1e-5, rtol=1e-4)


def test_quantized_close_to_fp32(params):
    """int8 weight quantization error stays small on the tanh output."""
    qparams = quantize_decoder(params)
    z = jnp.asarray(
        np.random.default_rng(2).standard_normal((64, LATENT))
        .astype(np.float32)
    )
    y_q = np.asarray(quantized_decoder_fwd(qparams, z))
    y_f = np.asarray(vae.decode(params, z))
    err = np.abs(y_q - y_f)
    assert float(err.mean()) < 2e-3
    assert float(err.max()) < 3e-2


def test_server_quantized(params):
    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.infer import InferenceServer
    from rawaudiovae_kelsey_tpu.models import build_model

    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = 64
    cfg.vae.n_units = UNITS
    cfg.vae.latent_dim = LATENT
    model = build_model(cfg)

    audio = np.random.default_rng(3).uniform(-0.8, 0.8, SEG * 4).astype(
        np.float32
    )
    with InferenceServer(model, params, batch_size=8,
                         deterministic=True, quantize=True) as srv:
        wave_q = srv.reconstruct(audio).result(60)
    with InferenceServer(model, params, batch_size=8,
                         deterministic=True) as srv:
        wave_f = srv.reconstruct(audio).result(60)
    assert wave_q.shape == wave_f.shape
    assert float(np.abs(wave_q - wave_f).mean()) < 5e-3
