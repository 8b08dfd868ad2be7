"""Shape/behavior tests for the deep-MLP and conv1d model variants and the
registry (BASELINE.json configs #3 and #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.models import build_model, param_count, vae


def _cfg(arch, seg=1024, latent=64, **vae_kw):
    cfg = Config()
    cfg.audio.segment_length = seg
    cfg.vae.latent_dim = latent
    cfg.vae.arch = arch
    for k, v in vae_kw.items():
        setattr(cfg.vae, k, v)
    return cfg


@pytest.mark.parametrize(
    "arch,kw",
    [
        ("dense", dict(n_units=256)),
        ("deep", dict(hidden_dims="512,256,128")),
        ("conv1d", dict(conv_channels="8,16,32", conv_kernel=9, conv_stride=4)),
    ],
)
def test_forward_shapes_and_bounds(arch, kw):
    cfg = _cfg(arch, **kw)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (8, 1024)).astype(np.float32)
    )
    recon, mu, logvar = model.forward(params, jax.random.PRNGKey(1), x)
    assert recon.shape == (8, 1024)
    assert mu.shape == (8, 64) and logvar.shape == (8, 64)
    assert float(jnp.max(jnp.abs(recon))) <= 1.0  # tanh-bounded output
    # loss is finite and jit-compatible
    loss = jax.jit(vae.loss_fn, static_argnums=(5,))(
        recon, x, mu, logvar, 1e-4, 1024
    )
    assert np.isfinite(float(loss))


def test_forward_reshapes_flat_input():
    """model.py:33 contract: forward accepts flat audio and reshapes."""
    model = build_model(_cfg("dense", n_units=128))
    params = model.init(jax.random.PRNGKey(0))
    flat = jnp.zeros((4 * 1024,))
    recon, mu, _ = model.forward(params, jax.random.PRNGKey(0), flat)
    assert recon.shape == (4, 1024)
    assert mu.shape == (4, 64)


@pytest.mark.slow
def test_deep_variant_4096_frames():
    """BASELINE config #3: 4-layer encoder/decoder, 256-dim latent, 4096-sample
    frames."""
    cfg = _cfg("deep", seg=4096, latent=256, hidden_dims="4096,2048,1024,512")
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert len(params["enc"]) == 4 and len(params["dec"]) == 5
    x = jnp.zeros((2, 4096))
    recon, mu, logvar = model.forward(params, jax.random.PRNGKey(1), x)
    assert recon.shape == (2, 4096) and mu.shape == (2, 256)


def test_conv1d_encoder_downsamples():
    cfg = _cfg("conv1d", conv_channels="8,16,32", conv_stride=4)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # 3 stride-4 layers: 1024 → 16 positions × 32 ch → flat 512 → latent heads
    assert params["mu_head"]["w"].shape == (16 * 32, 64)
    x = jnp.zeros((2, 1024))
    mu, logvar = model.encode(params, x)
    assert mu.shape == (2, 64)
    z = jnp.zeros((2, 64))
    out = model.decode(params, z)
    assert out.shape == (2, 1024)


def test_conv1d_invalid_segment():
    cfg = _cfg("conv1d", seg=1000, conv_channels="8,16,32", conv_stride=4)
    with pytest.raises(ValueError):
        build_model(cfg).init(jax.random.PRNGKey(0))


def test_variant_determinism():
    for arch, kw in [("deep", dict(hidden_dims="128,64")),
                     ("conv1d", dict(conv_channels="4,8"))]:
        model = build_model(_cfg(arch, **kw))
        p1 = model.init(jax.random.PRNGKey(3))
        p2 = model.init(jax.random.PRNGKey(3))
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert param_count(p1) > 0


@pytest.mark.parametrize(
    "arch,kw",
    [
        ("deep", dict(hidden_dims="256,128")),
        ("conv1d", dict(conv_channels="8,16", conv_kernel=5, conv_stride=4)),
    ],
)
def test_variant_train_step_learns(arch, kw):
    """Full jitted train step on each variant: loss decreases, state advances
    (BASELINE configs #3/#4 trainability)."""
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = _cfg(arch, seg=256, latent=16, **kw)
    cfg.audio.hop_length = 64
    cfg.training.learning_rate = 1e-3
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    step = build_train_step(model, cfg, opt)
    # structured (learnable) data: random-phase sinusoids, not white noise
    rng = np.random.default_rng(0)
    t = np.arange(256)[None, :] / 256.0
    phases = rng.uniform(0, 2 * np.pi, (32, 1))
    freqs = rng.integers(2, 6, (32, 1))
    batch = jnp.asarray(
        (0.7 * np.sin(2 * np.pi * freqs * t + phases)).astype(np.float32)
    )
    losses = []
    for _ in range(100):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("arch,kw", [
    ("deep", dict(hidden_dims="256,128")),
    ("conv1d", dict(conv_channels="8,16", conv_kernel=5, conv_stride=4)),
])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_variant_bf16_trains(arch, kw, backend):
    """Variants must train under precision=bfloat16 (configs/conv1d.ini ships
    it).  Regression: lax convs require matching operand dtypes, so conv
    outputs must downcast back to the compute dtype after f32 accumulation
    (models/variants.py:_conv) — mixed f32/bf16 used to crash layer 2."""
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = _cfg(arch, seg=256, latent=16, **kw)
    cfg.audio.hop_length = 64
    cfg.tpu.precision = "bfloat16"
    cfg.tpu.backend = backend
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    step = build_train_step(model, cfg, opt)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.uniform(-1, 1, (32, 256)).astype(np.float32))
    for _ in range(5):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert state.params["mu_head"]["w"].dtype == jnp.float32  # fp32 master


def test_resident_model_routes_best_to_xla():
    """backend=best routes the RESIDENT trainers to XLA even where the
    standalone step resolves Pallas (measured ~19% in-scan penalty for the
    custom calls — registry.resident_model); an explicit backend=pallas is
    honored unchanged."""
    from rawaudiovae_kelsey_tpu.models.registry import resident_model

    cfg = _cfg("dense", n_units=256)
    cfg.tpu.backend = "best"
    routed = resident_model(cfg, build_model(cfg))
    assert routed.encode is vae.encode and routed.decode is vae.decode

    cfg.tpu.backend = "pallas"
    explicit = build_model(cfg)
    assert resident_model(cfg, explicit) is explicit
    assert explicit.encode is not vae.encode  # pallas honored

    # backend-independent params: the routed model runs a state initialized
    # under the original resolution
    params = explicit.init(jax.random.PRNGKey(0))
    x = jnp.zeros((4, 1024))
    recon, mu, _ = routed.forward(params, jax.random.PRNGKey(1), x)
    assert recon.shape == (4, 1024) and mu.shape == (4, 64)
