"""Pallas kernel parity vs the XLA reference implementations, in interpret
mode on CPU (real-TPU runs are exercised by bench.py --backend pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.models import build_model, vae
from rawaudiovae_kelsey_tpu.ops import (
    decoder_fwd,
    encoder_fwd,
    pallas_decode,
    pallas_encode,
)

SEG, UNITS, LATENT = 256, 512, 128
B = 96  # deliberately NOT a multiple of the 256 default block → padding path


@pytest.fixture(scope="module")
def params():
    return vae.init_dense(jax.random.PRNGKey(0), SEG, UNITS, LATENT)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, SEG)).astype(np.float32)
    )


def test_encoder_fwd_parity(params, x):
    mu, logvar, h = encoder_fwd(
        params["fc1"]["w"], params["fc1"]["b"],
        params["fc21"]["w"], params["fc21"]["b"],
        params["fc22"]["w"], params["fc22"]["b"], x,
    )
    ref_mu, ref_logvar = vae.encode(params, x)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ref_mu),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), np.asarray(ref_logvar),
                               atol=1e-5, rtol=1e-5)
    ref_h = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               atol=1e-5, rtol=1e-5)


def test_decoder_fwd_parity(params):
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, LATENT)).astype(np.float32)
    )
    y, h3 = decoder_fwd(
        params["fc3"]["w"], params["fc3"]["b"],
        params["fc4"]["w"], params["fc4"]["b"], z,
    )
    ref = vae.decode(params, z)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_encode_grad_parity(params, x):
    """custom-VJP backward (pallas) vs jax.grad of the XLA encode."""

    def loss_pallas(p):
        mu, logvar = pallas_encode(p, x)
        return jnp.sum(mu * 1.3) + jnp.sum(jnp.square(logvar))

    def loss_ref(p):
        mu, logvar = vae.encode(p, x)
        return jnp.sum(mu * 1.3) + jnp.sum(jnp.square(logvar))

    g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(loss_ref)(params)
    for name in ("fc1", "fc21", "fc22"):
        np.testing.assert_allclose(
            np.asarray(g1[name]["w"]), np.asarray(g2[name]["w"]),
            atol=2e-4, rtol=1e-4, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(g1[name]["b"]), np.asarray(g2[name]["b"]),
            atol=2e-4, rtol=1e-4, err_msg=name,
        )
    # untouched decoder weights get exact zeros
    assert float(jnp.abs(g1["fc3"]["w"]).max()) == 0.0


def test_decode_grad_parity(params):
    z = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, LATENT)).astype(np.float32)
    )
    target = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (B, SEG)).astype(np.float32)
    )

    def loss_pallas(p, zz):
        return jnp.mean(jnp.square(pallas_decode(p, zz) - target))

    def loss_ref(p, zz):
        return jnp.mean(jnp.square(vae.decode(p, zz) - target))

    (g1, gz1) = jax.grad(loss_pallas, argnums=(0, 1))(params, z)
    (g2, gz2) = jax.grad(loss_ref, argnums=(0, 1))(params, z)
    np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz2),
                               atol=1e-5, rtol=1e-4)
    for name in ("fc3", "fc4"):
        np.testing.assert_allclose(
            np.asarray(g1[name]["w"]), np.asarray(g2[name]["w"]),
            atol=1e-5, rtol=1e-4, err_msg=name,
        )


def test_full_train_step_with_pallas_backend():
    """End-to-end: a train step built with backend=pallas matches the XLA
    step update to accumulation tolerance."""
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    def mk(backend):
        cfg = Config()
        cfg.audio.segment_length = SEG
        cfg.audio.hop_length = 64
        cfg.vae.n_units = UNITS
        cfg.vae.latent_dim = LATENT
        cfg.training.learning_rate = 1e-3
        cfg.tpu.backend = backend
        model = build_model(cfg)
        opt = build_optimizer(cfg)
        p = model.init(jax.random.PRNGKey(5))
        state = TrainState.create(p, opt.init(p), seed=5)
        return build_train_step(model, cfg, opt, donate=False), state

    batch = jnp.asarray(
        np.random.default_rng(4).uniform(-1, 1, (64, SEG)).astype(np.float32)
    )
    step_p, state_p = mk("pallas")
    step_x, state_x = mk("xla")
    sp, mp = step_p(state_p, batch)
    sx, mx = step_x(state_x, batch)
    assert float(mp["loss"]) == pytest.approx(float(mx["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.params["fc1"]["w"]), np.asarray(sx.params["fc1"]["w"]),
        atol=1e-5,
    )


def test_block_divisible_path(params):
    """B an exact multiple of the block — no padding branch."""
    x = jnp.asarray(
        np.random.default_rng(7).uniform(-1, 1, (512, SEG)).astype(np.float32)
    )
    mu, logvar, _ = encoder_fwd(
        params["fc1"]["w"], params["fc1"]["b"],
        params["fc21"]["w"], params["fc21"]["b"],
        params["fc22"]["w"], params["fc22"]["b"], x, block_b=256,
    )
    ref_mu, _ = vae.encode(params, x)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ref_mu),
                               atol=1e-5, rtol=1e-5)


def test_pallas_reparameterize_statistics():
    """On-chip Box-Muller sampling: mean/std/shape/determinism (the stream
    differs from threefry by design — tests are statistical)."""
    from rawaudiovae_kelsey_tpu.ops import pallas_reparameterize

    n, latent = 4096, 128
    mu = jnp.full((n, latent), 2.0)
    logvar = jnp.full((n, latent), np.log(0.25))  # std 0.5
    z = np.asarray(pallas_reparameterize(7, mu, logvar))
    assert z.shape == (n, latent)
    assert float(z.mean()) == pytest.approx(2.0, abs=0.01)
    assert float(z.std()) == pytest.approx(0.5, abs=0.01)
    # deterministic per seed; different seeds differ
    z2 = np.asarray(pallas_reparameterize(7, mu, logvar))
    np.testing.assert_array_equal(z, z2)
    z3 = np.asarray(pallas_reparameterize(8, mu, logvar))
    assert not np.array_equal(z, z3)
    # near-Gaussian tails: |z - mu| beyond 4 std is rare
    frac_tail = float((np.abs(z - 2.0) > 2.0).mean())
    assert frac_tail < 1e-3


def test_pallas_linear_parity_and_grads():
    """Generic n-tiled fused linear: fwd + grads match XLA for every
    activation, incl. an output dim that isn't a block multiple."""
    from rawaudiovae_kelsey_tpu.ops import pallas_linear

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((96, 384)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((384, 640)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(640).astype(np.float32) * 0.1)
    for act, ref in (("none", lambda v: v),
                     ("relu", jax.nn.relu),
                     ("tanh", jnp.tanh)):
        y = pallas_linear(x, w, b, act)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x @ w + b)),
                                   atol=2e-4, rtol=1e-4, err_msg=act)

        def lp(x, w, b):
            return jnp.mean(jnp.square(pallas_linear(x, w, b, act)))

        def lr(x, w, b):
            return jnp.mean(jnp.square(ref(x @ w + b)))

        gp = jax.grad(lp, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(lr, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-4, rtol=1e-3, err_msg=act)


def test_pallas_linear_ksplit_parity_and_grads():
    """Contraction-split fused linear (the large-layer path): fwd + grads
    match XLA at a shape that triggers the k-split dispatch, including
    ragged n and k (padding must contribute nothing)."""
    from rawaudiovae_kelsey_tpu.ops import pallas_linear
    from rawaudiovae_kelsey_tpu.ops.pallas_linear import (
        KSPLIT_BLOCK, KSPLIT_BLOCK_K, linear_ksplit_fwd)

    rng = np.random.default_rng(1)
    # k must clear the 2*KSPLIT_BLOCK_K dispatch gate (pallas_linear.py
    # _dispatch_fwd) or the "public op dispatches to k-split" check below
    # is vacuous — a review found the old k = KSPLIT_BLOCK_K + 64 routed
    # to the plain kernel and passed by bitwise coincidence
    from rawaudiovae_kelsey_tpu.ops.pallas_linear import KSPLIT_BLOCK_B

    B, k, n = max(2 * KSPLIT_BLOCK, KSPLIT_BLOCK_B), \
        2 * KSPLIT_BLOCK_K + 64, KSPLIT_BLOCK + 32
    x = jnp.asarray(rng.standard_normal((B, k)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    y = linear_ksplit_fwd(x, w, b, "relu")
    ref = jax.nn.relu(x @ w + b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    # the public op must dispatch to k-split at this shape and agree —
    # pin the gate condition so a future gate change re-vacuates loudly
    assert (B >= KSPLIT_BLOCK_B and k >= 2 * KSPLIT_BLOCK_K
            and n >= KSPLIT_BLOCK)
    y2 = pallas_linear(x, w, b, "relu")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    gp = jax.grad(lambda *a: jnp.mean(jnp.square(pallas_linear(*a, "relu"))),
                  argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.mean(jnp.square(
        jax.nn.relu(a[0] @ a[1] + a[2]))), argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, rtol=1e-3)


def test_deep_variant_pallas_backend():
    """backend=pallas on the deep family: forward parity + a train step."""
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    def mk(backend):
        cfg = Config()
        cfg.audio.segment_length = SEG
        cfg.audio.hop_length = 64
        cfg.vae.arch = "deep"
        cfg.vae.hidden_dims = "320,192"
        cfg.vae.latent_dim = 32
        cfg.training.learning_rate = 1e-3
        cfg.tpu.backend = backend
        return cfg, build_model(cfg)

    cfg_p, model_p = mk("pallas")
    cfg_x, model_x = mk("xla")
    params = model_p.init(jax.random.PRNGKey(2))
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (40, SEG)).astype(np.float32)
    )
    mu_p, lv_p = model_p.encode(params, x)
    mu_x, lv_x = model_x.encode(params, x)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_x),
                               atol=2e-5, rtol=1e-4)
    z = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((40, 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(model_p.decode(params, z)),
        np.asarray(model_x.decode(params, z)), atol=2e-5, rtol=1e-4,
    )
    opt = build_optimizer(cfg_p)
    state = TrainState.create(params, opt.init(params), seed=2)
    step = build_train_step(model_p, cfg_p, opt, donate=False)
    state, m = step(state, x)
    assert np.isfinite(float(m["loss"]))


def test_conv1d_pallas_parity():
    """conv-as-GEMM (patches + fused Pallas GEMM) vs XLA conv, fwd and
    transpose, multiple strides/kernels."""
    from rawaudiovae_kelsey_tpu.models import variants
    from rawaudiovae_kelsey_tpu.ops import conv1d_pallas, conv1d_transpose_pallas

    rng = np.random.default_rng(0)
    for K, S, L in ((9, 4, 64), (5, 2, 48), (3, 4, 32)):
        x = jnp.asarray(rng.standard_normal((2, L, 3)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((K, 3, 6)) * 0.1)
                        .astype(np.float32))
        b = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.1)
        ref = variants._conv({"w": w, "b": b}, x, S)
        got = conv1d_pallas(x, w, b, S, "none")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"conv K{K} S{S}")
        reft = variants._conv_transpose({"w": w, "b": b}, x, S)
        gott = conv1d_transpose_pallas(x, w, b, S, "none")
        np.testing.assert_allclose(np.asarray(gott), np.asarray(reft),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"convT K{K} S{S}")


@pytest.mark.slow
def test_conv1d_pallas_grad_parity():
    """Toeplitz custom-VJP grads (x, w, b) vs XLA autodiff, both conv
    directions, relu epilogue, odd window geometries."""
    from rawaudiovae_kelsey_tpu.models import variants
    from rawaudiovae_kelsey_tpu.ops import conv1d_pallas, conv1d_transpose_pallas

    rng = np.random.default_rng(1)
    for K, S, L in ((9, 4, 64), (5, 2, 48), (3, 4, 32), (7, 4, 64)):
        x = jnp.asarray(rng.standard_normal((3, L, 5)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((K, 5, 6)) * 0.1)
                        .astype(np.float32))
        b = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.1)

        def loss_ref(xx, ww, bb, tr):
            p = {"w": ww, "b": bb}
            y = (variants._conv_transpose(p, xx, S) if tr
                 else variants._conv(p, xx, S))
            return 0.5 * jnp.sum(jax.nn.relu(y) ** 2)

        def loss_pal(xx, ww, bb, tr):
            y = (conv1d_transpose_pallas(xx, ww, bb, S, "relu") if tr
                 else conv1d_pallas(xx, ww, bb, S, "relu"))
            return 0.5 * jnp.sum(y ** 2)

        for tr in (False, True):
            gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b, tr)
            gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, w, b, tr)
            for name, a, c in zip("xwb", gr, gp):
                np.testing.assert_allclose(
                    np.asarray(c), np.asarray(a), atol=5e-5, rtol=1e-4,
                    err_msg=f"d{name} K{K} S{S} transpose={tr}")


def test_conv1d_variant_pallas_backend():
    """Full conv1d VAE on the pallas backend: encode/decode parity with the
    XLA backend and a finite train step."""
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    def mk(backend):
        cfg = Config()
        cfg.audio.segment_length = SEG
        cfg.audio.hop_length = 64
        cfg.vae.arch = "conv1d"
        cfg.vae.conv_channels = "8,16"
        cfg.vae.conv_kernel = 5
        cfg.vae.conv_stride = 4
        cfg.vae.latent_dim = 16
        cfg.training.learning_rate = 1e-3
        cfg.tpu.backend = backend
        return cfg, build_model(cfg)

    cfg_p, model_p = mk("pallas")
    _, model_x = mk("xla")
    params = model_p.init(jax.random.PRNGKey(6))
    x = jnp.asarray(
        np.random.default_rng(7).uniform(-1, 1, (8, SEG)).astype(np.float32)
    )
    mu_p, _ = model_p.encode(params, x)
    mu_x, _ = model_x.encode(params, x)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_x),
                               atol=2e-5, rtol=1e-4)
    z = jnp.asarray(np.random.default_rng(8)
                    .standard_normal((8, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(model_p.decode(params, z)),
        np.asarray(model_x.decode(params, z)), atol=2e-5, rtol=1e-4,
    )
    opt = build_optimizer(cfg_p)
    state = TrainState.create(params, opt.init(params), seed=6)
    step = build_train_step(model_p, cfg_p, opt, donate=False)
    state, m = step(state, x)
    assert np.isfinite(float(m["loss"]))


def test_pallas_loss_parity_and_grads():
    """Fused loss reduction vs models/vae.loss_fn: value + all four input
    gradients, mean and sum reductions, non-block-multiple batch."""
    from rawaudiovae_kelsey_tpu.ops import pallas_loss

    rng = np.random.default_rng(0)
    n = 200  # not a multiple of 128 → padding path
    recon = jnp.asarray(rng.uniform(-1, 1, (n, SEG)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (n, SEG)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((n, LATENT)).astype(np.float32))
    logvar = jnp.asarray(
        (rng.standard_normal((n, LATENT)) * 0.3).astype(np.float32)
    )
    for reduction in ("mean", "sum"):
        got = float(pallas_loss(recon, x, mu, logvar, 1e-4, reduction))
        ref = float(vae.loss_fn(recon, x, mu, logvar, 1e-4, SEG, reduction))
        assert got == pytest.approx(ref, rel=1e-6), reduction

        gp = jax.grad(
            lambda *a: pallas_loss(*a, 1e-4, reduction), argnums=(0, 2, 3)
        )(recon, x, mu, logvar)
        gr = jax.grad(
            lambda *a: vae.loss_fn(*a, 1e-4, SEG, reduction),
            argnums=(0, 2, 3),
        )(recon, x, mu, logvar)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-5,
                                       err_msg=reduction)


def test_pallas_loss_components_op():
    """The fused 3-output loss op (standalone — deliberately NOT wired into
    the train step, see docs/PERF.md) matches loss_components exactly."""
    from rawaudiovae_kelsey_tpu.ops import pallas_loss_components
    from rawaudiovae_kelsey_tpu.models.vae import loss_components

    rng = np.random.default_rng(1)
    recon = jnp.asarray(rng.uniform(-1, 1, (64, SEG)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (64, SEG)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((64, LATENT)).astype(np.float32))
    lv = jnp.asarray((rng.standard_normal((64, LATENT)) * 0.3)
                     .astype(np.float32))
    for red in ("mean", "sum"):
        got = pallas_loss_components(recon, x, mu, lv, 1e-4, red)
        ref = loss_components(recon, x, mu, lv, 1e-4, SEG, red)
        for a, b in zip(got, ref):
            assert float(a) == pytest.approx(float(b), rel=1e-6), red
        # grads of the composite (loss only, aux zero-cotangent)
        gp = jax.grad(lambda r: pallas_loss_components(r, x, mu, lv,
                                                       1e-4, red)[0])(recon)
        gr = jax.grad(lambda r: loss_components(r, x, mu, lv, 1e-4,
                                                SEG, red)[0])(recon)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-7, rtol=1e-5)


def test_conv_transpose_small_kernel():
    """Review regression: K < stride (incl. K=1) transpose conv must match
    lax.conv_transpose (the old padding clamp-read real data)."""
    from rawaudiovae_kelsey_tpu.models import variants
    from rawaudiovae_kelsey_tpu.ops import conv1d_transpose_pallas

    rng = np.random.default_rng(5)
    for K, S in ((1, 2), (1, 4), (3, 4), (2, 4)):
        x = jnp.asarray(rng.standard_normal((2, 12, 3)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((K, 3, 5)) * 0.1)
                        .astype(np.float32))
        b = jnp.zeros(5, jnp.float32)
        ref = variants._conv_transpose({"w": w, "b": b}, x, S)
        got = conv1d_transpose_pallas(x, w, b, S, "none")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"K{K} S{S}")


def test_shard_map_sum_reduction():
    """Review regression: loss_reduction='sum' must psum (not pmean) across
    shards — global loss equals the replicated step's."""
    from rawaudiovae_kelsey_tpu.parallel import (
        build_shard_map_train_step,
        build_train_step,
        make_mesh,
    )
    from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = Config()
    cfg.audio.segment_length = SEG
    cfg.audio.hop_length = 64
    cfg.vae.n_units = UNITS
    cfg.vae.latent_dim = LATENT
    cfg.training.learning_rate = 1e-4
    cfg.training.loss_reduction = "sum"
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(9))
    mesh = make_mesh()
    batch = jnp.asarray(
        np.random.default_rng(9).uniform(-1, 1, (64, SEG)).astype(np.float32)
    )
    s1 = TrainState.create(params, opt.init(params), seed=9)
    s2 = TrainState.create(params, opt.init(params), seed=9)
    step_sm = build_shard_map_train_step(model, cfg, opt, mesh, donate=False)
    step_ref = build_train_step(model, cfg, opt, donate=False)
    _, m1 = step_sm(s1, jax.device_put(batch, batch_sharding(mesh)))
    _, m2 = step_ref(s2, batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=0.05)

    # microbatch config is rejected rather than silently ignored
    cfg.tpu.microbatch_size = 8
    with pytest.raises(ValueError, match="microbatch"):
        build_shard_map_train_step(model, cfg, opt, mesh)


def test_fused_backward_matches_primitives(params, x):
    """The round-3 fused backward kernels (dh/dh3 kept in-register —
    enc_bwd_dw1, grad_accum2, dec_bwd_fused) against the round-2 primitive
    composition they replaced.  Same math, different tiling: tolerance
    covers fp32 reduction-order only."""
    from rawaudiovae_kelsey_tpu.ops import (
        dec_bwd_fused,
        enc_bwd_dw1,
        grad_accum,
        grad_accum2,
    )
    from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (
        decoder_bwd,
        decoder_fwd,
        encoder_bwd,
        encoder_fwd,
    )

    rng = np.random.default_rng(11)
    mu, logvar, h = encoder_fwd(
        params["fc1"]["w"], params["fc1"]["b"],
        params["fc21"]["w"], params["fc21"]["b"],
        params["fc22"]["w"], params["fc22"]["b"], x,
    )
    dmu = jnp.asarray(rng.standard_normal((B, LATENT)).astype(np.float32))
    dlv = jnp.asarray(rng.standard_normal((B, LATENT)).astype(np.float32))
    _dx, dw1_0, db1_0, dw21_0, db21_0, dw22_0, db22_0 = encoder_bwd(
        params["fc1"]["w"], params["fc21"]["w"], params["fc22"]["w"],
        x, h, dmu, dlv,
    )
    dw1, db1 = enc_bwd_dw1(x, h, dmu, dlv,
                           params["fc21"]["w"], params["fc22"]["w"])
    dw21, db21, dw22, db22 = grad_accum2(h, dmu, dlv)
    for name, a, b in (("dw1", dw1_0, dw1), ("db1", db1_0, db1),
                       ("dw21", dw21_0, dw21), ("db21", db21_0, db21),
                       ("dw22", dw22_0, dw22), ("db22", db22_0, db22)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)

    z = jnp.asarray(rng.standard_normal((B, LATENT)).astype(np.float32))
    y, h3 = decoder_fwd(
        params["fc3"]["w"], params["fc3"]["b"],
        params["fc4"]["w"], params["fc4"]["b"], z,
    )
    dy = jnp.asarray(rng.standard_normal((B, SEG)).astype(np.float32))
    dz0, dw3_0, db3_0, dw4_0, db4_0 = decoder_bwd(
        params["fc3"]["w"], params["fc4"]["w"], z, h3, y, dy,
    )
    da = (dy * (1.0 - y * y)).astype(dy.dtype)
    dz, dw3, db3 = dec_bwd_fused(da, h3, z,
                                 params["fc4"]["w"], params["fc3"]["w"])
    dw4, db4 = grad_accum(h3, da)
    for name, a, b in (("dz", dz0, dz), ("dw3", dw3_0, dw3),
                       ("db3", db3_0, db3), ("dw4", dw4_0, dw4),
                       ("db4", db4_0, db4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_encode_input_grad_parity(params, x):
    """grad wrt the INPUT through pallas_encode vs XLA.  The training path
    never uses dx (XLA DCE removes the two primitives that compute it —
    verified on-TPU: the compiled train step contains exactly 6 Pallas
    custom calls), but the op-level contract must stay correct for callers
    that do differentiate the input (e.g. latent-space optimization)."""

    def loss_pallas(xx):
        mu, logvar = pallas_encode(params, xx)
        return jnp.sum(mu * 0.7) + jnp.sum(jnp.square(logvar))

    def loss_ref(xx):
        mu, logvar = vae.encode(params, xx)
        return jnp.sum(mu * 0.7) + jnp.sum(jnp.square(logvar))

    gx1 = jax.grad(loss_pallas)(x)
    gx2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=2e-4, rtol=1e-4)


def test_pallas_backend_under_mesh():
    """The Pallas tier must stay usable under jax.sharding meshes: GSPMD
    partitions the train step around the custom calls for both pure-dp
    and dp x tp layouts (loss equal across layouts)."""
    import numpy as np

    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import (
        build_train_step,
        make_mesh,
        named_shardings,
        param_specs,
    )
    from rawaudiovae_kelsey_tpu.parallel.mesh import batch_sharding
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    losses = {}
    for mp in (1, 2):
        cfg = Config()
        cfg.audio.segment_length = SEG
        cfg.vae.n_units = UNITS
        cfg.vae.latent_dim = LATENT
        cfg.training.batch_size = 32
        cfg.tpu.backend = "pallas"
        cfg.tpu.model_parallel = mp
        mesh = make_mesh(8 // mp, mp)
        model = build_model(cfg)
        opt = build_optimizer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        params = jax.device_put(
            params, named_shardings(mesh, param_specs(model.name, params, mp))
        )
        state = TrainState.create(params, opt.init(params), seed=0)
        step = build_train_step(model, cfg, opt, mesh=mesh)
        batch = jax.device_put(
            jnp.ones((32, SEG), jnp.float32) * 0.1, batch_sharding(mesh)
        )
        state, m = step(state, batch)
        losses[mp] = float(jax.device_get(m["loss"]))
        assert np.isfinite(losses[mp])
    assert abs(losses[1] - losses[2]) < 1e-5


def test_high_tier_full_fusion_parity(params, x):
    """The fp32 'high' tier (bf16 3-pass hi/lo inside the kernels, the
    production precision=high recipe) previously had zero CI coverage —
    pin fwd + grads against the XLA high tier."""
    from rawaudiovae_kelsey_tpu.ops.pallas_mlp import pallas_decode

    z = jnp.asarray(
        np.random.default_rng(5).standard_normal((B, LATENT)).astype(
            np.float32))

    def loss_p(p):
        mu, logvar = pallas_encode(p, x)
        return (jnp.sum(mu * 1.3) + jnp.sum(jnp.square(logvar))
                + jnp.sum(jnp.square(pallas_decode(p, z))))

    def loss_r(p):
        mu, logvar = vae.encode(p, x)
        return (jnp.sum(mu * 1.3) + jnp.sum(jnp.square(logvar))
                + jnp.sum(jnp.square(vae.decode(p, z))))

    with jax.default_matmul_precision("high"):
        lp = float(loss_p(params))
        gp = jax.grad(loss_p)(params)
    with jax.default_matmul_precision("highest"):
        lr = float(loss_r(params))
        gr = jax.grad(loss_r)(params)
    assert lp == pytest.approx(lr, rel=1e-4)
    for name in ("fc1", "fc21", "fc22", "fc3", "fc4"):
        np.testing.assert_allclose(
            np.asarray(gp[name]["w"]), np.asarray(gr[name]["w"]),
            atol=5e-4, rtol=5e-4, err_msg=name)


def test_toeplitz_grad_falls_back_when_dx_pass_does_not_fit(monkeypatch):
    """Review regression: the backward's dx pass swaps panel widths, so it
    can be VMEM-infeasible when the forward fit — grad must fall back to
    the per-tap XLA path, not raise mid-differentiation."""
    from rawaudiovae_kelsey_tpu.ops import pallas_toeplitz as T

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 8)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)

    def loss(x_, w_, b_):
        return jnp.sum(jnp.square(T.toeplitz_matmul(x_, w_, b_, "relu")))

    ref = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)

    # force the dx direction infeasible (da has 16-wide rows -> G=8 panel;
    # stub the tile picker to claim it doesn't fit)
    real = T.pick_batch_tile

    def fake(Bv, nb, G, t, n, itemsize, kb=3):
        if G == 16:  # the swapped (dx) direction
            return 0
        return real(Bv, nb, G, t, n, itemsize, kb)

    monkeypatch.setattr(T, "pick_batch_tile", fake)
    got = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)
