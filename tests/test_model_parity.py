"""Numerical parity of the JAX model against the PyTorch reference
architecture (rebuilt inline here from the rawvae/model.py:5-46 spec — we do
not import reference code).  This pins the bit-for-float requirement of
BASELINE.json: identical weights → identical encode/decode/loss up to fp32
accumulation-order noise.  Where the tolerance comes from (measured,
benchmarks/ulp_audit.py, at the full 1024/2048/256 scale): the matmul
reduction-order differences contribute up to ~1.2e-6 abs on the fc1
pre-activation and ~3.3e-7 on the chained encode/decode outputs, while
the transcendentals are near-exact (exp 1 ULP, tanh 4 ULP) — so the
bound is set by dot-product accumulation order, not libm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rawaudiovae_kelsey_tpu.compat import (
    params_to_state_dict,
    state_dict_to_params,
)
from rawaudiovae_kelsey_tpu.models import vae

SEG, UNITS, LATENT = 256, 512, 64


class TorchRefVAE(torch.nn.Module):
    """The reference architecture, re-typed from its spec (model.py:5-35):
    Linear(seg→units)+ReLU → two latent heads; Linear(latent→units)+ReLU →
    Linear(units→seg)+tanh."""

    def __init__(self, seg, units, latent):
        super().__init__()
        self.fc1 = torch.nn.Linear(seg, units)
        self.fc21 = torch.nn.Linear(units, latent)
        self.fc22 = torch.nn.Linear(units, latent)
        self.fc3 = torch.nn.Linear(latent, units)
        self.fc4 = torch.nn.Linear(units, seg)

    def encode(self, x):
        h1 = torch.relu(self.fc1(x))
        return self.fc21(h1), self.fc22(h1)

    def decode(self, z):
        h3 = torch.relu(self.fc3(z))
        return torch.tanh(self.fc4(h3))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    tmodel = TorchRefVAE(SEG, UNITS, LATENT).eval()
    params = state_dict_to_params(tmodel.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tmodel, params


def test_encode_parity(pair):
    tmodel, params = pair
    x = np.random.default_rng(0).standard_normal((32, SEG)).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.from_numpy(x))
    jmu, jlogvar = vae.encode(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jmu), tmu.numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jlogvar), tlogvar.numpy(), atol=1e-6, rtol=1e-5
    )


def test_decode_parity(pair):
    tmodel, params = pair
    z = np.random.default_rng(1).standard_normal((32, LATENT)).astype(np.float32)
    with torch.no_grad():
        tx = tmodel.decode(torch.from_numpy(z))
    jx = vae.decode(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(jx), tx.numpy(), atol=1e-6, rtol=1e-5)


def test_roundtrip_encode_decode_parity(pair):
    """Full deterministic pipeline (z = mu) — the inference path."""
    tmodel, params = pair
    x = np.random.default_rng(2).uniform(-1, 1, (16, SEG)).astype(np.float32)
    with torch.no_grad():
        tmu, _ = tmodel.encode(torch.from_numpy(x))
        trec = tmodel.decode(tmu)
    jmu, jlogvar = vae.encode(params, jnp.asarray(x))
    jrec = vae.decode(params, vae.reparameterize(None, jmu, jlogvar, deterministic=True))
    np.testing.assert_allclose(np.asarray(jrec), trec.numpy(), atol=3e-6, rtol=1e-5)


def test_loss_parity(pair):
    """loss_function numerics (model.py:38-46): mean MSE + beta*mean KLD."""
    tmodel, params = pair
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (64, SEG)).astype(np.float32)
    recon = rng.uniform(-1, 1, (64, SEG)).astype(np.float32)
    mu = rng.standard_normal((64, LATENT)).astype(np.float32)
    logvar = rng.standard_normal((64, LATENT)).astype(np.float32) * 0.3
    kl_beta = 1e-4

    tx, trecon = torch.from_numpy(x), torch.from_numpy(recon)
    tmu, tlogvar = torch.from_numpy(mu), torch.from_numpy(logvar)
    t_recon_loss = torch.nn.functional.mse_loss(trecon, tx)
    t_kld = -0.5 * torch.mean(1 + tlogvar - tmu.pow(2) - tlogvar.exp())
    t_loss = (t_recon_loss + kl_beta * t_kld).item()

    j_loss = float(vae.loss_fn(jnp.asarray(recon), jnp.asarray(x),
                               jnp.asarray(mu), jnp.asarray(logvar),
                               kl_beta, SEG))
    assert j_loss == pytest.approx(t_loss, abs=1e-6)

    # sum reduction path (reference's dead loss_reduction key, honored here)
    t_sum = (torch.nn.functional.mse_loss(trecon, tx, reduction="sum")
             + kl_beta * -0.5 * torch.sum(1 + tlogvar - tmu.pow(2) - tlogvar.exp())
             ).item()
    j_sum = float(vae.loss_fn(jnp.asarray(recon), jnp.asarray(x),
                              jnp.asarray(mu), jnp.asarray(logvar),
                              kl_beta, SEG, reduction="sum"))
    assert j_sum == pytest.approx(t_sum, rel=1e-6)


def test_state_dict_roundtrip(pair):
    tmodel, params = pair
    sd = params_to_state_dict(params)
    for k, v in tmodel.state_dict().items():
        np.testing.assert_array_equal(sd[k], v.numpy())


def test_reparameterize_statistics():
    """z = mu + eps*exp(0.5*logvar) with explicit threefry key."""
    key = jax.random.PRNGKey(0)
    mu = jnp.full((20000, 8), 1.5)
    logvar = jnp.full((20000, 8), np.log(0.25))  # std 0.5
    z = vae.reparameterize(key, mu, logvar)
    assert float(jnp.mean(z)) == pytest.approx(1.5, abs=0.01)
    assert float(jnp.std(z)) == pytest.approx(0.5, abs=0.01)
    # reproducible
    z2 = vae.reparameterize(key, mu, logvar)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    # deterministic mode
    np.testing.assert_array_equal(
        np.asarray(vae.reparameterize(None, mu, logvar, deterministic=True)),
        np.asarray(mu),
    )


def test_torch_init_distribution():
    """Our init matches nn.Linear's U(±1/sqrt(fan_in)) law."""
    params = vae.init_dense(jax.random.PRNGKey(0), 1024, 2048, 256)
    w = np.asarray(params["fc1"]["w"])
    bound = 1.0 / np.sqrt(1024)
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.std() - bound / np.sqrt(3)) < 0.002
    assert w.shape == (1024, 2048)


def test_param_count_default_config():
    """Default config ≈ 5.77M params (BASELINE.md)."""
    params = vae.init_dense(jax.random.PRNGKey(0), 1024, 2048, 256)
    n = vae.param_count(params)
    expected = (1024 * 2048 + 2048) + 2 * (2048 * 256 + 256) \
        + (256 * 2048 + 2048) + (2048 * 1024 + 1024)
    assert n == expected == 5772800


class _PickleVAE(torch.nn.Module):
    """Module-level class (local classes aren't picklable) whose pickle path
    is forced to rawvae.model.VAE below."""

    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(SEG, UNITS)
        self.fc21 = torch.nn.Linear(UNITS, LATENT)
        self.fc22 = torch.nn.Linear(UNITS, LATENT)
        self.fc3 = torch.nn.Linear(LATENT, UNITS)
        self.fc4 = torch.nn.Linear(UNITS, SEG)


def test_whole_module_pickle_import(tmp_path):
    """best_model.pt-style whole-module pickles (train.py:243-244) load even
    though the reference 'rawvae' package is not importable — the importer
    synthesizes a stub class for unpickling."""
    import sys
    import types

    # build a pickle whose class path is rawvae.model.VAE, then make that
    # module unimportable (simulating the real environment)
    pkg = types.ModuleType("rawvae")
    mod = types.ModuleType("rawvae.model")
    VAE = _PickleVAE
    VAE.__module__ = "rawvae.model"
    VAE.__qualname__ = "VAE"
    VAE.__name__ = "VAE"
    mod.VAE = VAE
    pkg.model = mod
    sys.modules["rawvae"] = pkg
    sys.modules["rawvae.model"] = mod
    torch.manual_seed(3)
    m = VAE()
    p = tmp_path / "best_model.pt"
    torch.save(m, p)
    expected = {k: v.numpy().copy() for k, v in m.state_dict().items()}
    del sys.modules["rawvae"], sys.modules["rawvae.model"]

    from rawaudiovae_kelsey_tpu.compat import load_torch_checkpoint

    params = load_torch_checkpoint(p)
    np.testing.assert_array_equal(
        np.asarray(params["fc1"]["w"]).T, expected["fc1.weight"]
    )
    sys.modules.pop("rawvae", None)
    sys.modules.pop("rawvae.model", None)
