"""Test harness: force an 8-device virtual CPU mesh.

Must run before JAX initializes any backend — the standard trick for testing
pjit/mesh code without TPU hardware (SURVEY.md §4).  Individual TPU-only
benchmarks live outside tests/.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The host environment pre-sets JAX_PLATFORMS=axon (TPU) and the axon PJRT
# plugin overrides the env var, so force CPU via the config API (must happen
# before any backend initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def wav_dir(tmp_path, rng):
    """A folder of small wav files, like the reference's <datapath>/audio/."""
    from rawaudiovae_kelsey_tpu.io import write_wav

    d = tmp_path / "audio"
    d.mkdir()
    for i, n in enumerate([3000, 5000, 2048]):
        wave = (0.25 * np.sin(np.linspace(0, 40 * np.pi * (i + 1), n))).astype(
            np.float32
        )
        write_wav(d / f"tone{i}.wav", wave, 44100)
    return d
