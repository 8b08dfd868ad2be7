"""Test harness: force an 8-device virtual CPU mesh.

Must run before JAX initializes any backend — the standard trick for testing
pjit/mesh code without TPU hardware (SURVEY.md §4).  Individual TPU-only
benchmarks live outside tests/.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


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
