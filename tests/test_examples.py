"""Smoke test for examples/tutorial.py — the script form of the reference's
tutorial.ipynb (its flagship user flow: checkpoint → sources → encode →
interpolate → decode → resynthesize → artifacts)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.io import read_wav, write_wav

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_tutorial_example_end_to_end(tmp_path):
    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.train.epoch import train

    audio = tmp_path / "audio"
    test = tmp_path / "test_audio"
    audio.mkdir()
    test.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        n = 6000 + 1500 * i
        wave = (0.5 * np.sin(np.linspace(0, 80 * (i + 1), n))).astype(
            np.float32)
        write_wav(audio / f"src{i}.wav", wave, 44100)
    write_wav(test / "t.wav",
              rng.uniform(-0.3, 0.3, 4000).astype(np.float32), 44100)

    cfg = Config()
    cfg.dataset.datapath = str(tmp_path)
    cfg.audio.segment_length = 512
    cfg.audio.hop_length = 128
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = 16
    cfg.training.batch_size = 32
    cfg.training.epochs = 1
    cfg.training.checkpoint_interval = 0
    cfg.training.save_best_model_after = 0
    cfg.extra.description = "tut_smoke"
    ctx = train(cfg, verbose=False)
    run = ctx.workspace.workdir

    out = tmp_path / "tut_out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO)
    res = subprocess.run(
        [sys.executable, str(REPO / "examples" / "tutorial.py"),
         "--run", str(run), "--audio", str(audio),
         "--out", str(out), "--duration", "0.5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stdout + res.stderr

    # every tutorial artifact exists and is real, nonzero audio
    for name in ("source_a.wav", "source_b.wav", "morph_stepwise.wav",
                 "morph_timevarying.wav", "morph_gentle.wav",
                 "recon_ola.wav", "stretch_effect.wav"):
        w, sr = read_wav(out / name)
        assert sr == 44100 and w.size > 0, name
        assert float(np.abs(w).max()) > 0, name
    assert (out / "comparison.png").stat().st_size > 0
    # the stretch effect is the hop-overlap encode → flat decode ≈
    # seg/hop× longer output (tutorial cell 52 semantics)
    src, _ = read_wav(out / "source_a.wav")
    stretch, _ = read_wav(out / "stretch_effect.wav")
    assert stretch.size > 2 * src.size
