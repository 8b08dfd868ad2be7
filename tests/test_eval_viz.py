"""Eval CLI + visualization tests."""

import json

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.config import Config
from rawaudiovae_kelsey_tpu.io import write_wav
from rawaudiovae_kelsey_tpu.observe.viz import (
    amplitude_to_db,
    save_comparison,
    stft_mag,
)


def test_stft_mag_tone():
    sr = 8192
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 1024 * t).astype(np.float32)
    mag = stft_mag(wave, n_fft=1024, hop=256)
    assert mag.shape[0] == 513
    # peak bin ≈ 1024 Hz → bin 1024/(8192/1024) = 128
    peak_bins = np.argmax(mag, axis=0)
    assert np.all(np.abs(peak_bins - 128) <= 1)


def test_amplitude_to_db_range():
    mag = np.array([[1.0, 0.1, 1e-8]])
    db = amplitude_to_db(mag, top_db=80.0)
    assert db[0, 0] == pytest.approx(0.0)
    assert db[0, 1] == pytest.approx(-20.0)
    assert db[0, 2] == pytest.approx(-80.0)  # floored


def test_save_comparison_png(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.uniform(-0.5, 0.5, 8000).astype(np.float32)
    b = rng.uniform(-0.5, 0.5, 8000).astype(np.float32)
    p = save_comparison(a, b, 44100, tmp_path / "cmp.png")
    assert p.exists() and p.stat().st_size > 10_000


@pytest.fixture
def trained_run(tmp_path):
    from rawaudiovae_kelsey_tpu.train.epoch import train

    rng = np.random.default_rng(7)
    (tmp_path / "audio").mkdir()
    (tmp_path / "test_audio").mkdir()
    for i in range(2):
        write_wav(tmp_path / "audio" / f"t{i}.wav",
                  (0.4 * np.sin(np.linspace(0, 99 * (i + 1), 8000)))
                  .astype(np.float32), 44100)
    write_wav(tmp_path / "test_audio" / "ts.wav",
              rng.uniform(-0.3, 0.3, 4000).astype(np.float32), 44100)
    cfg = Config()
    cfg.dataset.datapath = str(tmp_path)
    cfg.audio.segment_length = 512
    cfg.audio.hop_length = 128
    cfg.vae.n_units = 64
    cfg.vae.latent_dim = 16
    cfg.training.batch_size = 32
    cfg.training.epochs = 2
    cfg.training.checkpoint_interval = 0
    cfg.training.save_best_model_after = 0
    cfg.extra.description = "evalrun"
    ctx = train(cfg, verbose=False)
    return ctx.workspace.workdir


@pytest.mark.slow
def test_eval_cli(trained_run, capsys):
    from rawaudiovae_kelsey_tpu.eval.cli import main

    main(["--run", str(trained_run), "--params", "last",
          "--deterministic", "--write-wav"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["recon_mse"]) and out["recon_mse"] > 0
    assert out["frames"] == 8  # 4000 samples / 512 → 8 padded frames
    assert out["sampling"] == "deterministic"
    assert (trained_run / "audio_logs" / "eval_reconstruction.wav").exists()


@pytest.mark.slow
def test_eval_cli_stochastic_differs(trained_run, capsys):
    from rawaudiovae_kelsey_tpu.eval.cli import main

    main(["--run", str(trained_run), "--params", "last", "--seed", "1"])
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["--run", str(trained_run), "--params", "last", "--seed", "2"])
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["recon_mse"] != m2["recon_mse"]  # different sampling keys


@pytest.mark.slow
def test_profiler_window_capture(tmp_path, trained_run=None):
    """[tpu] profile_steps captures a jax.profiler trace during the epoch
    loop (SURVEY §5.1 — the reference had no profiling at all)."""
    from rawaudiovae_kelsey_tpu.train.epoch import train

    (tmp_path / "audio").mkdir()
    write_wav(tmp_path / "audio" / "t.wav",
              np.full(6000, 0.2, np.float32), 44100)
    cfg = Config()
    cfg.dataset.datapath = str(tmp_path)
    cfg.dataset.generate_test = False
    cfg.audio.segment_length = 512
    cfg.audio.hop_length = 128
    cfg.vae.n_units = 32
    cfg.vae.latent_dim = 8
    cfg.training.batch_size = 16
    cfg.training.epochs = 3
    cfg.training.checkpoint_interval = 0
    cfg.extra.description = "profrun"
    cfg.tpu.profile_start = 1
    cfg.tpu.profile_steps = 2
    ctx = train(cfg, verbose=False)
    profile_dir = ctx.workspace.log_dir / "profile"
    assert profile_dir.is_dir()
    # trace capture writes plugin artifacts under plugins/profile/<ts>/
    assert list(profile_dir.rglob("*")), "empty profile dir"
