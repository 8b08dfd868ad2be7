"""Graceful-interruption test: SIGTERM mid-training → in-flight step
finishes, checkpoint written, clean exit; --resume continues."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.io import write_wav

REPO = Path(__file__).resolve().parents[1]

DRIVER = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["train_iterable.py", "--config", sys.argv[1]]
from rawaudiovae_kelsey_tpu.train.cli import main_stream
main_stream()
"""


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    (tmp_path / "audio").mkdir()
    (tmp_path / "test_audio").mkdir()
    for i in range(2):
        write_wav(tmp_path / "audio" / f"t{i}.wav",
                  (0.4 * np.sin(np.linspace(0, 300, 60000)))
                  .astype(np.float32), 44100)
    write_wav(tmp_path / "test_audio" / "ts.wav",
              np.zeros(2048, np.float32) + 0.1, 44100)
    ini = tmp_path / "c.ini"
    ini.write_text(f"""
[audio]
segment_length = 512
hop_length = 128
[dataset]
datapath = {tmp_path}
[VAE]
n_units = 64
latent_dim = 16
[training]
total_num_frames = {64 * 100000}
batch_size = 64
checkpoint_interval = 1000000
[extra]
description = sigterm_test
""")
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.Popen(
        [sys.executable, str(driver), str(ini)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait until the run dir exists and training has begun
    run_dir = tmp_path / "sigterm_test" / "run-000"
    deadline = time.time() + 90
    console = run_dir / "console_log"
    while time.time() < deadline:
        if console.exists() and "Batch" in console.read_text():
            break
        time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("trainer never started")

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out
    assert "checkpointing and exiting" in out
    assert "Interrupted at batch" in out
    ckpts = list((run_dir / "model" / "checkpoints").glob("ckpt_*.npz"))
    assert ckpts, out
