"""Observability tests: the native TensorBoard event writer is validated
against the *official* tensorboard reader (installed in the test env only),
plus Tee and StepTimer."""

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.observe import EventWriter, StepTimer, tee_stdout
from rawaudiovae_kelsey_tpu.observe.tb import crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


@pytest.fixture
def read_events():
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

    def _read(log_dir):
        import glob

        files = glob.glob(str(log_dir / "events.out.tfevents.*"))
        assert len(files) == 1
        loader = tb.LegacyEventFileLoader(files[0])
        return list(loader.Load())

    return _read


def test_scalars_readable_by_official_reader(tmp_path, read_events):
    with EventWriter(tmp_path) as w:
        w.add_scalar("Loss/Batch", 0.25, 7)
        w.add_scalar("Learning Rate", 1e-4, 7)
        w.add_scalar("Loss/train_total", 123.5, 1)
    events = read_events(tmp_path)
    assert events[0].file_version == "brain.Event:2"
    scalars = {
        e.summary.value[0].tag: (e.step, e.summary.value[0].simple_value)
        for e in events[1:]
    }
    assert scalars["Loss/Batch"] == (7, pytest.approx(0.25))
    assert scalars["Learning Rate"] == (7, pytest.approx(1e-4))
    assert scalars["Loss/train_total"] == (1, pytest.approx(123.5))


def test_histogram_readable(tmp_path, read_events):
    values = np.random.default_rng(0).standard_normal(1000)
    with EventWriter(tmp_path) as w:
        w.add_histogram("fc1.weight", values, 3)
    (ev,) = [e for e in read_events(tmp_path) if e.summary.value]
    h = ev.summary.value[0].histo
    assert ev.summary.value[0].tag == "fc1.weight"
    assert h.num == 1000
    assert h.min == pytest.approx(values.min())
    assert h.max == pytest.approx(values.max())
    assert h.sum == pytest.approx(values.sum())
    assert sum(h.bucket) == 1000
    assert len(h.bucket) == len(h.bucket_limit)


def test_audio_readable(tmp_path, read_events):
    wave = (0.5 * np.sin(np.linspace(0, 30, 2048))).astype(np.float32)
    with EventWriter(tmp_path) as w:
        w.add_audio("Reconstructed Audio", wave, 90, sample_rate=44100)
    (ev,) = [e for e in read_events(tmp_path) if e.summary.value]
    a = ev.summary.value[0].audio
    assert a.sample_rate == 44100
    assert a.num_channels == 1
    assert a.length_frames == 2048
    assert a.content_type == "audio/wav"
    # the embedded bytes are a valid wav our own codec can decode
    import io

    p = tmp_path / "roundtrip.wav"
    p.write_bytes(a.encoded_audio_string)
    from rawaudiovae_kelsey_tpu.io import read_wav

    decoded, sr = read_wav(p)
    assert sr == 44100
    np.testing.assert_array_equal(decoded[:, 0], wave)


def test_tee_stdout(tmp_path):
    log = tmp_path / "console_log"
    with tee_stdout(log):
        print("hello from the trainer")
    assert "hello from the trainer" in log.read_text()


def test_step_timer():
    t = StepTimer(warmup=1)
    import time

    for d in (0.05, 0.01, 0.01):
        t.start()
        time.sleep(d)
        t.stop()
    assert 0.008 < t.mean_step_s() < 0.03  # warmup step excluded
    fps = t.frames_per_sec(batch_size=1000)
    assert fps > 1000 / 0.03


def test_histogram_of_diverged_params_stays_consistent(tmp_path):
    """Review regression: ±inf/NaN values (a diverging run — exactly when
    histograms matter) must produce a proto the official reader accepts,
    with sum(bucket) == num and finite stats."""
    tb = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    from rawaudiovae_kelsey_tpu.observe import EventWriter

    w = EventWriter(tmp_path)
    vals = np.asarray([1.0, -2.0, np.inf, -np.inf, np.nan, 1e25], np.float64)
    w.add_histogram("diverged", vals, 1)
    w.close()
    import glob

    (f,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    histos = []
    for e in tb.LegacyEventFileLoader(f).Load():
        for v in e.summary.value:
            if v.tag == "diverged":
                histos.append(v.histo)
    (h,) = histos
    assert sum(h.bucket) == h.num == 5  # NaN dropped
    assert np.isfinite(h.min) and np.isfinite(h.max) and np.isfinite(h.sum)


def test_tee_delegates_stream_attrs(tmp_path):
    """Review regression: code probing sys.stdout (isatty/fileno/encoding)
    while the Tee is installed must not crash."""
    import io

    from rawaudiovae_kelsey_tpu.observe import tee_stdout

    base = io.StringIO()
    from rawaudiovae_kelsey_tpu.observe.logging import Tee

    t = Tee(tmp_path / "log", stream=base)
    assert t.isatty() is False  # delegated to StringIO
    t.write("x")
    t.close()
    with tee_stdout(tmp_path / "log2"):
        import sys

        sys.stdout.isatty()  # must not raise
