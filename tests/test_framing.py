"""Data-pipeline tests: framing math vs the reference's __len__/__getitem__
formulas (dataset.py:86-160), streaming semantics (dataset.py:11-84), batching
and device prefetch."""

import itertools

import numpy as np
import pytest

from rawaudiovae_kelsey_tpu.data import (
    AudioFrameDataset,
    StreamingFrameDataset,
    TestFrameDataset,
    nonoverlapping_frame_count,
    overlapping_frame_count,
    overlapping_frames,
    prefetch_to_device,
    streaming_file_frames,
)
from rawaudiovae_kelsey_tpu.io import write_wav


@pytest.mark.parametrize("n", [1024, 1152, 3000, 5000, 128, 100, 4096, 12345])
def test_overlapping_count_matches_reference_formula(n):
    """dataset.py:121: len = padded//hop - seg//hop + 1."""
    seg, hop = 1024, 128
    audio = np.arange(n, dtype=np.float32)
    ds = AudioFrameDataset(audio, seg, hop)
    padded = n + (-n % hop)
    # the raw reference formula (may be negative for corpus < one segment)
    assert overlapping_frame_count(n, seg, hop) == padded // hop - seg // hop + 1
    assert len(ds) == max(0, overlapping_frame_count(n, seg, hop))
    assert ds.frames.shape == (len(ds), seg)


def test_overlapping_getitem_contract():
    """dataset.py:107-112: item i = audio[i*hop : i*hop+seg]."""
    seg, hop = 64, 16
    audio = np.arange(1000, dtype=np.float32)
    ds = AudioFrameDataset(audio, seg, hop)
    padded = np.pad(audio, (0, 16 - 1000 % 16))
    for i in [0, 1, 5, len(ds) - 1]:
        np.testing.assert_array_equal(ds[i], padded[i * hop:i * hop + seg])
        np.testing.assert_array_equal(ds.frames[i], ds[i])


def test_segment_hop_validation():
    with pytest.raises(ValueError):
        AudioFrameDataset(np.zeros(100), 100, 33)


@pytest.mark.parametrize("n", [1024, 1025, 2047, 2048, 10])
def test_nonoverlapping_count(n):
    """dataset.py:160: len = padded//seg."""
    seg = 1024
    ds = TestFrameDataset(np.ones(n, np.float32), seg)
    assert len(ds) == nonoverlapping_frame_count(n, seg)
    assert len(ds) == -(-n // seg)
    # tail zero-padded
    if n % seg:
        assert ds[len(ds) - 1][-1] == 0.0


def test_streaming_file_tail_rule():
    """dataset.py:61-69: pad file to hop multiple, then only full windows."""
    seg, hop = 1024, 128
    # raw len 1100 → padded 1152 → windows starting 0 and 128
    frames = streaming_file_frames(np.ones(1100, np.float32), seg, hop)
    assert frames.shape == (2, seg)
    # file shorter than a segment yields nothing
    assert streaming_file_frames(np.ones(1000, np.float32), seg, hop).shape[0] == 1
    assert streaming_file_frames(np.ones(895, np.float32), seg, hop).shape[0] == 0


def test_batches_cover_all_frames_once():
    ds = AudioFrameDataset(np.arange(4096, dtype=np.float32), 256, 64)
    got = np.concatenate(list(ds.batches(7, shuffle=False)), axis=0)
    np.testing.assert_array_equal(got, ds.frames)
    # shuffled epoch is a permutation
    got_s = np.concatenate(list(ds.batches(7, shuffle=True, seed=3)), axis=0)
    assert got_s.shape == ds.frames.shape
    assert not np.array_equal(got_s, ds.frames)
    np.testing.assert_array_equal(
        np.sort(got_s[:, 0]), np.sort(ds.frames[:, 0])
    )
    # drop_last drops the remainder
    n_full = len(ds) // 7
    assert sum(1 for _ in ds.batches(7, shuffle=False, drop_last=True)) == n_full


@pytest.fixture
def stream_dir(tmp_path):
    d = tmp_path / "audio"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i, n in enumerate([2200, 1500, 3100]):
        write_wav(d / f"f{i}.wav", rng.uniform(-0.5, 0.5, n).astype(np.float32),
                  44100)
    return d


def test_streaming_honors_segment_config(stream_dir):
    """Quirk #2 fix: reference hard-coded segment 1024 (dataset.py:66)."""
    ds = StreamingFrameDataset(stream_dir, 44100, hop_size=64,
                               segment_length=512, shuffle=False)
    batch = next(ds.batches(8))
    assert batch.shape == (8, 512)


def test_streaming_cycles_and_crosses_files(stream_dir):
    seg, hop = 1024, 128
    ds = StreamingFrameDataset(stream_dir, 44100, hop, seg, shuffle=False)
    per_file = [
        streaming_file_frames(
            np.zeros(n + (-n % hop), np.float32), seg, hop
        ).shape[0]
        for n in [2200, 1500, 3100]
    ]
    frames_per_pass = sum(per_file)
    batch_size = 5
    # pull 3 passes worth — proves cycling never exhausts
    n_batches = (3 * frames_per_pass) // batch_size
    batches = list(itertools.islice(ds.batches(batch_size), n_batches))
    assert all(b.shape == (batch_size, seg) for b in batches)


def test_streaming_shuffle_reproducible(stream_dir):
    a = StreamingFrameDataset(stream_dir, 44100, 128, 1024, shuffle=True, seed=9)
    b = StreamingFrameDataset(stream_dir, 44100, 128, 1024, shuffle=True, seed=9)
    for x, y in zip(itertools.islice(a.batches(4), 10),
                    itertools.islice(b.batches(4), 10)):
        np.testing.assert_array_equal(x, y)


def test_streaming_empty_folder(tmp_path):
    ds = StreamingFrameDataset(tmp_path, 44100, 128, 1024)
    with pytest.raises(FileNotFoundError):
        next(ds.batches(4))


def test_streaming_total_num_frames_bound(stream_dir):
    """train_iterable.py:74,195: total batches = total_num_frames//batch_size,
    enforced via islice."""
    ds = StreamingFrameDataset(stream_dir, 44100, 128, 1024, shuffle=False)
    total_num_frames, batch_size = 100, 8
    batches = list(itertools.islice(ds.batches(batch_size),
                                    total_num_frames // batch_size))
    assert len(batches) == 12


def test_prefetcher_yields_all_and_preserves_order():
    import jax.numpy as jnp

    batches = [np.full((4, 8), i, np.float32) for i in range(20)]
    out = list(prefetch_to_device(iter(batches), depth=3))
    assert len(out) == 20
    for i, b in enumerate(out):
        assert float(b[0, 0]) == i
        assert isinstance(b, jnp.ndarray)


def test_prefetcher_propagates_errors():
    def gen():
        yield np.zeros((2, 2), np.float32)
        raise RuntimeError("decode failed")

    it = prefetch_to_device(gen(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetcher_cast_dtype():
    import ml_dtypes

    batches = [np.full((4, 8), 0.5, np.float32) for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), depth=2,
                                  cast_dtype=ml_dtypes.bfloat16))
    assert str(out[0].dtype) == "bfloat16"
    assert float(out[0][0, 0]) == 0.5


def test_streaming_decode_workers_order(stream_dir):
    """The decode-ahead pool must preserve the exact stream order."""
    a = StreamingFrameDataset(stream_dir, 44100, 128, 1024, shuffle=True,
                              seed=5, decode_workers=0)
    b = StreamingFrameDataset(stream_dir, 44100, 128, 1024, shuffle=True,
                              seed=5, decode_workers=3)
    for x, y in zip(itertools.islice(a.batches(16), 12),
                    itertools.islice(b.batches(16), 12)):
        np.testing.assert_array_equal(x, y)


def test_validate_dataset(tmp_path):
    """check_dataset/check_audio keys are functional (quirk #9 upgrade)."""
    from rawaudiovae_kelsey_tpu.data.validate import (
        check_before_training,
        validate_dataset,
    )

    d = tmp_path / "audio"
    d.mkdir()
    write_wav(d / "ok.wav", np.full(4410, 0.3, np.float32), 44100)
    write_wav(d / "other_rate.wav", np.full(4800, 0.3, np.float32), 48000)
    write_wav(d / "silent.wav", np.zeros(1000, np.float32), 44100)
    write_wav(d / "clipped.wav", np.ones(1000, np.float32), 44100)
    (d / "corrupt.wav").write_bytes(b"RIFFjunkWAVEjunk")

    rep = validate_dataset(d, 44100, deep=True)
    assert rep.n_files == 5
    assert rep.corrupt == ["corrupt.wav"]
    assert rep.resample_needed == ["other_rate.wav"]
    assert rep.silent == ["silent.wav"]
    assert rep.clipped == ["clipped.wav"]
    assert not rep.ok
    with pytest.raises(ValueError, match="corrupt"):
        check_before_training(d, 44100, True, False)
    # disabled flags skip entirely
    check_before_training(d, 44100, False, False)


def test_index_batches_replay_stream_exactly(stream_dir):
    """The resident stream's index plan must reproduce the host stream's
    batches bit-for-bit (same shuffle RNG consumption)."""
    seg, hop, bs = 512, 128, 16
    host = StreamingFrameDataset(stream_dir, 44100, hop, seg, shuffle=True,
                                 seed=4, decode_workers=0)
    resident = StreamingFrameDataset(stream_dir, 44100, hop, seg,
                                     shuffle=True, seed=4, decode_workers=0)
    frames = resident.all_frames()
    for hb, idx in zip(itertools.islice(host.batches(bs), 15),
                       itertools.islice(resident.index_batches(bs), 15)):
        np.testing.assert_array_equal(hb, frames[idx])


def test_streaming_all_files_too_short_raises(tmp_path):
    """Review regression: a corpus in which EVERY file frames to zero rows
    (all shorter than one segment) must raise, not busy-loop forever."""
    rng = np.random.default_rng(1)
    for i in range(3):
        write_wav(tmp_path / f"s{i}.wav",
                  rng.uniform(-0.4, 0.4, 300).astype(np.float32), 44100)
    for workers in (0, 2):
        ds = StreamingFrameDataset(tmp_path, 44100, hop_size=128,
                                   segment_length=1024, shuffle=False,
                                   decode_workers=workers)
        with pytest.raises(FileNotFoundError, match="shorter than one"):
            next(ds.batches(4))


def test_streaming_cache_budget_bounded(stream_dir):
    """Review regression: the decoded-file cache must stay within its byte
    budget (the host-fed path previously cached the whole corpus forever)."""
    ds = StreamingFrameDataset(stream_dir, 44100, hop_size=128,
                               segment_length=1024, shuffle=False,
                               cache_budget_bytes=4096)
    list(itertools.islice(ds.batches(4), 12))  # cycles all three files
    assert ds._cache_used <= 4096
    assert len(ds._cache) <= 1  # each decoded file is > the budget alone
    ds.release_cache()
    assert ds._cache_used == 0 and not ds._cache


def test_prefetcher_exhaustion_is_sticky():
    """Review regression: next() after StopIteration must keep raising
    StopIteration (it used to block forever on the empty queue), and next()
    after close() must not hang either."""
    batches = [np.full((2, 4), i, np.float32) for i in range(3)]
    feed = prefetch_to_device(iter(batches), depth=2)
    assert len(list(feed)) == 3
    with pytest.raises(StopIteration):
        next(feed)
    with pytest.raises(StopIteration):
        next(feed)

    feed2 = prefetch_to_device(iter(batches), depth=2)
    next(feed2)
    feed2.close()
    with pytest.raises(StopIteration):
        while True:
            next(feed2)


def test_streaming_few_files_shared_decode(stream_dir):
    """A file appearing multiple times inside the decode-ahead window is
    decoded once per window, and the stream order is unchanged."""
    ds = StreamingFrameDataset(stream_dir, 44100, hop_size=128,
                               segment_length=1024, shuffle=False,
                               decode_workers=3)
    ref = StreamingFrameDataset(stream_dir, 44100, hop_size=128,
                                segment_length=1024, shuffle=False,
                                decode_workers=0)
    a = np.concatenate(list(itertools.islice(ds.frames_iter(), 9)))
    b = np.concatenate(list(itertools.islice(ref.frames_iter(), 9)))
    np.testing.assert_array_equal(a, b)


def test_all_samples_matches_all_frames(stream_dir):
    """The samples-layout contract: samples[starts[g] : starts[g]+seg]
    reproduces all_frames()[g] for EVERY global frame, including per-file
    hop padding and the short-file drop rule."""
    from rawaudiovae_kelsey_tpu.data.datasets import StreamingFrameDataset

    ds = StreamingFrameDataset(stream_dir, 44100, 128, 512, shuffle=False)
    frames = ds.all_frames()
    ds2 = StreamingFrameDataset(stream_dir, 44100, 128, 512, shuffle=False)
    samples, starts = ds2.all_samples()
    assert starts.dtype == np.int32
    assert len(starts) == len(frames)
    for g in range(len(frames)):
        np.testing.assert_array_equal(
            samples[starts[g]:starts[g] + 512], frames[g])
    # frame_counts memoized by all_samples == the decode-based counts
    assert ds2.frame_counts() == ds.frame_counts()


def test_all_samples_drops_short_files(tmp_path):
    d = tmp_path / "audio"
    d.mkdir()
    rng = np.random.default_rng(1)
    write_wav(d / "long.wav",
              rng.uniform(-0.5, 0.5, 2000).astype(np.float32), 44100)
    write_wav(d / "short.wav",
              rng.uniform(-0.5, 0.5, 100).astype(np.float32), 44100)
    from rawaudiovae_kelsey_tpu.data.datasets import StreamingFrameDataset

    ds = StreamingFrameDataset(d, 44100, 128, 512, shuffle=False)
    frames = ds.all_frames()
    samples, starts = StreamingFrameDataset(
        d, 44100, 128, 512, shuffle=False).all_samples()
    assert len(starts) == len(frames)
    for g in range(len(frames)):
        np.testing.assert_array_equal(
            samples[starts[g]:starts[g] + 512], frames[g])
