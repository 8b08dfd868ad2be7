"""Dataset objects: the three reference loader contracts, batch-first.

The reference fed per-item torch Datasets through DataLoader (train.py:133-134,
train_iterable.py:143-151); on TPU the unit of work is the device batch, so
these classes index and iterate whole ``(batch, segment)`` float32 arrays that
go straight into ``device_put``.  Item-level indexing is kept for contract
tests against the reference's ``__getitem__`` math.
"""

from __future__ import annotations

import random
import threading
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

from rawaudiovae_kelsey_tpu.data import framing
from rawaudiovae_kelsey_tpu.io import load


class AudioFrameDataset:
    """Map-style overlapping-window dataset over a concatenated corpus —
    the AudioDataset contract (dataset.py:86-121)."""

    def __init__(self, audio: np.ndarray, segment_length: int, hop_size: int,
                 sampling_rate: int = 44100):
        if segment_length % hop_size != 0:
            raise ValueError(
                f"segment_length {segment_length} is not a multiple of "
                f"hop_size {hop_size}"
            )
        self.segment_length = segment_length
        self.hop_size = hop_size
        self.sampling_rate = sampling_rate
        self.audio = framing.pad_to_multiple(
            np.asarray(audio, dtype=np.float32), hop_size
        )
        self.frames = framing.overlapping_frames(
            self.audio, segment_length, hop_size
        )

    def __len__(self) -> int:
        # dataset.py:121 — clamped at 0: the reference formula goes negative
        # for a corpus shorter than one segment (where DataLoader would have
        # crashed on the same __len__).
        return max(
            0,
            len(self.audio) // self.hop_size
            - self.segment_length // self.hop_size + 1,
        )

    def __getitem__(self, index: int) -> np.ndarray:
        # dataset.py:107-112
        start = index * self.hop_size
        return self.audio[start:start + self.segment_length]

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: Optional[int] = None, drop_last: bool = False
                ) -> Iterator[np.ndarray]:
        """One epoch of ``(B, segment)`` batches.  ``shuffle=True`` permutes
        frame order like DataLoader(shuffle=True) (train.py:134); the final
        short batch is kept by default (DataLoader drop_last=False)."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, n, batch_size):
            idx = order[i:i + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            yield np.ascontiguousarray(self.frames[idx])

    def num_batches(self, batch_size: int, drop_last: bool = False) -> int:
        n = len(self)
        return n // batch_size if drop_last else -(-n // batch_size)


class TestFrameDataset:
    """Non-overlapping eval dataset — the TestDataset contract
    (dataset.py:129-160)."""

    __test__ = False  # keep pytest from collecting this as a test class

    def __init__(self, audio: np.ndarray, segment_length: int,
                 sampling_rate: int = 44100):
        self.segment_length = segment_length
        self.sampling_rate = sampling_rate
        self.audio = framing.pad_to_multiple(
            np.asarray(audio, dtype=np.float32), segment_length
        )
        self.frames = framing.nonoverlapping_frames(self.audio, segment_length)

    def __len__(self) -> int:
        return len(self.audio) // self.segment_length  # dataset.py:160

    def __getitem__(self, index: int) -> np.ndarray:
        start = index * self.segment_length
        return self.audio[start:start + self.segment_length]

    def batches(self, batch_size: int) -> Iterator[np.ndarray]:
        for i in range(0, len(self.frames), batch_size):
            yield self.frames[i:i + batch_size]


class StreamingFrameDataset:
    """Streaming wav-folder dataset — the IterableAudioDataset contract
    (dataset.py:11-84): shuffle the *file list* each pass, cycle it forever,
    decode/resample/first-channel/pad each file, emit overlapping windows.

    Differences from the reference (intentional):
      * honors the configured ``segment_length`` (the reference hard-coded
        1024 at dataset.py:66 — quirk #2, fixed);
      * emits windows as vectorized per-file arrays, batched across file
        boundaries (same element order as chain.from_iterable);
      * a seeded ``random.Random`` replaces the ambient ``random.sample``
        (dataset.py:42) so runs are reproducible.
    """

    def __init__(self, audio_folder: Path, sampling_rate: int, hop_size: int,
                 segment_length: int, shuffle: bool = True,
                 mono: str = "first", seed: Optional[int] = None,
                 host_id: int = 0, num_hosts: int = 1,
                 decode_workers: int = 2,
                 cache_budget_bytes: int = 4 << 30):
        self.audio_folder = Path(audio_folder)
        self.sampling_rate = sampling_rate
        self.hop_size = hop_size
        self.segment_length = segment_length
        self.shuffle = shuffle
        self.mono = mono
        self._rng = random.Random(seed)
        files = sorted(self.audio_folder.glob("*.wav"))
        self.audio_file_list: List[Path] = [
            f for i, f in enumerate(files) if i % num_hosts == host_id
        ]
        self.num_files = len(self.audio_file_list)
        # decoded-file cache, BOUNDED: an unbounded cache on a corpus larger
        # than host RAM would OOM the host-fed streaming path mid-pass (the
        # reference streamed in O(1 file) memory).  Insertion-order eviction;
        # sized by the strided view's base buffer, not the inflated view.
        self._cache: "dict[Path, np.ndarray]" = {}
        self._cache_lock = threading.Lock()
        self._cache_used = 0
        self.cache_decoded = True
        self.cache_budget_bytes = cache_budget_bytes
        # decode-ahead pool: overlaps wav decode/resample of upcoming files
        # with training (the reference's DataLoader ran with num_workers=0 —
        # zero overlap, SURVEY.md §2)
        self.decode_workers = max(0, decode_workers)

    def _shuffled(self) -> List[Path]:
        # random.sample(list, len(list)) semantics of dataset.py:42
        return self._rng.sample(self.audio_file_list, len(self.audio_file_list))

    @staticmethod
    def _frames_bytes(frames: np.ndarray) -> int:
        # charge the underlying buffer, not the inflated strided view
        # (as_strided wraps the buffer in stride_tricks' DummyArray, so walk
        # the base chain and take the last real ndarray)
        size = frames.nbytes
        base = frames
        while getattr(base, "base", None) is not None:
            base = base.base
            if isinstance(base, np.ndarray):
                size = base.nbytes
        return size

    def _file_frames(self, path: Path) -> np.ndarray:
        with self._cache_lock:
            cached = self._cache.get(path)
        if cached is not None:
            return cached
        wave, _ = load(path, sr=self.sampling_rate, mono=self.mono)
        frames = framing.streaming_file_frames(
            wave, self.segment_length, self.hop_size
        )
        if self.cache_decoded:
            size = self._frames_bytes(frames)
            with self._cache_lock:
                if size <= self.cache_budget_bytes:
                    self._cache[path] = frames
                    self._cache_used += size
                    # evict OLDEST entries (insertion order) until we fit;
                    # never the entry just inserted
                    while (self._cache_used > self.cache_budget_bytes
                           and len(self._cache) > 1):
                        oldest = next(iter(self._cache))
                        old = self._cache.pop(oldest)
                        self._cache_used -= self._frames_bytes(old)
        return frames

    def _file_plan(self) -> Iterator[Path]:
        """Infinite file sequence: cycle with per-pass shuffle
        (dataset.py:77-84)."""
        while True:
            file_list = self._shuffled() if self.shuffle else self.audio_file_list
            yield from file_list

    def frames_iter(self) -> Iterator[np.ndarray]:
        """Infinite stream of per-file frame arrays.  With
        ``decode_workers > 0`` upcoming files are decoded ahead on a thread
        pool so decode/resample overlaps training (the reference DataLoader
        ran num_workers=0 — zero overlap).  A full pass in which EVERY file
        frames to zero rows (all files shorter than one segment) raises
        instead of spinning forever."""
        if self.num_files == 0:
            raise FileNotFoundError(
                f"no wav files in {self.audio_folder}"
            )
        empty_streak = 0

        def check_empty(frames: np.ndarray) -> bool:
            nonlocal empty_streak
            if len(frames):
                empty_streak = 0
                return True
            empty_streak += 1
            if empty_streak >= self.num_files:
                raise FileNotFoundError(
                    f"no usable wav files in {self.audio_folder}: every "
                    f"file is shorter than one segment "
                    f"({self.segment_length} samples)"
                )
            return False

        plan = self._file_plan()
        if self.decode_workers <= 0:
            for f in plan:
                frames = self._file_frames(f)
                if check_empty(frames):
                    yield frames
            return
        from concurrent.futures import ThreadPoolExecutor

        depth = self.decode_workers + 1
        with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
            # in-flight map: the same file appearing twice inside the decode
            # window (few-files corpora) shares one decode instead of
            # redundantly decoding it per slot
            inflight: dict = {}

            def submit(f: Path):
                fut = inflight.get(f)
                if fut is None or fut.done():
                    fut = pool.submit(self._file_frames, f)
                    inflight[f] = fut
                return fut

            pending = [submit(next(plan)) for _ in range(depth)]
            while True:
                fut = pending.pop(0)
                pending.append(submit(next(plan)))
                frames = fut.result()
                if check_empty(frames):
                    yield frames

    def release_cache(self) -> None:
        """Free the decoded per-file cache (frame counts stay memoized) —
        called once the resident trainer has uploaded the data to device."""
        with self._cache_lock:
            self._cache.clear()
            self._cache_used = 0

    def frame_counts(self) -> List[int]:
        """Streaming frame count per file (decodes once; memoized so the
        index plan never re-decodes after release_cache)."""
        if not hasattr(self, "_frame_counts"):
            self._frame_counts = [len(self._file_frames(f))
                                  for f in self.audio_file_list]
        return self._frame_counts

    # ---------------------------------------------------- resident support --
    def all_frames(self) -> np.ndarray:
        """Every file's streaming windows concatenated in sorted-file order —
        the frame matrix the device-resident stream path uploads once."""
        parts = [self._file_frames(f) for f in self.audio_file_list]
        self._frame_counts = [len(p) for p in parts]
        parts = [p for p in parts if len(p)]
        if not parts:
            raise FileNotFoundError(f"no usable wav files in {self.audio_folder}")
        return np.concatenate(parts, axis=0)

    def all_samples(self) -> tuple:
        """Memory-lean twin of :meth:`all_frames`: ``(samples, starts)``
        where ``samples`` is every usable file's hop-padded audio
        concatenated and ``starts[g]`` is the sample offset of global frame
        ``g`` — ``samples[starts[g] : starts[g] + segment_length]`` equals
        ``all_frames()[g]`` exactly, at hop/segment of the footprint
        (overlapping windows are materialized nowhere).  Files too short to
        yield a window contribute no samples, mirroring ``all_frames``'s
        empty-part drop.  Raises when the corpus exceeds int32 addressing
        (such a corpus could not have used the frames layout either)."""
        parts: List[np.ndarray] = []
        starts: List[np.ndarray] = []
        counts: List[int] = []
        base = 0
        for f in self.audio_file_list:
            wave, _ = load(f, sr=self.sampling_rate, mono=self.mono)
            wave = framing.pad_to_multiple(
                np.ascontiguousarray(wave), self.hop_size)
            n = len(wave)
            c = ((n - self.segment_length) // self.hop_size + 1
                 if n >= self.segment_length else 0)
            counts.append(c)
            if c:
                parts.append(wave)
                starts.append(base + np.arange(c, dtype=np.int64)
                              * self.hop_size)
                base += n
        self._frame_counts = counts
        if not parts:
            raise FileNotFoundError(
                f"no usable wav files in {self.audio_folder}")
        if base >= 2 ** 31:
            raise ValueError(
                f"corpus of {base:,} samples exceeds int32 frame "
                "addressing; use resident_layout=frames (it will not fit "
                "either) or a smaller corpus")
        return (np.concatenate(parts),
                np.concatenate(starts).astype(np.int32))

    def index_plan(self) -> Iterator[np.ndarray]:
        """Infinite stream of per-file frame-index arrays into
        :meth:`all_frames`, in EXACTLY the order :meth:`frames_iter` would
        emit the frames (same shuffle RNG consumption).  Lets the device-
        resident stream trainer replay the stream with int32 indices instead
        of audio rows."""
        counts = self.frame_counts()
        offsets = {}
        acc = 0
        for f, c in zip(self.audio_file_list, counts):
            offsets[f] = (acc, c)
            acc += c
        if acc == 0:
            raise FileNotFoundError(f"no usable wav files in {self.audio_folder}")
        while True:
            file_list = (self._shuffled() if self.shuffle
                         else self.audio_file_list)
            for f in file_list:
                lo, c = offsets[f]
                if c:
                    yield np.arange(lo, lo + c, dtype=np.int32)

    def index_batches(self, batch_size: int) -> Iterator[np.ndarray]:
        """Batched form of :meth:`index_plan` — same chunking rule as
        :meth:`batches`."""
        return _rebatch(self.index_plan(), batch_size)

    def batches(self, batch_size: int) -> Iterator[np.ndarray]:
        """Infinite stream of exact ``(batch_size, segment)`` batches,
        crossing file boundaries like the reference DataLoader did.  Bound it
        with itertools.islice (train_iterable.py:195)."""
        return _rebatch(self.frames_iter(), batch_size)


def _rebatch(stream: Iterator[np.ndarray],
             batch_size: int) -> Iterator[np.ndarray]:
    """Re-chunk a stream of variable-length arrays into exact
    ``batch_size``-row batches, crossing input boundaries — ONE
    implementation, because the index plan must replay the audio stream's
    chunking bit-exactly (the resident stream trainer depends on it)."""
    buf: List[np.ndarray] = []
    have = 0
    for arr in stream:
        buf.append(arr)
        have += len(arr)
        while have >= batch_size:
            chunk = np.concatenate(buf, axis=0) if len(buf) > 1 else buf[0]
            yield np.ascontiguousarray(chunk[:batch_size])
            rest = chunk[batch_size:]
            buf = [rest] if len(rest) else []
            have = len(rest)
