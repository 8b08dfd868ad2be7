"""Waveform resynthesis from decoded frames.

The reference flat-concatenated decoded frames (``tensor.view(-1)``,
train.py:232, tutorial cell 18) with no windowing — correct for
non-overlapping encode, and deliberately "wrong" (a ~segment/hop× time
stretch) for overlapping encode (tutorial cell 52).  Both behaviors are kept
for parity, plus a principled windowed overlap-add mode the reference lacked
(quirk #14 extension).
"""

from __future__ import annotations

import numpy as np


def flat_concat(frames: np.ndarray) -> np.ndarray:
    """``view(-1)`` resynthesis — bit-parity with the reference path."""
    return np.asarray(frames, np.float32).reshape(-1)


def overlap_add(frames: np.ndarray, hop: int,
                window: str = "hann") -> np.ndarray:
    """Windowed overlap-add of decoded frames laid out at stride ``hop``.

    Use with frames decoded from an overlapping encode (``frame_audio(...,
    hop=k)``): output length = ``(n_frames - 1) * hop + segment``.  Windows
    are normalized by the summed window envelope so constant signals
    reconstruct to constants (COLA-safe for any hop dividing the segment).
    """
    frames = np.asarray(frames, np.float32)
    n, seg = frames.shape
    if n == 0:
        return np.zeros(0, np.float32)
    if window == "hann" and hop >= seg:
        # periodic hann is COLA only for hop = seg/k with k >= 2; at
        # hop == seg its zero first sample would zero one sample per frame
        # (a click train) — non-overlapping frames need no window at all
        win = np.ones(seg, np.float32)
    elif window == "hann":
        # periodic hann (COLA-exact when hop divides seg, hop < seg)
        k = np.arange(seg)
        win = (0.5 - 0.5 * np.cos(2 * np.pi * k / seg)).astype(np.float32)
    elif window == "rect":
        win = np.ones(seg, np.float32)
    else:
        raise ValueError(f"unknown window {window!r}")
    out_len = (n - 1) * hop + seg
    out = np.zeros(out_len, np.float64)
    norm = np.zeros(out_len, np.float64)
    for i in range(n):
        out[i * hop:i * hop + seg] += frames[i] * win
        norm[i * hop:i * hop + seg] += win
    norm[norm < 1e-8] = 1.0
    return (out / norm).astype(np.float32)


def stretch_resynthesis(frames_overlapping: np.ndarray) -> np.ndarray:
    """The reference's "extension" effect (tutorial cell 52): encode with
    overlapping windows (hop < segment), decode, then flat-concat — yielding
    a ~segment/hop× time-stretched texture.  Identical to flat_concat; named
    separately to document intent."""
    return flat_concat(frames_overlapping)
