"""ctypes binding to libtpuaudio (native/tpuaudio.cc) with transparent
fallback to the pure-NumPy codec.

``decode_mono(path, mono)`` is the single entry point: it returns
``(mono_float32_wave, native_sample_rate)`` exactly like
``wavio.read_wav`` + ``wavio.to_mono``, but does the byte→float conversion
and channel mixdown in one C++ pass.  If the shared library is missing or
fails to build/load, the NumPy path is used — behavior is identical
(parity-tested in tests/test_native.py).

Build the library with ``make -C native`` at the repo root; the loader also
attempts an on-demand build the first time if a compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libtpuaudio.so"

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
        try:  # on-demand build (quiet; failure just means fallback)
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ta_abi_version.restype = ctypes.c_int
        if lib.ta_abi_version() != 1:
            return None
        lib.ta_wav_info.restype = ctypes.c_int
        lib.ta_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ta_decode_mono.restype = ctypes.c_int64
        lib.ta_decode_mono.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ]
        if hasattr(lib, "ta_crc32c"):
            lib.ta_crc32c.restype = ctypes.c_uint32
            lib.ta_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError: a stale libtpuaudio.so missing a symbol — the
        # contract is transparent fallback to the numpy codec, not a crash
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_mono(path, mono: str = "mean",
                force_fallback: bool = False) -> Tuple[np.ndarray, int]:
    """Decode a wav file to (mono float32 wave, native sample rate)."""
    if mono not in ("mean", "first"):
        raise ValueError(f"unknown mono mode {mono!r}")
    lib = None if force_fallback else _load()
    if lib is not None:
        data = Path(path).read_bytes()
        channels = ctypes.c_int32()
        rate = ctypes.c_int32()
        bits = ctypes.c_int32()
        n_frames = ctypes.c_int64()
        rc = lib.ta_wav_info(data, len(data), ctypes.byref(channels),
                             ctypes.byref(rate), ctypes.byref(bits),
                             ctypes.byref(n_frames))
        if rc == 0:
            out = np.empty(n_frames.value, dtype=np.float32)
            mode = 1 if mono == "first" else 0
            got = lib.ta_decode_mono(
                data, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n_frames.value, mode,
            )
            if got >= 0:
                return out[:got], int(rate.value)
        # rc != 0 → fall through to the NumPy codec on the bytes ALREADY
        # in memory (it raises a proper WavFormatError with the filename)
        from rawaudiovae_kelsey_tpu.io.wavio import decode_wav_bytes, to_mono

        samples, sr = decode_wav_bytes(data, name=str(path))
        return to_mono(samples, mode=mono), sr
    from rawaudiovae_kelsey_tpu.io.wavio import read_wav, to_mono

    samples, sr = read_wav(path)
    return to_mono(samples, mode=mono), sr


def native_crc32c(data: bytes):
    """Castagnoli CRC via the C++ lib, or None when unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "ta_crc32c"):
        return None
    return int(lib.ta_crc32c(data, len(data)))
