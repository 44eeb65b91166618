"""ctypes bindings for the native C++ audio IO (native/audio_io.cpp).

Compiled on demand with g++ (cached as a shared library next to the source);
falls back silently to the pure-Python path when a toolchain isn't available.
pybind11 isn't shipped in this image, so the binding layer is plain ctypes over a
C ABI (allowed binding routes per the build constraints).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "audio_io.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libwm_audio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        decode_sig = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.wm_decode_wav.restype = ctypes.c_int64
        lib.wm_decode_wav.argtypes = decode_sig
        lib.wm_decode_flac.restype = ctypes.c_int64
        lib.wm_decode_flac.argtypes = decode_sig
        lib.wm_decode_audio.restype = ctypes.c_int64
        lib.wm_decode_audio.argtypes = decode_sig
        lib.wm_resample.restype = ctypes.c_int64
        lib.wm_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_audio(path: str, max_seconds: float = 120.0) -> Tuple[np.ndarray, int]:
    """Decode a WAV or FLAC file (format-sniffed by magic) to float32 mono.

    Raises on failure.  FLAC covers LibriSpeech (the reference's benchmark
    corpus ships .flac; reference reads it via torchaudio.load, dataset.py:67)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio lib unavailable")
    with open(path, "rb") as f:
        buf = f.read()
    cap = int(max_seconds * 96000)
    out = np.empty((cap,), np.float32)
    sr = ctypes.c_int32(0)
    n = lib.wm_decode_audio(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"native audio decode failed ({n}) for {path}")
    return out[:n].copy(), int(sr.value)


def load_wav(path: str, max_seconds: float = 120.0) -> Tuple[np.ndarray, int]:
    """Back-compat alias for :func:`load_audio`."""
    return load_audio(path, max_seconds)


def resample(audio: np.ndarray, sr: int, target_sr: int = 16000) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio lib unavailable")
    audio = np.ascontiguousarray(audio, np.float32)
    cap = int(len(audio) * (target_sr / sr) + 16)
    out = np.empty((cap,), np.float32)
    n = lib.wm_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        sr, target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    if n < 0:
        raise ValueError(f"native resample failed ({n})")
    return out[:n].copy()
