"""ctypes binding for the native audio decoder (native/audiodec.cc).

The reference decodes mp3 preview clips via librosa/torchaudio
(generate_node_features.py:60-77); this image has neither, so compressed
clip ingestion goes through the system FFmpeg libraries in one C call per
clip: demux any container, decode the first audio stream, swresample to
mono float32 at the requested rate.  `features.load_clip` routes every
non-.wav/.npy extension here.  `encode_mp3` (libmp3lame through
libavcodec) exists so tests can synthesize real mp3 vectors offline.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libaudiodec.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ad_version.restype = ctypes.c_int
    lib.ad_decode.restype = ctypes.c_int64
    lib.ad_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.ad_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.ad_encode_mp3.restype = ctypes.c_int64
    lib.ad_encode_mp3.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def decode(path: str, target_sr: int) -> np.ndarray:
    """Decode any FFmpeg-supported audio file -> mono float32 @ target_sr."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            "native audio decoder not built (make -C native; needs the "
            "system FFmpeg dev libraries)")
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.ad_decode(path.encode(), int(target_sr), ctypes.byref(out))
    if n < 0:
        raise ValueError(f"audio decode failed for {path!r} "
                         f"(AVERROR {int(n)})")
    try:
        y = np.ctypeslib.as_array(out, shape=(int(n),)).copy()
    finally:
        lib.ad_free(out)
    return y


def encode_mp3(path: str, samples: np.ndarray, sr: int,
               bitrate: int = 128_000) -> None:
    """Encode mono float32 samples to an .mp3 (test-vector utility)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native audio decoder not built")
    y = np.ascontiguousarray(np.asarray(samples, dtype=np.float32).ravel())
    err = lib.ad_encode_mp3(
        path.encode(), y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.shape[0], int(sr), int(bitrate))
    if err < 0:
        raise ValueError(f"mp3 encode failed for {path!r} "
                         f"(AVERROR {int(err)})")
