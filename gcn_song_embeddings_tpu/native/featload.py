"""ctypes binding for the native feature-directory loader
(native/featload.cc).

The reference stacks one ``.pt`` tensor per track id in a serial Python loop
at dataset load (spotify_graph.py:66-79).  Here a C++ thread pool streams the
``.npy`` vectors straight into one [N, d] float32 matrix; Python resolves
id -> path and loads ``.pt`` interop stragglers.  Falls back to the pure
Python loop when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfeatload.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fl_probe_dim.restype = ctypes.c_int64
    lib.fl_probe_dim.argtypes = [ctypes.c_char_p]
    lib.fl_load_rows.restype = ctypes.c_int64
    lib.fl_load_rows.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_feature_rows(features_dir: str, track_ids: Sequence[str],
                      n_threads: int = 0) -> np.ndarray:
    """Stack per-id feature vectors from `features_dir` into [N, d] float32.

    ``<id>.npy`` files ride the native threaded reader; ids with only a
    ``<id>.pt`` file are filled in afterwards via torch (interop path).
    Raises FileNotFoundError when an id has neither.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native featload library not built")

    paths: list[bytes] = []
    pt_rows: list[tuple[int, str]] = []
    probe: str | None = None
    for i, tid in enumerate(track_ids):
        npy = os.path.join(features_dir, tid + ".npy")
        if os.path.isfile(npy):
            paths.append(npy.encode())
            probe = probe or npy
            continue
        pt = os.path.join(features_dir, tid + ".pt")
        if os.path.isfile(pt):
            paths.append(b"")
            pt_rows.append((i, pt))
            continue
        raise FileNotFoundError(f"no feature file for track {tid!r} "
                                f"in {features_dir}")

    n = len(paths)
    if probe is not None:
        dim = int(lib.fl_probe_dim(probe.encode()))
        if dim <= 0:
            raise ValueError(f"unreadable .npy header: {probe}")
    else:
        if not pt_rows:
            return np.zeros((0, 0), dtype=np.float32)
        import torch

        dim = int(torch.load(pt_rows[0][1], weights_only=True).numel())

    out = np.zeros((n, dim), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*paths)
    first_bad = ctypes.c_int64(-1)
    n_bad = lib.fl_load_rows(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dim,
        n_threads, ctypes.byref(first_bad))
    if n_bad:
        # The C reader only handles little-endian contiguous f32/f64; for
        # anything it rejects (e.g. '>f4' big-endian writers) re-read the
        # whole directory with np.load, which converts correctly.  The
        # reject-then-fallback split keeps the fast path honest (it never
        # byte-swaps silently) while still accepting every valid file.
        bad_id = track_ids[first_bad.value]
        import warnings

        warnings.warn(
            f"{n_bad} feature files not loadable by the native reader "
            f"(first: {bad_id!r}.npy); falling back to np.load for the "
            f"directory {features_dir}")
        for i, path in enumerate(paths):
            if not path:
                continue  # .pt rows handled below
            try:
                vec = np.load(path.decode()).reshape(-1)
            except Exception as e:
                raise ValueError(
                    f"feature file failed to load even via np.load: "
                    f"{path.decode()} ({e!r})") from e
            if vec.shape[0] != dim:
                raise ValueError(
                    f"feature file failed to load as a [{dim}] vector: "
                    f"{path.decode()} has {vec.shape[0]} elements")
            out[i] = vec.astype(np.float32)

    if pt_rows:
        import torch  # interop only; never used in the compute path

        for i, pt in pt_rows:
            vec = torch.load(pt, weights_only=True).numpy().reshape(-1)
            if vec.shape[0] != dim:
                raise ValueError(
                    f"feature dim mismatch: {pt} has {vec.shape[0]}, "
                    f"expected {dim}")
            out[i] = vec.astype(np.float32)
    return out
