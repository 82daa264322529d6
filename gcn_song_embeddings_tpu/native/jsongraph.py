"""ctypes binding for the native graph-JSON parser (native/jsongraph.cc).

Falls back to the Python ``json`` module when the shared library is absent.
The native path matters for dataset_large-scale graphs (~531 MB graph.json in
the reference layout, SURVEY §7): a single-pass C++ scan avoids materializing
millions of Python dicts.
"""

from __future__ import annotations

import ctypes
import json
import os
from typing import Mapping

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libjsongraph.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.jg_table_new.restype = ctypes.c_void_p
    lib.jg_table_new.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                 ctypes.c_int64]
    lib.jg_table_free.argtypes = [ctypes.c_void_p]
    lib.jg_parse_edges.restype = ctypes.c_void_p
    lib.jg_parse_edges.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.jg_edges_len.restype = ctypes.c_int64
    lib.jg_edges_len.argtypes = [ctypes.c_void_p]
    lib.jg_edges_missing.restype = ctypes.c_int64
    lib.jg_edges_missing.argtypes = [ctypes.c_void_p]
    lib.jg_edges_copy.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.jg_edges_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def load_edges(graph_path: str, index_map: Mapping[str, int]
               ) -> tuple[np.ndarray, np.ndarray]:
    """Parse graph.json and return (from_idx, to_idx) int32 arrays."""
    lib = _load_lib()
    if lib is None:
        return _load_edges_python(graph_path, index_map)

    # The native table maps key i -> index i positionally; that only equals
    # the Mapping's semantics when its values are exactly 0..n-1 in key
    # order (true for SongGraph's id map).  Any other mapping (subset,
    # remapped ids) must take the Python path or indices would silently
    # point at the wrong nodes.
    if any(v != i for i, v in enumerate(index_map.values())):
        return _load_edges_python(graph_path, index_map)

    ids = list(index_map.keys())
    arr = (ctypes.c_char_p * len(ids))(*[s.encode("utf-8") for s in ids])
    table = lib.jg_table_new(arr, len(ids))
    try:
        edges = lib.jg_parse_edges(graph_path.encode("utf-8"), table)
        if not edges:
            # Malformed for the fast scanner; fall back to the json module.
            return _load_edges_python(graph_path, index_map)
        try:
            n = lib.jg_edges_len(edges)
            missing = lib.jg_edges_missing(edges)
            if missing:
                raise KeyError(
                    f"{missing} edges reference ids absent from "
                    f"tracks.json/collections.json in {graph_path}")
            src = np.empty(n, dtype=np.int32)
            dst = np.empty(n, dtype=np.int32)
            if n:
                lib.jg_edges_copy(
                    edges,
                    src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            return src, dst
        finally:
            lib.jg_edges_free(edges)
    finally:
        lib.jg_table_free(table)


def _load_edges_python(graph_path: str, index_map: Mapping[str, int]
                       ) -> tuple[np.ndarray, np.ndarray]:
    with open(graph_path, encoding="utf-8") as f:
        graph = json.load(f)
    edges = graph["edges"]
    src = np.fromiter((index_map[e["from"]] for e in edges),
                      dtype=np.int32, count=len(edges))
    dst = np.fromiter((index_map[e["to"]] for e in edges),
                      dtype=np.int32, count=len(edges))
    return src, dst


def native_available() -> bool:
    return _load_lib() is not None
