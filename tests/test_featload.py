"""Native feature-directory loader (native/featload.cc) vs the Python path.

The reference loads one .pt per track serially (spotify_graph.py:66-79);
parity here = identical stacked matrix from either loader, with .pt interop
and failure reporting."""

import os
import subprocess

import numpy as np
import pytest

from gcn_song_embeddings_tpu.data.graph import load_feature_dir
from gcn_song_embeddings_tpu.native import featload


@pytest.fixture(scope="module")
def built():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")],
                   check=True, capture_output=True)
    assert featload.native_available()


@pytest.fixture()
def feat_dir(tmp_path):
    rng = np.random.default_rng(0)
    ids, mat = [], []
    for i in range(37):
        tid = f"trk{i:03d}"
        vec = rng.normal(size=48)
        if i % 3 == 0:
            np.save(tmp_path / f"{tid}.npy", vec.astype(np.float32))
        elif i % 3 == 1:
            np.save(tmp_path / f"{tid}.npy", vec)  # float64 path
        else:
            import torch

            torch.save(torch.tensor(vec.astype(np.float32)),
                       tmp_path / f"{tid}.pt")
        ids.append(tid)
        mat.append(vec.astype(np.float32))
    return str(tmp_path), ids, np.stack(mat)


def test_native_matches_python(built, feat_dir):
    d, ids, expect = feat_dir
    out = featload.load_feature_rows(d, ids)
    np.testing.assert_allclose(out, expect, atol=1e-6)
    # the public entry point rides the same native path
    out2 = load_feature_dir(d, ids)
    np.testing.assert_allclose(out2, expect, atol=1e-6)


def test_missing_id_raises(built, feat_dir):
    d, ids, _ = feat_dir
    with pytest.raises(FileNotFoundError):
        featload.load_feature_rows(d, ids + ["nope"])


def test_corrupt_file_reported(built, tmp_path):
    np.save(tmp_path / "a.npy", np.zeros(8, dtype=np.float32))
    (tmp_path / "b.npy").write_bytes(b"not an npy file at all")
    with pytest.raises(ValueError, match="failed to load"):
        featload.load_feature_rows(str(tmp_path), ["a", "b"])


def test_dim_mismatch_reported(built, tmp_path):
    np.save(tmp_path / "a.npy", np.zeros(8, dtype=np.float32))
    np.save(tmp_path / "b.npy", np.zeros(9, dtype=np.float32))
    with pytest.raises(ValueError, match="failed to load"):
        featload.load_feature_rows(str(tmp_path), ["a", "b"])


def test_row_matrix_shape_accepted(built, tmp_path):
    """[1, d] rows (a common exporter shape) load like 1-D vectors."""
    np.save(tmp_path / "a.npy", np.arange(6, dtype=np.float32)[None, :])
    out = featload.load_feature_rows(str(tmp_path), ["a"])
    np.testing.assert_array_equal(out, np.arange(6, dtype=np.float32)[None])


def test_large_dir_throughput(built, tmp_path):
    """Smoke the chunked thread pool on a few thousand files."""
    rng = np.random.default_rng(1)
    ids = []
    for i in range(3000):
        tid = f"t{i:05d}"
        np.save(tmp_path / f"{tid}.npy",
                rng.normal(size=16).astype(np.float32))
        ids.append(tid)
    out = featload.load_feature_rows(str(tmp_path), ids)
    assert out.shape == (3000, 16)
    assert np.isfinite(out).all() and (np.abs(out).sum(axis=1) > 0).all()


def test_big_endian_npy_falls_back_to_numpy(tmp_path):
    """'>f4' files are rejected by the C reader (it would byte-swap
    garbage) and rescued by the np.load fallback, which converts."""
    import warnings

    from gcn_song_embeddings_tpu.native.featload import load_feature_rows

    want = np.arange(8, dtype=np.float32)
    np.save(tmp_path / "a.npy", want)
    np.save(tmp_path / "b.npy", want.astype(">f4"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = load_feature_rows(str(tmp_path), ["a", "b"])
    np.testing.assert_array_equal(out[0], want)
    np.testing.assert_array_equal(out[1], want)
