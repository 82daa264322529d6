"""Format compatibility against the REAL reference artifacts.

The reference mount ships only dataset_micro/positives.json (5000 pairs of
Spotify id strings; everything else is a git-LFS pointer — SURVEY §4).
These tests consume that real file to prove on-disk format compatibility;
they skip when the mount is absent.
"""

import json
import os

import numpy as np
import pytest

REF_POSITIVES = "/root/reference/dataset_micro/positives.json"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_POSITIVES),
    reason="reference mount not available")


def test_load_real_reference_positives(tmp_path):
    """SongGraph.load_positives must parse the reference's real
    positives.json given a catalog covering its ids."""
    from gcn_song_embeddings_tpu.data import SongGraph

    with open(REF_POSITIVES, encoding="utf-8") as f:
        raw = json.load(f)
    ids = sorted({p["a"] for p in raw} | {p["b"] for p in raw})

    # synthesize the rest of the dataset around the real positives file
    ds = tmp_path / "ds"
    os.makedirs(ds)
    tracks = {tid: {"name": f"s{i}", "artist": "a"}
              for i, tid in enumerate(ids)}
    cols = {"c0": {"type": "playlist", "name": "p", "num_tracks": len(ids),
                   "ztracks": ids}}
    edges = []
    for tid in ids:
        edges.append({"from": tid, "to": "c0"})
        edges.append({"from": "c0", "to": tid})
    json.dump(tracks, open(ds / "tracks.json", "w"))
    json.dump(cols, open(ds / "collections.json", "w"))
    json.dump({"tracks": ids, "collections": ["c0"], "edges": edges},
              open(ds / "graph.json", "w"))
    import shutil

    shutil.copy(REF_POSITIVES, ds / "positives.json")

    g = SongGraph(str(ds))
    pos = g.load_positives(str(ds / "positives.json"))
    assert pos.shape == (5000, 2)
    # spot-check index mapping round-trips to the original string ids
    assert g.track_ids[pos[0, 0]] == raw[0]["a"]
    assert g.track_ids[pos[0, 1]] == raw[0]["b"]
    assert g.track_ids[pos[4999, 0]] == raw[4999]["a"]

    # seeded split must be reproducible on the real file
    tr1, te1 = g.load_positives_split(str(ds / "positives.json"))
    tr2, te2 = g.load_positives_split(str(ds / "positives.json"))
    np.testing.assert_array_equal(tr1, tr2)
    assert tr1.shape[0] == 3500 and te1.shape[0] == 1500
