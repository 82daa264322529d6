"""Positive-pair generation (reference generate_positives.py and
generate_positives_lfm.py).

Three generators, all emitting the reference JSON format
``[{"a": track_id, "b": track_id}, ...]`` (SURVEY §7):

  * PPR-walk positives: random track paired with a random top-rank PPR
    neighbor from the precomputed neighborhood cache
    (generate_positives.py:13-45, max rank T=3).
  * Random positives (generate_positives.py:58-75).
  * LFM listening-event positives: scan an LFM-1b-style listening log,
    fuzzy-join (lowercased name/artist[, album]) to the track catalog, and
    pair ADJACENT same-user listens within a time window
    (generate_positives_lfm.py:17-152).  The reference's Δt filter is
    inverted relative to its own comment (SURVEY §7b.8: `delta_t < 3600:
    continue` KEEPS pairs over an hour apart); here the capability is
    implemented as stated — pairs closer than `max_delta_t` are kept.

    The LFM pipeline composes as:
        iter_lfm_events(LFM-1b_LEs.txt)      # id-coded rows
        -> resolve_lfm_names(rows, load_lfm_name_tables(lfm_dir))
        -> match_lfm_events_to_catalog(named_rows, tracks)
        -> generate_lfm_positives(matched)
    (LEs carry numeric ids; the reference resolves them through the
    LFM-1b_tracks/artists/albums sidecars before the catalog join.)
"""

from __future__ import annotations

import json
from typing import Iterable, Optional

import numpy as np


def generate_walk_positives(nbhds: tuple[np.ndarray, np.ndarray],
                            n_tracks: int, m: Optional[int] = None,
                            max_rank: int = 3, seed: int = 0,
                            out_path: Optional[str] = None) -> list[dict]:
    """`m` pairs (track, random PPR neighbor of rank < max_rank)
    (reference generate_positives_simple_walks, generate_positives.py:13-45,
    m defaults to 5x the track count)."""
    weights, nodes = nbhds
    m = m if m is not None else 5 * n_tracks
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_tracks, size=m)
    rank = rng.integers(0, max_rank, size=m)
    b = nodes[a, rank]
    valid = weights[a, rank] > 0  # skip empty neighborhoods
    pairs = [(int(x), int(y)) for x, y, v in zip(a, b, valid) if v]
    return _emit(pairs, out_path)


def generate_random_positives(n_tracks: int, m: int, seed: int = 0,
                              out_path: Optional[str] = None) -> list[dict]:
    """Uniform random pairs (generate_positives.py:58-75)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_tracks, size=m)
    b = rng.integers(0, n_tracks, size=m)
    pairs = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    return _emit(pairs, out_path)


def _emit(pairs: list[tuple[int, int]], out_path: Optional[str],
          index_to_id=None) -> list[dict]:
    if index_to_id is None:
        out = [{"a": a, "b": b} for a, b in pairs]
    else:
        out = [{"a": index_to_id[a], "b": index_to_id[b]} for a, b in pairs]
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(out, f)
    return out


def indices_to_id_pairs(pairs: list[dict], track_ids: list[str]
                        ) -> list[dict]:
    """Convert integer-index pairs to string-id pairs (reference stores
    string ids, generate_positives.py:38)."""
    return [{"a": track_ids[p["a"]], "b": track_ids[p["b"]]} for p in pairs]


# ------------------------------------------------------------------ LFM path


def lfm_track_key(name: str, artist: str, album: Optional[str] = None
                  ) -> tuple:
    """Lowercased join key (reference get_lfm_spotify_map,
    generate_positives_lfm.py:67-103)."""
    key = (name.strip().lower(), artist.strip().lower())
    if album is not None:
        key = key + (album.strip().lower(),)
    return key


def build_catalog_map(tracks: dict, use_album: bool = False
                      ) -> dict[tuple, str]:
    """{(name, artist[, album]): track_id} from a tracks.json dict."""
    out: dict[tuple, str] = {}
    for tid, info in tracks.items():
        key = lfm_track_key(info.get("name", ""), info.get("artist", ""),
                            info.get("album") if use_album else None)
        out.setdefault(key, tid)
    return out


def iter_lfm_events(path: str, chunk_rows: int = 1_000_000,
                    sample_every: int = 1, skip_chunks: int = 0
                    ) -> Iterable[np.ndarray]:
    """Stream an LFM-1b listening-events TSV
    (user_id, artist_id, album_id, track_id, timestamp) in chunks
    (reference get_lfm_triplets samples ~2% of chunks past #5000,
    generate_positives_lfm.py:33-45 — here sampling is explicit via
    `sample_every` / `skip_chunks`)."""
    import pandas as pd

    reader = pd.read_csv(path, sep="\t", header=None, chunksize=chunk_rows,
                         on_bad_lines="skip")
    for i, chunk in enumerate(reader):
        if i < skip_chunks or (i - skip_chunks) % sample_every:
            continue
        yield chunk.to_numpy()


def load_lfm_name_tables(lfm_dir: str) -> tuple[dict, dict, dict]:
    """id -> name maps from the LFM-1b sidecar files
    LFM-1b_tracks.txt / _artists.txt / _albums.txt (TSV; reference
    get_lfm_triplets loads the same three tables,
    generate_positives_lfm.py:22-28).  Returns
    (track_names, artist_names, album_names)."""
    import os

    import pandas as pd

    tr = pd.read_csv(os.path.join(lfm_dir, "LFM-1b_tracks.txt"), sep="\t",
                     header=None, names=("id", "name", "artist_id"),
                     index_col=0, on_bad_lines="skip")
    ar = pd.read_csv(os.path.join(lfm_dir, "LFM-1b_artists.txt"), sep="\t",
                     header=None, names=("id", "name"), index_col=0,
                     on_bad_lines="skip")
    al = pd.read_csv(os.path.join(lfm_dir, "LFM-1b_albums.txt"), sep="\t",
                     header=None, names=("id", "name", "artist_id"),
                     index_col=0, on_bad_lines="skip")
    return (tr["name"].to_dict(), ar["name"].to_dict(),
            al["name"].to_dict())


def resolve_lfm_names(raw_rows: Iterable,
                      name_tables: tuple[dict, dict, dict]
                      ) -> Iterable[tuple]:
    """Map id-coded listening-event rows (user_id, artist_id, album_id,
    track_id, timestamp — what `iter_lfm_events` yields from
    LFM-1b_LEs.txt) to name-coded rows (user_id, artist_name, album_name,
    track_name, timestamp) via the sidecar tables, dropping events whose
    ids are absent (the reference's try/except around the same lookup,
    generate_positives_lfm.py:48-57).  The output rows feed
    `match_lfm_events_to_catalog` with its default column layout."""
    track_names, artist_names, album_names = name_tables
    for row in raw_rows:
        tn = track_names.get(row[3])
        an = artist_names.get(row[1])
        if tn is None or an is None:
            continue
        yield (row[0], an, album_names.get(row[2], ""), tn, row[4])


def generate_lfm_positives(events: Iterable[tuple[int, str, float]],
                           max_delta_t: float = 3600.0,
                           out_path: Optional[str] = None) -> list[dict]:
    """Pairs of consecutively-listened tracks per user.

    `events` yields (user_id, track_id, timestamp) ALREADY matched to the
    catalog (use `build_catalog_map` for the name/artist join).  Adjacent
    same-user events become a pair when 0 < Δt <= max_delta_t and the two
    tracks differ (reference _generate_lfm_positives,
    generate_positives_lfm.py:109-152, with the Δt filter applied as the
    comment intends — see module docstring)."""
    pairs: list[tuple[str, str]] = []
    last_by_user: dict[int, tuple[str, float]] = {}
    for user, track, ts in events:
        prev = last_by_user.get(user)
        if prev is not None:
            prev_track, prev_ts = prev
            dt = ts - prev_ts
            if prev_track != track and 0 <= dt <= max_delta_t:
                pairs.append((prev_track, track))
        last_by_user[user] = (track, ts)
    out = [{"a": a, "b": b} for a, b in pairs]
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(out, f)
    return out


def match_lfm_events_to_catalog(raw_events: Iterable, tracks: dict,
                                name_col: int = 3, artist_col: int = 1,
                                user_col: int = 0, ts_col: int = 4
                                ) -> list[tuple[int, str, float]]:
    """Join raw (user, artist-name, ..., track-name, ts) event rows to the
    catalog by lowercased (name, artist)."""
    catalog = build_catalog_map(tracks)
    out = []
    for row in raw_events:
        key = lfm_track_key(str(row[name_col]), str(row[artist_col]))
        tid = catalog.get(key)
        if tid is not None:
            out.append((int(row[user_col]), tid, float(row[ts_col])))
    out.sort(key=lambda r: (r[0], r[2]))
    return out
