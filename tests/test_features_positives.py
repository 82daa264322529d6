"""Feature-extraction and positives-generation tests."""

import json
import os
import wave

import numpy as np
import pytest

from gcn_song_embeddings_tpu import features as F
from gcn_song_embeddings_tpu.data.positives import (
    build_catalog_map,
    generate_lfm_positives,
    generate_random_positives,
    generate_walk_positives,
    indices_to_id_pairs,
    match_lfm_events_to_catalog,
)


def _write_wav(path, y, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y * 32767).astype(np.int16).tobytes())


def test_load_clip_wav_cut_pad(tmp_path):
    sr = 16000
    y = np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_wav(p, y, sr)
    clip = F.load_clip(str(p))
    assert clip.shape == (F.CLIP_SAMPLES,)
    np.testing.assert_allclose(clip[:sr], y, atol=1e-3)  # int16 quantization
    assert np.all(clip[sr:] == 0)  # zero-padded


def test_load_clip_resample(tmp_path):
    sr_in = 8000
    y = np.sin(np.linspace(0, 100 * 2 * np.pi, sr_in)).astype(np.float32)
    p = tmp_path / "b.wav"
    _write_wav(p, y, sr_in)
    clip = F.load_clip(str(p))
    # 1 s of audio at 8 kHz -> 2 s worth? no: still 1 s, resampled to 16 kHz
    assert np.abs(clip[:16000]).mean() > 0.1
    assert np.all(clip[16000 + 10:] == 0)


def test_mfcc_distinguishes_tones():
    """MFCCs of different tones must differ; same tone must match."""
    sr = F.SAMPLE_RATE
    t = np.arange(F.CLIP_SAMPLES) / sr
    a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    b = np.sin(2 * np.pi * 1760 * t).astype(np.float32)
    m = F.MFCC(n_mfcc=20)
    out = m.embed_batch(np.stack([a, b, a]))
    assert out.shape == (3, 20)
    np.testing.assert_allclose(out[0], out[2], atol=1e-4)
    assert np.abs(out[0] - out[1]).max() > 0.1


def test_generate_features_pipeline(tmp_path):
    """Incremental per-track generation + consolidated matrix
    (reference generate_features skip-list semantics)."""
    ds = tmp_path / "ds"
    os.makedirs(ds / "clips")
    tracks = {f"t{i}": {"name": f"s{i}", "artist": "a"} for i in range(5)}
    with open(ds / "tracks.json", "w") as f:
        json.dump(tracks, f)
    sr = F.SAMPLE_RATE
    for i in range(5):
        y = np.sin(np.linspace(0, (i + 1) * 500, sr)).astype(np.float32)
        _write_wav(ds / "clips" / f"t{i}.wav", y, sr)

    out_dir = F.generate_features(str(ds), F.MFCC(n_mfcc=8), verbose=False)
    mat = np.load(ds / "features_mfcc.npy")
    assert mat.shape == (5, 8)

    # skip-list: overwrite one per-track file, regenerate -> not recomputed
    marker = np.full(8, 99.0, dtype=np.float32)
    np.save(os.path.join(out_dir, "t3.npy"), marker)
    F.generate_features(str(ds), F.MFCC(n_mfcc=8), verbose=False)
    np.testing.assert_array_equal(
        np.load(os.path.join(out_dir, "t3.npy")), marker)


def test_random_features_deterministic_dim():
    r = F.RandomFeatures(dim=32, seed=1)
    out = r.embed_batch(np.zeros((4, 100)))
    assert out.shape == (4, 32)


def test_openl3_native_network(tmp_path):
    """OpenL3 runs as a native JAX CNN: correct shapes, deterministic by
    seed, weight save/load roundtrip, window framing (1 s / hop 2 s)."""
    from gcn_song_embeddings_tpu.models import audio_embedders as ae

    sr = F.SAMPLE_RATE
    t = np.arange(3 * sr) / sr                       # 3 s -> 2 windows
    clips = np.stack([np.sin(2 * np.pi * 440 * t),
                      np.sin(2 * np.pi * 1760 * t)]).astype(np.float32)

    wins, n_win = ae.openl3_mel_windows(clips)
    assert n_win == 2 and wins.shape == (4, 128, 199)

    m = F.OpenL3(seed=1)
    emb = m.embed_batch(clips)
    assert emb.shape == (2, 512) and np.isfinite(emb).all()
    # different tones separate even with random-init weights
    assert not np.allclose(emb[0], emb[1])
    # deterministic by seed
    np.testing.assert_array_equal(emb, F.OpenL3(seed=1).embed_batch(clips))
    assert not np.allclose(emb, F.OpenL3(seed=2).embed_batch(clips))

    # weights artifact roundtrip
    path = str(tmp_path / "openl3.npz")
    ae.save_weights(m.params, path)
    emb2 = F.OpenL3(weights_path=path).embed_batch(clips)
    np.testing.assert_allclose(emb, emb2, rtol=1e-6)


def test_vggish_native_network():
    from gcn_song_embeddings_tpu.models import audio_embedders as ae

    sr = F.SAMPLE_RATE
    t = np.arange(2 * sr) / sr                       # 2 s -> 2 patches
    clips = np.sin(2 * np.pi * 440 * t)[None].astype(np.float32)

    patches, n_p = ae.vggish_log_mel_patches(clips)
    assert n_p == 2 and patches.shape == (2, 96, 64)

    emb = F.VGGish(seed=0).embed_batch(clips)
    assert emb.shape == (1, 128) and np.isfinite(emb).all()
    np.testing.assert_array_equal(emb, F.VGGish(seed=0).embed_batch(clips))


# ------------------------------------------------------------- positives


def test_walk_positives(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    nodes = rng.integers(0, n, (n, 10)).astype(np.int32)
    weights = np.sort(rng.random((n, 10)).astype(np.float32), 1)[:, ::-1]
    out = tmp_path / "pos.json"
    pairs = generate_walk_positives((weights, nodes), n, m=200, max_rank=3,
                                    out_path=str(out))
    assert 0 < len(pairs) <= 200
    for p in pairs:
        a, b = p["a"], p["b"]
        assert b in nodes[a, :3].tolist()  # rank < 3 (reference T=3)
    assert json.load(open(out)) == pairs

    ids = [f"tr{i}" for i in range(n)]
    sp = indices_to_id_pairs(pairs, ids)
    assert sp[0]["a"] == f"tr{pairs[0]['a']}"


def test_random_positives():
    pairs = generate_random_positives(100, 500, seed=1)
    assert all(p["a"] != p["b"] for p in pairs)


def test_lfm_positives_adjacency_and_dt():
    # user 1 listens a,b close together; b,c too far apart; user 2: d,e
    events = [
        (1, "a", 0.0), (1, "b", 100.0), (1, "c", 10000.0),
        (2, "d", 50.0), (2, "e", 60.0), (2, "e", 70.0),  # self-pair dropped
    ]
    pairs = generate_lfm_positives(events, max_delta_t=3600)
    got = {(p["a"], p["b"]) for p in pairs}
    assert got == {("a", "b"), ("d", "e")}


def test_lfm_catalog_matching():
    tracks = {
        "id1": {"name": "Song One", "artist": "The Band"},
        "id2": {"name": "Other", "artist": "Someone"},
    }
    cat = build_catalog_map(tracks)
    assert cat[("song one", "the band")] == "id1"
    raw = [
        (7, "The Band", "alb", "song ONE", 12.0),
        (7, "Nobody", "alb", "unknown", 13.0),
        (7, "Someone", "alb", "Other", 14.0),
    ]
    matched = match_lfm_events_to_catalog(raw, tracks)
    assert [(u, t) for u, t, _ in matched] == [(7, "id1"), (7, "id2")]
    pairs = generate_lfm_positives(matched)
    assert pairs == [{"a": "id1", "b": "id2"}]


def test_melspectrogram_shape_range_and_tone():
    """dB+minmax mel 'image' (reference get_melspec capability): output in
    [0,1]; a pure tone concentrates energy in the matching mel band."""
    sr = F.SAMPLE_RATE
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)
    noise = np.random.default_rng(0).normal(size=sr).astype(np.float32)
    out = F.melspectrogram(np.stack([tone, noise]), n_mels=64)
    assert out.shape[0] == 2 and out.shape[1] == 64
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    # the tone's hottest mel band corresponds to ~1 kHz, i.e. not band 0
    # and not the top band, and its spectrum is peakier than noise
    band = out[0].mean(axis=1).argmax()
    assert 0 < band < 63
    peakiness = lambda m: m.mean(axis=1).max() / m.mean()
    assert peakiness(out[0]) > peakiness(out[1])


def test_melspectrogram_reference_config_and_short_clips():
    """Defaults mirror the reference SPECTROGRAM config
    (generate_node_features.py:33-38: n_fft=1024, hop=512, n_mels=64,
    torchaudio center-padded framing): a 30 s clip yields
    1 + 480000//512 = 938 frames; clips shorter than n_fft still work
    under centered framing; uncentered framing rejects them clearly."""
    import pytest

    clip = np.zeros((1, F.CLIP_SAMPLES), dtype=np.float32)
    clip[0, :100] = 1.0
    out = F.melspectrogram(clip)
    assert out.shape == (1, 64, 1 + F.CLIP_SAMPLES // 512)

    short = np.random.default_rng(1).normal(size=(2, 600)).astype(np.float32)
    out_s = F.melspectrogram(short)          # center=True handles < n_fft
    assert out_s.shape == (2, 64, 1 + 600 // 512)
    with pytest.raises(ValueError, match="too short"):
        F.melspectrogram(short, center=False)

    # config-keyed device cache: same objects returned on a repeat call
    fb1, w1 = F._cached_fb_window(64, 1024, F.SAMPLE_RATE)
    fb2, w2 = F._cached_fb_window(64, 1024, F.SAMPLE_RATE)
    assert fb1 is fb2 and w1 is w2


def test_hann_window_matches_torch_periodic():
    """torchaudio's MelSpectrogram uses torch.hann_window (periodic);
    np.hanning is symmetric — the difference is a systematic per-frame
    spectral bias, so pin parity against torch itself."""
    torch = pytest.importorskip("torch")

    for n in (16, 400, 1024):
        got = F.hann_window(n)
        want = torch.hann_window(n).numpy()
        np.testing.assert_allclose(got, want, atol=2e-7)


def test_mel_filterbank_torchaudio_construction():
    """melscale_fbanks-style construction: triangles in continuous
    frequency over the rfft bin grid (HTK scale, norm=None) — each filter
    is nonnegative, unimodal, and adjacent filters cross."""
    n_mels, n_fft, sr = 64, 1024, 16000
    fb = F.mel_filterbank(n_mels, n_fft, sr)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert fb.min() >= 0.0
    # unimodal: strictly rises to the peak then falls (within the support)
    for m in (0, 10, 40, 63):
        row = fb[m]
        sup = np.nonzero(row > 0)[0]
        assert sup.size > 0
        peak = row.argmax()
        assert np.all(np.diff(row[sup[0]:peak + 1]) >= -1e-7)
        assert np.all(np.diff(row[peak:sup[-1] + 1]) <= 1e-7)
    # full band coverage: every interior filter overlaps its neighbor
    for m in range(1, n_mels):
        assert np.any((fb[m - 1] > 0) & (fb[m] > 0))


def test_lfm_id_resolution_chain(tmp_path):
    """iter_lfm_events yields id-coded rows; resolve_lfm_names +
    match_lfm_events_to_catalog must compose into catalog track ids."""
    from gcn_song_embeddings_tpu.data.positives import (
        iter_lfm_events,
        load_lfm_name_tables,
        resolve_lfm_names,
    )

    (tmp_path / "LFM-1b_tracks.txt").write_text(
        "10\tSong One\t7\n11\tOther\t8\n")
    (tmp_path / "LFM-1b_artists.txt").write_text(
        "7\tThe Band\n8\tSomeone\n")
    (tmp_path / "LFM-1b_albums.txt").write_text("3\tAlb\t7\n")
    # LEs: user, artist-id, album-id, track-id, timestamp
    (tmp_path / "LFM-1b_LEs.txt").write_text(
        "1\t7\t3\t10\t100\n1\t8\t3\t11\t200\n1\t9\t3\t99\t300\n")

    tables = load_lfm_name_tables(str(tmp_path))
    rows = []
    for chunk in iter_lfm_events(str(tmp_path / "LFM-1b_LEs.txt")):
        rows.extend(chunk.tolist())
    named = list(resolve_lfm_names(rows, tables))
    assert named == [(1, "The Band", "Alb", "Song One", 100),
                     (1, "Someone", "Alb", "Other", 200)]  # id 99 dropped
    tracks = {"id1": {"name": "Song One", "artist": "The Band"},
              "id2": {"name": "Other", "artist": "Someone"}}
    matched = match_lfm_events_to_catalog(named, tracks)
    pairs = generate_lfm_positives(matched)
    assert pairs == [{"a": "id1", "b": "id2"}]


def test_checkpoint_conversion_torch_parity():
    """convert_openl3/convert_vggish map a torch state_dict onto our
    pytrees such that the JAX forward MATCHES the torch forward (eval
    mode) — validates conv OIHW->HWIO orientation, BN folding (keras eps
    1e-3), fc transposition, pooling, and the NHWC flatten convention
    (torchvggish transposes NCHW->NHWC before its flatten)."""
    torch = pytest.importorskip("torch")

    from gcn_song_embeddings_tpu.models import audio_embedders as ae

    torch.manual_seed(0)

    # --- OpenL3: torch mirror of the L3 audio subnetwork
    blocks = []
    layers = {}
    layers["bn_in"] = torch.nn.BatchNorm2d(1, eps=1e-3)
    cins = [1, 64, 128, 256]
    couts = [64, 128, 256, 512]
    mods = [("bn_in", layers["bn_in"])]
    for bi in range(4):
        c0 = torch.nn.Conv2d(cins[bi], couts[bi], 3, padding=1)
        b0 = torch.nn.BatchNorm2d(couts[bi], eps=1e-3)
        c1 = torch.nn.Conv2d(couts[bi], couts[bi], 3, padding=1)
        # the real net's final conv (audio_embedding_layer) has no BN
        b1 = torch.nn.BatchNorm2d(couts[bi], eps=1e-3) if bi < 3 else None
        blocks.append((c0, b0, c1, b1))
        mods += [(f"c{bi}0", c0), (f"bn{bi}0", b0), (f"c{bi}1", c1)]
        if b1 is not None:
            mods += [(f"bn{bi}1", b1)]
    model = torch.nn.Sequential()  # container to get an ordered state_dict
    for name, m in mods:
        model.add_module(name, m)
    model.eval()
    # randomize BN stats so folding is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.2)
            m.bias.data.normal_(0, 0.2)

    x = torch.randn(2, 1, 128, 199)
    with torch.no_grad():
        h = layers["bn_in"](x)
        for bi, (c0, b0, c1, b1) in enumerate(blocks):
            h = torch.relu(b0(c0(h)))
            h = c1(h)
            if bi < 3:
                h = torch.nn.functional.max_pool2d(torch.relu(b1(h)), 2)
        h = torch.nn.functional.max_pool2d(h, (16, 24))
        ref = h.reshape(2, -1).numpy()

    params = ae.convert_openl3(model.state_dict())
    got = np.asarray(ae.openl3_forward(params, x.numpy()[:, 0]))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # --- VGGish: torch mirror with torchvggish's NCHW->NHWC pre-flatten
    convs = [torch.nn.Conv2d(cin, cout, 3, padding=1)
             for cin, cout in ((1, 64), (64, 128), (128, 256), (256, 256),
                               (256, 512), (512, 512))]
    fcs = [torch.nn.Linear(6 * 4 * 512, 4096), torch.nn.Linear(4096, 4096),
           torch.nn.Linear(4096, 128)]
    vmodel = torch.nn.Sequential()
    for i, c in enumerate(convs):
        vmodel.add_module(f"conv{i}", c)
    for i, f in enumerate(fcs):
        vmodel.add_module(f"fc{i}", f)
    vmodel.eval()

    x = torch.randn(2, 1, 96, 64)
    with torch.no_grad():
        h = x
        ci = 0
        for group in ((0,), (1,), (2, 3), (4, 5)):
            for _ in group:
                h = torch.relu(convs[ci](h))
                ci += 1
            h = torch.nn.functional.max_pool2d(h, 2)
        h = h.permute(0, 2, 3, 1).contiguous().view(2, -1)  # NHWC flatten
        for f in fcs:
            h = torch.relu(f(h))
        vref = h.numpy()

    vparams = ae.convert_vggish(vmodel.state_dict())
    vgot = np.asarray(ae.vggish_forward(vparams, x.numpy()[:, 0]))
    np.testing.assert_allclose(vgot, vref, rtol=1e-4, atol=1e-4)


def test_musicnn_native_network(tmp_path):
    from gcn_song_embeddings_tpu.models import audio_embedders as ae

    sr = F.SAMPLE_RATE
    t = np.arange(6 * sr) / sr                       # 6 s -> 2 patches
    clips = np.stack([np.sin(2 * np.pi * 330 * t),
                      np.sin(2 * np.pi * 2640 * t)]).astype(np.float32)

    patches, n_p = ae.musicnn_log_mel_patches(clips)
    assert n_p == 2 and patches.shape == (4, 187, 96)

    m = F.MusicNN(seed=3)
    emb = m.embed_batch(clips)
    # default feature = 'max_pool', the reference's tap (753-d)
    assert emb.shape == (2, ae.MUSICNN_POOL) and np.isfinite(emb).all()
    pen = F.MusicNN(seed=3, feature="penultimate").embed_batch(clips)
    assert pen.shape == (2, ae.MUSICNN_PENULT) and np.isfinite(pen).all()
    assert not np.allclose(emb[0], emb[1])           # tones separate
    np.testing.assert_array_equal(emb, F.MusicNN(seed=3).embed_batch(clips))

    path = str(tmp_path / "musicnn.npz")
    ae.save_weights(m.params, path)
    np.testing.assert_allclose(
        emb, F.MusicNN(weights_path=path).embed_batch(clips), rtol=1e-6)
