"""Audio embedding networks (OpenL3 / VGGish / MusicNN) as functional JAX CNNs.

The reference consumes these as pip packages with downloaded pretrained
weights (torchopenl3 — generate_node_features.py:209-229; VGGish commented
out at :232-248).  This environment has no network egress, so instead of
wrapping a package we implement the ARCHITECTURES natively (conv stacks as
XLA convolutions, inference-mode batch norm folded to scale/shift) with:

  * `load_weights(path)` — restore parameters from an `.npz` (e.g. converted
    offline from the official releases; array names = pytree paths below);
  * seeded random initialization as the fallback, so the full feature
    pipeline (windowing -> mel frontend -> CNN -> pooling ->
    features_<name>/ artifacts) runs end-to-end and is testable — but the
    resulting features are UNTRAINED (structured random projections).  A
    one-time warning says so.

Shapes follow the published models:

  OpenL3 (L3-Net audio subnetwork, mel128 / music / 512-d):
    48 kHz, 1 s windows; mel spectrogram n_fft 2048, hop 242, 128 mels,
    center-padded -> [128, 199]; batch-norm on input; conv blocks
    [64,64] [128,128] [256,256] [512,512] (3x3 same + BN + ReLU) with 2x2
    max-pool between blocks -> [16, 24, 512]; final 16x24 max-pool ->
    512-d.  Windows mean-pooled (reference: 1 s windows, hop 2 s,
    generate_node_features.py:218-228).

  VGGish (AudioSet, 128-d):
    16 kHz, 0.96 s patches of 96 frames x 64 log-mel bands (25 ms window,
    10 ms hop, 125-7500 Hz, log(mel + 0.01)); convs 64, 128, 256x2, 512x2
    with 2x2 pools -> flatten -> fc 4096 x2 -> fc 128 (ReLU); patches
    mean-pooled.

  MusicNN (musically-motivated CNN, 200-d penultimate):
    16 kHz, 3 s patches of 187 frames x 96 log-mels; timbral (mel-span)
    and temporal (envelope) front-end filters, 3 residual 1-D midend
    convs, temporal mean+max pool -> dense 200; patches mean-pooled.
    (Structure per the musicnn paper; no converter is shipped for its TF
    checkpoints — weight-compat is best-effort via the .npz layout.)
"""

from __future__ import annotations

import sys
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gcn_song_embeddings_tpu.features import (
    SAMPLE_RATE,
    hann_window,
    mel_filterbank,
    resample_linear,
)


def _conv2d(x, w, b):
    """NHWC 3x3 'same' convolution + bias.  w: [kh, kw, cin, cout]."""
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x, size, strides=None):
    sh, sw = size
    st = strides or size
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, sh, sw, 1), (1, st[0], st[1], 1), "VALID")


def _bn_apply(x, p, eps: float = 1e-3):
    """Inference batch norm: (x - mean) / sqrt(var + eps) * gamma + beta."""
    inv = 1.0 / jnp.sqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _init_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = float(np.sqrt(2.0 / fan_in))
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), "float32") * std,
        "b": np.zeros((cout,), np.float32),
    }


def _init_bn(c):
    return {"gamma": np.ones((c,), np.float32),
            "beta": np.zeros((c,), np.float32),
            "mean": np.zeros((c,), np.float32),
            "var": np.ones((c,), np.float32)}


def _init_fc(key, din, dout):
    std = float(np.sqrt(2.0 / din))
    return {"w": jax.random.normal(key, (din, dout), "float32") * std,
            "b": np.zeros((dout,), np.float32)}


def _flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten_params(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def _unflatten_params(flat):
    tree: dict = {}
    for name, v in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


@lru_cache(maxsize=8)
def _cached_frontend(n_mels: int, n_fft: int, sr: int,
                     fmin: float = 0.0, fmax: float | None = None,
                     win_length: int | None = None,
                     periodic_window: bool = True):
    """Device-resident (filterbank, window) per frontend config — built
    once, not rebuilt/re-uploaded by every clip chunk (the chunked
    embed_batch loops call the frontend thousands of times per catalog).

    `periodic_window=False` selects the symmetric np.hanning variant
    (Google VGGish's mel_features.py frames with np.hanning(400); the
    torchaudio-convention paths keep the periodic window)."""
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sr, fmin=fmin,
                                    fmax=fmax))
    n_win = win_length or n_fft
    window = (jnp.asarray(hann_window(n_win)) if periodic_window
              else jnp.asarray(np.hanning(n_win).astype(np.float32)))
    return fb, window


def save_weights(params: dict, path: str) -> None:
    np.savez(path, **_flatten_params(params))


def load_weights(path: str) -> dict:
    with np.load(path) as z:
        return _unflatten_params({k: z[k] for k in z.files})


# ---------------------------------------------------------------- OpenL3

OPENL3_SR = 48_000
OPENL3_NFFT = 2048
OPENL3_HOP = 242
OPENL3_MELS = 128
OPENL3_FRAMES = 199  # 1 + floor(48000 / 242), center-padded
_L3_BLOCKS = ((1, 64), (64, 128), (128, 256), (256, 512))


def init_openl3(seed: int = 0, emb_dim: int = 512) -> dict:
    assert emb_dim in (512, 6144)
    keys = jax.random.split(jax.random.PRNGKey(seed), 9)
    p: dict = {"bn_in": _init_bn(1)}
    ki = 0
    for bi, (cin, cout) in enumerate(_L3_BLOCKS):
        p[f"block{bi}"] = {
            "conv0": _init_conv(keys[ki], 3, 3, cin, cout),
            "bn0": _init_bn(cout),
            "conv1": _init_conv(keys[ki + 1], 3, 3, cout, cout),
            "bn1": _init_bn(cout),
        }
        ki += 2
    return p


@partial(jax.jit, static_argnames=("emb_dim",))
def openl3_forward(params: dict, mel_db: jnp.ndarray, emb_dim: int = 512):
    """[B, 128, 199] mel-dB windows -> [B, emb_dim] embeddings."""
    x = mel_db[..., None]                                  # NHWC, C=1
    x = _bn_apply(x, params["bn_in"])
    for bi in range(4):
        blk = params[f"block{bi}"]
        x = jax.nn.relu(_bn_apply(_conv2d(x, blk["conv0"]["w"],
                                          blk["conv0"]["b"]), blk["bn0"]))
        x = jax.nn.relu(_bn_apply(_conv2d(x, blk["conv1"]["w"],
                                          blk["conv1"]["b"]), blk["bn1"]))
        if bi < 3:
            x = _maxpool(x, (2, 2))
    # x: [B, 16, 24, 512]
    pool = (16, 24) if emb_dim == 512 else (4, 8)
    x = _maxpool(x, pool)
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def openl3_mel_windows(clips: np.ndarray, sr: int = SAMPLE_RATE,
                       window_s: float = 1.0, hop_s: float = 2.0
                       ) -> tuple[np.ndarray, int]:
    """[B, samples]@sr -> ([B*W, 128, 199] mel-dB windows, W windows/clip).

    Resamples to 48 kHz and frames 1 s windows every `hop_s` seconds
    (reference torchopenl3 call: 1 s / hop 2 s,
    generate_node_features.py:218-228), then the OpenL3 mel frontend.
    """
    from gcn_song_embeddings_tpu.features import _mel_power

    clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
    if sr != OPENL3_SR:
        clips = np.stack([resample_linear(c, sr, OPENL3_SR) for c in clips])
    win = int(OPENL3_SR * window_s)
    hop = int(OPENL3_SR * hop_s)
    n = clips.shape[1]
    starts = list(range(0, max(n - win, 0) + 1, hop)) or [0]
    if clips.shape[1] < win:
        clips = np.pad(clips, ((0, 0), (0, win - n)))
    wins = np.stack([clips[:, s:s + win] for s in starts], axis=1)
    flat = wins.reshape(-1, win)
    fb, window = _cached_frontend(OPENL3_MELS, OPENL3_NFFT, OPENL3_SR)
    mel = _mel_power(jnp.asarray(flat), fb, window, OPENL3_NFFT,
                     OPENL3_HOP, center=True)           # [BW, F, mels]
    mel = jnp.transpose(mel, (0, 2, 1))[:, :, :OPENL3_FRAMES]
    if mel.shape[2] < OPENL3_FRAMES:
        mel = jnp.pad(mel, ((0, 0), (0, 0),
                            (0, OPENL3_FRAMES - mel.shape[2])))
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = db - db.max(axis=(1, 2), keepdims=True)        # ref=max dB scaling
    # kapre/openl3's amplitude_to_decibel applies an 80 dB dynamic-range
    # floor after ref-max scaling; without it silent frames reach ~-100 dB
    # and feed out-of-distribution inputs to bn_in under converted
    # pretrained weights (ADVICE r1).
    db = jnp.maximum(db, -80.0)
    return np.asarray(db), len(starts)


# ---------------------------------------------------------------- VGGish

VGGISH_SR = 16_000
VGGISH_MELS = 64
VGGISH_FRAMES = 96
_VGG_CONVS = ((1, 64), (64, 128), (128, 256), (256, 256), (256, 512),
              (512, 512))
_VGG_LAYOUT = ((0,), (1,), (2, 3), (4, 5))  # conv indices per pool group


def init_vggish(seed: int = 0) -> dict:
    keys = jax.random.split(jax.random.PRNGKey(seed), 9)
    p: dict = {}
    for i, (cin, cout) in enumerate(_VGG_CONVS):
        p[f"conv{i}"] = _init_conv(keys[i], 3, 3, cin, cout)
    p["fc0"] = _init_fc(keys[6], 6 * 4 * 512, 4096)
    p["fc1"] = _init_fc(keys[7], 4096, 4096)
    p["fc2"] = _init_fc(keys[8], 4096, 128)
    return p


@jax.jit
def vggish_forward(params: dict, log_mel: jnp.ndarray):
    """[B, 96, 64] log-mel patches -> [B, 128] embeddings."""
    x = log_mel[..., None]
    ci = 0
    for group in _VGG_LAYOUT:
        for _ in group:
            c = params[f"conv{ci}"]
            x = jax.nn.relu(_conv2d(x, c["w"], c["b"]))
            ci += 1
        x = _maxpool(x, (2, 2))
    x = x.reshape(x.shape[0], -1)                        # [B, 6*4*512]
    x = jax.nn.relu(x @ params["fc0"]["w"] + params["fc0"]["b"])
    x = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
    return x.astype(jnp.float32)


def vggish_log_mel_patches(clips: np.ndarray, sr: int = SAMPLE_RATE
                           ) -> tuple[np.ndarray, int]:
    """[B, samples]@sr -> ([B*P, 96, 64] log-mel patches, P patches/clip).

    VGGish frontend: 16 kHz, 25 ms window / 10 ms hop, 64 mel bands,
    log(mel + 0.01), non-overlapping 0.96 s patches.
    """
    from gcn_song_embeddings_tpu.features import _mel_power

    clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
    if sr != VGGISH_SR:
        clips = np.stack([resample_linear(c, sr, VGGISH_SR) for c in clips])
    # VGGish's mel_features convention: 25 ms (400-sample) SYMMETRIC Hann
    # window (np.hanning(400) in Google's mel_features.py — not the
    # periodic torchaudio variant), 10 ms hop, frames zero-padded to a
    # 512-point FFT (next power of 2), MAGNITUDE spectrogram (power=1)
    # through a 125-7500 Hz filterbank, then log(mel + 0.01).
    n_fft, win_length, hop = 512, 400, 160
    fb, window = _cached_frontend(VGGISH_MELS, n_fft, VGGISH_SR,
                                  fmin=125.0, fmax=7500.0,
                                  win_length=win_length,
                                  periodic_window=False)
    mel = _mel_power(jnp.asarray(clips), fb, window, n_fft, hop,
                     center=False, power=1.0)             # [B, F, 64]
    logmel = np.asarray(jnp.log(mel + 0.01))
    n_frames = logmel.shape[1]
    n_patches = max(n_frames // VGGISH_FRAMES, 1)
    if n_frames < VGGISH_FRAMES:
        logmel = np.pad(logmel,
                        ((0, 0), (0, VGGISH_FRAMES - n_frames), (0, 0)))
    patches = logmel[:, : n_patches * VGGISH_FRAMES].reshape(
        logmel.shape[0], n_patches, VGGISH_FRAMES, VGGISH_MELS)
    return patches.reshape(-1, VGGISH_FRAMES, VGGISH_MELS), n_patches


# ------------------------------------------------- checkpoint conversion
# Map a PyTorch state_dict (e.g. torchopenl3 audio model / torchvggish)
# onto the pytrees above.  Matching is by ORDERED KIND+SHAPE, not name:
# releases disagree on naming, but the architecture fixes the order of
# conv / batch-norm / fc tensors (torch conv OIHW -> HWIO, fc [out,in] ->
# [in,out]).  CLI wrapper: scripts/convert_audio_weights.py.

def _iter_source_tensors(state_dict):
    """Yield (name, np.ndarray) in insertion order, skipping buffers like
    num_batches_tracked."""
    for name, t in state_dict.items():
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                         else t)
        if arr.ndim == 0:            # e.g. num_batches_tracked
            continue
        yield name, arr


def collect_streams(state_dict, bn_names=("bn", "batchnorm", "batch_norm",
                                          "running_")):
    """Split a state_dict into ordered streams, pairing conv/fc weights
    with the 1-D bias that follows them and BN stats with their layer."""
    conv, fc, bn = [], [], []
    items = list(_iter_source_tensors(state_dict))
    i = 0
    while i < len(items):
        name, arr = items[i]
        low = name.lower()
        if arr.ndim == 4:                       # conv weight (+ maybe bias)
            w = arr.transpose(2, 3, 1, 0)
            b = None
            if i + 1 < len(items) and items[i + 1][1].ndim == 1 and \
                    "bias" in items[i + 1][0].lower() and \
                    items[i + 1][1].shape[0] == w.shape[3]:
                b = items[i + 1][1]
                i += 1
            conv.append((w, b))
        elif arr.ndim == 2:                     # fc weight (+ maybe bias)
            w = arr.T
            b = None
            if i + 1 < len(items) and items[i + 1][1].ndim == 1 and \
                    items[i + 1][1].shape[0] == w.shape[1]:
                b = items[i + 1][1]
                i += 1
            fc.append((w, b))
        elif arr.ndim == 1 and any(k in low for k in bn_names):
            # torch BN order: weight, bias, running_mean, running_var
            gamma = arr
            beta, mean, var = (items[i + 1][1], items[i + 2][1],
                               items[i + 3][1])
            i += 3
            bn.append({"gamma": gamma, "beta": beta,
                       "mean": mean, "var": var})
        i += 1
    return conv, fc, bn


def _fill_conv(slot, conv_stream):
    w, b = conv_stream.pop(0)
    assert w.shape == slot["w"].shape, (w.shape, slot["w"].shape)
    slot["w"] = w.astype(np.float32)
    if b is not None:
        slot["b"] = b.astype(np.float32)


def _fill_bn(slot, bn_stream):
    p = bn_stream.pop(0)
    for k in ("gamma", "beta", "mean", "var"):
        assert p[k].shape == slot[k].shape, (k, p[k].shape, slot[k].shape)
        slot[k] = p[k].astype(np.float32)


def convert_openl3(state_dict) -> dict:
    params = init_openl3()
    conv, _fc, bn = collect_streams(state_dict)
    assert len(conv) == 8, f"expected 8 convs, found {len(conv)}"
    assert len(bn) >= 9, f"expected >=9 BN layers, found {len(bn)}"
    _fill_bn(params["bn_in"], bn)
    for bi in range(4):
        blk = params[f"block{bi}"]
        _fill_conv(blk["conv0"], conv)
        _fill_bn(blk["bn0"], bn)
        _fill_conv(blk["conv1"], conv)
        _fill_bn(blk["bn1"], bn)
    return params


def convert_vggish(state_dict) -> dict:
    params = init_vggish()
    conv, fc, _bn = collect_streams(state_dict)
    assert len(conv) == 6, f"expected 6 convs, found {len(conv)}"
    assert len(fc) == 3, f"expected 3 fc layers, found {len(fc)}"
    for i in range(6):
        _fill_conv(params[f"conv{i}"], conv)
    for i in range(3):
        w, b = fc.pop(0)
        assert w.shape == params[f"fc{i}"]["w"].shape, \
            (w.shape, params[f"fc{i}"]["w"].shape)
        params[f"fc{i}"]["w"] = w.astype(np.float32)
        if b is not None:
            params[f"fc{i}"]["b"] = b.astype(np.float32)
    return params


_warned: set = set()


def warn_untrained(name: str) -> None:
    if name not in _warned:
        _warned.add(name)
        print(f"WARNING: {name} running with RANDOM-INIT weights — features "
              "are untrained structured projections. Pass weights_path= "
              "(npz from the official release) for real embeddings.",
              file=sys.stderr)


# ---------------------------------------------------------------- MusicNN

MUSICNN_SR = 16_000
MUSICNN_MELS = 96
MUSICNN_FRAMES = 187          # librosa.time_to_frames(3): 3s*16kHz/256
MUSICNN_DIM = 200             # penultimate dense layer width

# musically-motivated front-end (Pons & Serra, musicnn):
# timbral filters span 0.4 / 0.7 of the mel axis; temporal filters are
# 1-D convs over the mel-averaged energy envelope.
_MCNN_TIMBRAL = ((7, 38, 128), (7, 67, 128))      # (kt, kf, channels)
_MCNN_TEMPORAL = ((32, 32), (64, 32), (128, 32), (165, 32))  # (kt, ch)
_MCNN_MID_CH = 64


def init_musicnn(seed: int = 0) -> dict:
    keys = jax.random.split(jax.random.PRNGKey(seed), 12)
    p: dict = {"bn_in": _init_bn(1)}
    ki = 0
    for i, (kt, kf, ch) in enumerate(_MCNN_TIMBRAL):
        p[f"timbral{i}"] = {"conv": _init_conv(keys[ki], kt, kf, 1, ch),
                            "bn": _init_bn(ch)}
        ki += 1
    for i, (kt, ch) in enumerate(_MCNN_TEMPORAL):
        p[f"temporal{i}"] = {"conv": _init_conv(keys[ki], kt, 1, 1, ch),
                             "bn": _init_bn(ch)}
        ki += 1
    front_ch = (sum(c for _, _, c in _MCNN_TIMBRAL)
                + sum(c for _, c in _MCNN_TEMPORAL))
    p["mid0"] = {"conv": _init_conv(keys[ki], 7, 1, front_ch, _MCNN_MID_CH),
                 "bn": _init_bn(_MCNN_MID_CH)}
    p["mid1"] = {"conv": _init_conv(keys[ki + 1], 7, 1, _MCNN_MID_CH,
                                    _MCNN_MID_CH), "bn": _init_bn(_MCNN_MID_CH)}
    p["mid2"] = {"conv": _init_conv(keys[ki + 2], 7, 1, _MCNN_MID_CH,
                                    _MCNN_MID_CH), "bn": _init_bn(_MCNN_MID_CH)}
    back_in = 2 * (front_ch + 3 * _MCNN_MID_CH)   # mean+max temporal pool
    p["dense"] = _init_fc(keys[ki + 3], back_in, MUSICNN_DIM)
    p["bn_dense"] = _init_bn(MUSICNN_DIM)
    return p


@jax.jit
def musicnn_forward(params: dict, log_mel: jnp.ndarray):
    """[B, 187, 96] log-mel patches -> [B, 200] penultimate features.

    musicnn-style stack: timbral (2-D, mel-spanning) + temporal (1-D over
    the mel-mean envelope) front-end convolutions, each BN+ReLU and
    max-pooled over the remaining mel extent; 3 residual 1-D midend convs
    over the concatenated [frames, channels] map; temporal mean+max pool
    and a 200-d dense layer (the capability of the reference's commented
    MusicNN embedder, generate_node_features.py:251-271)."""
    x = log_mel[..., None]                               # [B, T, M, 1]
    x = _bn_apply(x, params["bn_in"])
    feats = []
    for i, (kt, kf, ch) in enumerate(_MCNN_TIMBRAL):
        blk = params[f"timbral{i}"]
        h = lax.conv_general_dilated(
            x, blk["conv"]["w"], (1, 1),
            padding=((kt // 2, kt // 2), (0, 0)),        # SAME in time only
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + blk["conv"]["b"]
        h = jax.nn.relu(_bn_apply(h, blk["bn"]))
        feats.append(h.max(axis=2))                      # pool mel -> [B,T,ch]
    env = x.mean(axis=2, keepdims=True)                  # [B, T, 1, 1]
    for i, (kt, ch) in enumerate(_MCNN_TEMPORAL):
        blk = params[f"temporal{i}"]
        h = lax.conv_general_dilated(
            env, blk["conv"]["w"], (1, 1),
            padding=((kt // 2, (kt - 1) // 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + blk["conv"]["b"]
        h = jax.nn.relu(_bn_apply(h, blk["bn"]))
        feats.append(h[:, :, 0, :])                      # [B, T, ch]
    front = jnp.concatenate(feats, axis=2)               # [B, T, 384]

    def mid(h, blk, residual):
        y = lax.conv_general_dilated(
            h[:, :, None, :], blk["conv"]["w"], (1, 1),
            padding=((3, 3), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + blk["conv"]["b"]
        y = jax.nn.relu(_bn_apply(y, blk["bn"]))[:, :, 0, :]
        return y + residual if residual is not None else y

    m0 = mid(front, params["mid0"], None)
    m1 = mid(m0, params["mid1"], m0)
    m2 = mid(m1, params["mid2"], m1)
    full = jnp.concatenate([front, m0, m1, m2], axis=2)  # [B, T, 576]
    pooled = jnp.concatenate([full.mean(axis=1), full.max(axis=1)], axis=1)
    out = pooled @ params["dense"]["w"] + params["dense"]["b"]
    return jax.nn.relu(_bn_apply(out, params["bn_dense"])).astype(jnp.float32)


def musicnn_log_mel_patches(clips: np.ndarray, sr: int = SAMPLE_RATE
                            ) -> tuple[np.ndarray, int]:
    """[B, samples]@sr -> ([B*P, 187, 96] log-mel patches, P patches/clip).

    musicnn frontend: 16 kHz, n_fft 512 / hop 256, 96 mel bands,
    log10(mel + 1e-6) (amin-floored), non-overlapping 3 s patches."""
    from gcn_song_embeddings_tpu.features import _mel_power

    clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
    if sr != MUSICNN_SR:
        clips = np.stack([resample_linear(c, sr, MUSICNN_SR) for c in clips])
    n_fft, hop = 512, 256
    fb, window = _cached_frontend(MUSICNN_MELS, n_fft, MUSICNN_SR)
    # center=True (librosa's default framing, which musicnn uses): a 3 s
    # clip yields 188 frames, so every full 3 s contributes one clean
    # 187-frame patch without zero-fill.
    mel = _mel_power(jnp.asarray(clips), fb, window, n_fft, hop,
                     center=True)
    logmel = np.asarray(jnp.log10(jnp.maximum(mel, 1e-10) + 1e-6))
    n_frames = logmel.shape[1]
    n_patches = max(n_frames // MUSICNN_FRAMES, 1)
    if n_frames < MUSICNN_FRAMES:
        logmel = np.pad(logmel,
                        ((0, 0), (0, MUSICNN_FRAMES - n_frames), (0, 0)))
    patches = logmel[:, : n_patches * MUSICNN_FRAMES].reshape(
        logmel.shape[0], n_patches, MUSICNN_FRAMES, MUSICNN_MELS)
    return patches.reshape(-1, MUSICNN_FRAMES, MUSICNN_MELS), n_patches
