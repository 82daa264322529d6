"""Audio feature extraction (reference generate_node_features.py).

Reference capabilities (SURVEY component #31): load/resample/pad 30s clips,
batched incremental per-model feature generation with skip lists, and
embedders OpenL3 (512-d), RandomFeatures(512), MFCC-40.

TPU-native re-design: the DSP path (mel spectrogram -> log -> DCT -> MFCC)
is jax on device — framing is a reshape, the mel projection and the DCT are
matmuls, so a batch of clips is three MXU ops (the reference loops librosa
per window on the host).  Audio IO is host-side: stdlib `wave` for .wav,
raw `.npy` waveforms, and mp3/ogg/flac/m4a via the native FFmpeg decoder
(native/audiodec.cc — librosa/torchaudio are not in this image).
The learned embedders (OpenL3/VGGish/MusicNN)
run as native JAX CNNs (models/audio_embedders.py) — pretrained weights
load from .npz (scripts/convert_audio_weights.py), random-init otherwise
with an UNTRAINED warning; precomputed vectors also remain consumable via
EmbLoader exactly like the reference (eval.py MODELS "OpenL3":
EmbLoader(...)).

Clip normalization matches the reference: resample to 16 kHz mono, cut/pad
to 480000 samples = 30 s (generate_node_features.py:26-77).
"""

from __future__ import annotations

import os
import sys
import wave

import numpy as np

SAMPLE_RATE = 16000
CLIP_SAMPLES = 480000  # 30 s (generate_node_features.py:40-77)


# ------------------------------------------------------------------ audio IO


def load_clip(path: str, sr: int = SAMPLE_RATE,
              n_samples: int = CLIP_SAMPLES) -> np.ndarray:
    """Load audio -> mono float32 [n_samples] at `sr` (cut/pad like
    generate_node_features.py:60-77).  .wav rides stdlib `wave` and .npy
    is a raw waveform assumed already at `sr`; every other extension
    (mp3/ogg/flac/m4a/...) decodes through the native FFmpeg binding
    (native/audiodec.cc), which also does the mono downmix and the
    resample to `sr` in C."""
    if path.endswith(".npy"):
        y = np.load(path).astype(np.float32)
        if y.ndim == 2:
            y = y.mean(axis=1)
    elif path.endswith(".wav"):
        with wave.open(path, "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
            y = np.frombuffer(raw, dtype=dtype).astype(np.float32)
            if width == 1:
                y = (y - 128.0) / 128.0
            else:
                y = y / float(np.iinfo(dtype).max)
            if w.getnchannels() > 1:
                y = y.reshape(-1, w.getnchannels()).mean(axis=1)
        if rate != sr:
            y = resample_linear(y, rate, sr)
    else:
        from gcn_song_embeddings_tpu.native import audiodec

        if not audiodec.native_available():
            raise ValueError(
                f"unsupported audio format: {path!r} — compressed clips "
                f"need the native decoder (make -C native, requires the "
                f"system FFmpeg dev libraries); alternatively convert "
                f"clips to .wav or raw .npy waveforms")
        y = audiodec.decode(path, sr)
    if y.shape[0] >= n_samples:
        return y[:n_samples]
    return np.pad(y, (0, n_samples - y.shape[0]))


def resample_linear(y: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (host-side, dependency-free)."""
    n_out = int(round(len(y) * sr_out / sr_in))
    x_out = np.linspace(0.0, len(y) - 1, n_out)
    return np.interp(x_out, np.arange(len(y)), y).astype(np.float32)


# ------------------------------------------------------- device DSP (jax)


def mel_filterbank(n_mels: int, n_fft: int, sr: int,
                   fmin: float = 0.0, fmax: float | None = None
                   ) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2 + 1] built exactly like
    torchaudio's `melscale_fbanks` defaults (HTK mel scale, norm=None):
    filters are triangles in CONTINUOUS frequency over the rfft bin centers
    `linspace(0, sr/2, n_fft//2 + 1)`, not snapped to integer bins.
    `fmin`/`fmax` bound the mel band edges (VGGish uses 125-7500 Hz)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmax = sr / 2 if fmax is None else fmax
    all_freqs = np.linspace(0.0, sr / 2, n_fft // 2 + 1)
    f_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                  n_mels + 2))
    f_diff = np.diff(f_pts)                              # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_bins, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]           # rising edge
    up = slopes[:, 2:] / f_diff[None, 1:]                # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))           # [n_bins, n_mels]
    return fb.T.astype(np.float32)


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default periodic=True;
    np.hanning is the symmetric variant)."""
    return np.hanning(n_fft + 1)[:-1].astype(np.float32)


def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_out, n_in]."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[0] *= np.sqrt(0.5)
    return mat.astype(np.float32)


def _mel_power(clips, fb, window, n_fft: int, hop: int,
               center: bool = False, power: float = 2.0):
    """Shared DSP core: [B, samples] -> [B, frames, n_mels] mel spectrum.

    Framing is a gather + reshape, the mel projection is one MXU einsum.
    `center=True` reflect-pads n_fft//2 each side (torchaudio's default
    framing), which also makes clips shorter than n_fft well-defined.
    `power=2.0` projects the power spectrum |fft|^2 (torchaudio default);
    `power=1.0` the magnitude |fft| (VGGish's mel_features convention).
    A `window` shorter than `n_fft` frames with the window's length and
    zero-pads each frame to `n_fft` before the rfft (VGGish: 400-sample
    Hann window, 512-point FFT)."""
    import jax.numpy as jnp

    win = window.shape[0]                                # frame length
    n = clips.shape[1]
    if center:
        clips = jnp.pad(clips, ((0, 0), (n_fft // 2, n_fft // 2)),
                        mode="reflect")
        n_frames = 1 + (n + 2 * (n_fft // 2) - win) // hop
    else:
        n_frames = 1 + (n - win) // hop
    if n_frames < 1:
        raise ValueError(
            f"clip too short: {n} samples < window={win} with center=False "
            f"(pad the clip, or use center=True framing)")
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(win)[None, :])
    frames = clips[:, idx] * window[None, None, :]       # [B, F, win]
    spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))
    if power != 1.0:
        spec = spec ** power
    return jnp.einsum("bfk,mk->bfm", spec, fb,
                      preferred_element_type=jnp.float32)


def _cached_fb_window(n_mels: int, n_fft: int, sr: int):
    """Device-resident (filterbank, hann window), cached by config —
    built once and kept on device, not rebuilt/re-uploaded per batched
    call (the MFCC Embedder likewise caches in __init__)."""
    import jax.numpy as jnp

    key = (n_mels, n_fft, sr)
    hit = _FB_CACHE.get(key)
    if hit is None:
        hit = (jnp.asarray(mel_filterbank(n_mels, n_fft, sr)),
               jnp.asarray(hann_window(n_fft)))
        _FB_CACHE[key] = hit
    return hit


_FB_CACHE: dict = {}


def _mfcc_batch_jax(clips, fb, dct, window, n_fft: int, hop: int,
                    n_mfcc: int):
    """[B, samples] -> [B, n_mfcc] mean-pooled MFCCs, all on device."""
    import jax.numpy as jnp

    mel = _mel_power(clips, fb, window, n_fft, hop)      # [B, F, n_mels]
    logmel = jnp.log(mel + 1e-10)
    mfcc = jnp.einsum("bfm,cm->bfc", logmel, dct,
                      preferred_element_type=jnp.float32)
    return mfcc.mean(axis=1)                             # [B, n_mfcc]


def melspectrogram(clips: np.ndarray, sr: int = SAMPLE_RATE,
                   n_mels: int = 64, n_fft: int = 1024,
                   hop: int = 512, center: bool = True) -> np.ndarray:
    """[B, samples] -> [B, n_mels, frames] dB mel-spectrogram "images",
    min-max normalized to [0, 1] per clip.

    Capability of the reference's `get_melspec`
    (generate_node_features.py:33-38, 79-86: MelSpectrogram(n_fft=1024,
    hop=512, n_mels=64) → AmplitudeToDB → minmax); the defaults here match
    that SPECTROGRAM config, including torchaudio's center-padded framing
    and its un-clamped dB conversion (AmplitudeToDB top_db=None — padded
    silence stays at the amin floor and the minmax spreads over the full
    dynamic range, like the reference).  Framing, the mel projection, and
    dB all run on device as matmuls/elementwise (one einsum rides the MXU).
    """
    import jax.numpy as jnp

    clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
    fb, window = _cached_fb_window(n_mels, n_fft, sr)
    mel = _mel_power(jnp.asarray(clips), fb, window, n_fft, hop,
                     center=center)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.transpose(db, (0, 2, 1))                    # [B, mel, F]
    lo = db.min(axis=(1, 2), keepdims=True)
    hi = db.max(axis=(1, 2), keepdims=True)
    return np.asarray((db - lo) / jnp.maximum(hi - lo, 1e-12))


class Embedder:
    """Base feature embedder: `embed_batch(clips [B, samples]) -> [B, d]`."""

    name = "base"
    dim = 0

    def embed_batch(self, clips: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class RandomFeatures(Embedder):
    """Per-clip random features (reference RandomFeatures(512),
    generate_node_features.py:275-282) — deterministic per call order."""

    name = "random"

    def __init__(self, dim: int = 512, seed: int = 0):
        self.dim = dim
        self.rng = np.random.default_rng(seed)

    def embed_batch(self, clips: np.ndarray) -> np.ndarray:
        return self.rng.normal(size=(clips.shape[0], self.dim)
                               ).astype(np.float32)


class MFCC(Embedder):
    """Mean-pooled MFCCs (reference generate_features_mfcc,
    generate_node_features.py:285-314: MFCC-40 over the 30 s clip)."""

    name = "mfcc"

    def __init__(self, n_mfcc: int = 40, n_fft: int = 2048, hop: int = 512,
                 n_mels: int = 128, sr: int = SAMPLE_RATE):
        self.dim = n_mfcc
        self.n_mfcc = n_mfcc
        self.n_fft = n_fft
        self.hop = hop
        self._fb = mel_filterbank(n_mels, n_fft, sr)
        self._dct = dct_matrix(n_mfcc, n_mels)
        self._window = hann_window(n_fft)

    def embed_batch(self, clips: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        out = _mfcc_batch_jax(jnp.asarray(clips, dtype=jnp.float32),
                              jnp.asarray(self._fb),
                              jnp.asarray(self._dct),
                              jnp.asarray(self._window),
                              self.n_fft, self.hop, self.n_mfcc)
        return np.asarray(out)


class OpenL3(Embedder):
    """L3-Net audio embedder (reference: torchopenl3 mel128/music/512-d,
    1 s windows hop 2 s, mean-pooled — generate_node_features.py:209-229).

    The architecture runs natively as a JAX CNN
    (models/audio_embedders.py); `weights_path` restores pretrained
    parameters from an .npz converted offline from the official release
    (no network egress here).  Without it the network is seeded
    random-init — the pipeline runs end-to-end but features are untrained
    projections (a one-time warning says so); precomputed OpenL3 vectors
    remain consumable via EmbLoader."""

    name = "openl3"
    dim = 512

    def __init__(self, weights_path: str | None = None, seed: int = 0,
                 window_s: float = 1.0, hop_s: float = 2.0,
                 clips_per_chunk: int = 8):
        from gcn_song_embeddings_tpu.models import audio_embedders as ae

        self._ae = ae
        self.window_s, self.hop_s = window_s, hop_s
        self.clips_per_chunk = clips_per_chunk
        if weights_path:
            self.params = ae.load_weights(weights_path)
        else:
            self.params = ae.init_openl3(seed)
            ae.warn_untrained("OpenL3")

    def embed_batch(self, clips: np.ndarray) -> np.ndarray:
        # Chunk at the CLIP level: a 30 s clip expands to 15 windows whose
        # first-conv activations alone are ~6.5 MB x 64 ch each — running
        # generate_features' 512-clip batches through one forward would
        # need tens of GB.  8 clips/chunk keeps peak activations ~1 GB.
        ae = self._ae
        clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
        if clips.shape[0] == 0:
            return np.zeros((0, self.dim), np.float32)
        out = []
        for s in range(0, clips.shape[0], self.clips_per_chunk):
            wins, n_win = ae.openl3_mel_windows(
                clips[s:s + self.clips_per_chunk],
                window_s=self.window_s, hop_s=self.hop_s)
            emb = np.asarray(ae.openl3_forward(self.params, wins, self.dim))
            out.append(emb.reshape(-1, n_win, self.dim).mean(axis=1))
        return np.concatenate(out, axis=0)


class VGGish(Embedder):
    """Google AudioSet VGGish audio embedder (128-d).  Native JAX CNN
    (models/audio_embedders.py) over 0.96 s log-mel patches, mean-pooled;
    `weights_path` restores a converted official checkpoint, else seeded
    random-init with a one-time untrained warning.

    NAMING DIVERGENCE vs the reference (ADVICE r1): the reference's
    commented-out `Vggish2` class (generate_node_features.py:232-248) is
    musicnn's MTT_vgg pool5 extractor (per-frame 256-d), NOT AudioSet
    VGGish — so reference-precomputed `features_vggish2` directories have
    different semantics/dims from this model's output.  This native model
    is therefore named `vggish` (features land in `features_vggish/`);
    reference `features_vggish2` artifacts stay consumable via EmbLoader
    under their own name and are never silently mixed with native ones."""

    name = "vggish"
    dim = 128

    def __init__(self, weights_path: str | None = None, seed: int = 0,
                 clips_per_chunk: int = 16):
        from gcn_song_embeddings_tpu.models import audio_embedders as ae

        self._ae = ae
        self.clips_per_chunk = clips_per_chunk
        if weights_path:
            self.params = ae.load_weights(weights_path)
        else:
            self.params = ae.init_vggish(seed)
            ae.warn_untrained("VGGish")

    def embed_batch(self, clips: np.ndarray) -> np.ndarray:
        # Clip-level chunking for the same reason as OpenL3.embed_batch:
        # 30 s -> 31 patches/clip; bound peak conv activations.
        ae = self._ae
        clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
        if clips.shape[0] == 0:
            return np.zeros((0, self.dim), np.float32)
        out = []
        for s in range(0, clips.shape[0], self.clips_per_chunk):
            patches, n_p = ae.vggish_log_mel_patches(
                clips[s:s + self.clips_per_chunk])
            emb = np.asarray(ae.vggish_forward(self.params, patches))
            out.append(emb.reshape(-1, n_p, self.dim).mean(axis=1))
        return np.concatenate(out, axis=0)


class MusicNN(Embedder):
    """MTT_musicnn audio embedder (reference
    generate_node_features.py:251-271, commented out): timbral (mel-span)
    + temporal (envelope) front-end convolutions, residual midend, over
    3 s log-mel patches, mean-pooled across patches
    (models/audio_embedders.py).  `weights_path` restores an .npz; else
    seeded random-init with a one-time untrained warning.

    `feature` selects the extractor tap, matching musicnn's feature dict:
    'max_pool' (753-d, the reference's choice —
    generate_node_features.py:266-268), 'mean_pool' (753-d), or
    'penultimate' (200-d, the alternative the reference comments at
    :267)."""

    name = "musicnn"

    def __init__(self, weights_path: str | None = None, seed: int = 0,
                 clips_per_chunk: int = 16, feature: str = "max_pool"):
        from gcn_song_embeddings_tpu.models import audio_embedders as ae

        self._ae = ae
        self.clips_per_chunk = clips_per_chunk
        self.feature = feature
        self.dim = {"max_pool": ae.MUSICNN_POOL,
                    "mean_pool": ae.MUSICNN_POOL,
                    "penultimate": ae.MUSICNN_PENULT}[feature]
        if weights_path:
            self.params = ae.load_weights(weights_path)
        else:
            self.params = ae.init_musicnn(seed)
            ae.warn_untrained("MusicNN")

    def embed_batch(self, clips: np.ndarray) -> np.ndarray:
        ae = self._ae
        clips = np.atleast_2d(np.asarray(clips, dtype=np.float32))
        if clips.shape[0] == 0:
            return np.zeros((0, self.dim), np.float32)
        out = []
        for s in range(0, clips.shape[0], self.clips_per_chunk):
            patches, n_p = ae.musicnn_log_mel_patches(
                clips[s:s + self.clips_per_chunk])
            emb = np.asarray(ae.musicnn_forward(self.params, patches,
                                                feature=self.feature))
            out.append(emb.reshape(-1, n_p, self.dim).mean(axis=1))
        return np.concatenate(out, axis=0)


def generate_features(dataset_dir: str, embedder: Embedder,
                      clip_dir: str | None = None, batch_size: int = 512,
                      out_dir: str | None = None,
                      verbose: bool = True) -> str:
    """Batched incremental feature generation with per-track skip
    (reference generate_features, generate_node_features.py:88-203):
    writes `<dataset>/features_<name>/<track_id>.npy` per track and a
    consolidated `features_<name>.npy` matrix.

    Tracks without a decodable clip get zeros (the reference skips and
    retries; with no network, zero-fill keeps shapes rectangular)."""
    import json

    with open(os.path.join(dataset_dir, "tracks.json"), encoding="utf-8") as f:
        tracks = list(json.load(f))
    clip_dir = clip_dir or os.path.join(dataset_dir, "clips")
    out_dir = out_dir or os.path.join(dataset_dir,
                                      f"features_{embedder.name}")
    os.makedirs(out_dir, exist_ok=True)

    todo = [t for t in tracks
            if not os.path.isfile(os.path.join(out_dir, t + ".npy"))]
    for start in range(0, len(todo), batch_size):
        batch_ids = todo[start:start + batch_size]
        clips = np.zeros((len(batch_ids), CLIP_SAMPLES), dtype=np.float32)
        for i, tid in enumerate(batch_ids):
            for ext in (".wav", ".npy"):
                p = os.path.join(clip_dir, tid + ext)
                if os.path.isfile(p):
                    clips[i] = load_clip(p)
                    break
        vecs = embedder.embed_batch(clips)
        for i, tid in enumerate(batch_ids):
            np.save(os.path.join(out_dir, tid + ".npy"), vecs[i])
        if verbose:
            print(f"features: {min(start + batch_size, len(todo))}"
                  f"/{len(todo)} done", file=sys.stderr)

    # consolidated matrix in tracks.json order
    mat = np.stack([np.load(os.path.join(out_dir, t + ".npy"))
                    for t in tracks])
    np.save(os.path.join(dataset_dir, f"features_{embedder.name}.npy"), mat)
    return out_dir
