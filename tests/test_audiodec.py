"""Native audio decoding (round-2 VERDICT item 7).

The reference featurizes a `clips/` directory of mp3 previews
(generate_node_features.py:60-77, librosa/torchaudio).  Here mp3 (and any
FFmpeg-supported format) decodes through native/audiodec.cc; these tests
synthesize REAL mp3 files offline via the same library's libmp3lame
encoder and verify the decode path end-to-end into the feature pipeline.
"""

import os

import numpy as np
import pytest

from gcn_song_embeddings_tpu.native import audiodec

pytestmark = pytest.mark.skipif(
    not audiodec.native_available(),
    reason="libaudiodec.so not built (make -C native, needs FFmpeg libs)")


def _sine(freq: float, seconds: float, sr: int) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _peak_freq(y: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return float(np.fft.rfftfreq(len(y), 1.0 / sr)[spec.argmax()])


def test_mp3_roundtrip_spectral(tmp_path):
    sr = 44_100
    y = _sine(440.0, 2.0, sr)
    path = str(tmp_path / "tone.mp3")
    audiodec.encode_mp3(path, y, sr)
    assert os.path.getsize(path) > 1000

    # decode at a DIFFERENT rate: the native path also resamples
    d = audiodec.decode(path, 16_000)
    assert d.dtype == np.float32
    # gapless trim: length within 5% of the true duration
    assert abs(len(d) - 2 * 16_000) < 0.05 * 2 * 16_000
    assert _peak_freq(d, 16_000) == pytest.approx(440.0, abs=2.0)
    # amplitude survives (mp3 is lossy; rms of a 0.5 sine is 0.3536)
    assert np.sqrt((d ** 2).mean()) == pytest.approx(0.354, abs=0.03)

    # decode at the native rate too
    d2 = audiodec.decode(path, sr)
    assert abs(len(d2) - len(y)) < 0.05 * len(y)
    assert _peak_freq(d2, sr) == pytest.approx(440.0, abs=2.0)


def test_mp3_stereo_downmix(tmp_path):
    """Multi-channel sources downmix to mono (the C path, not Python)."""
    # encoder entry point is mono; synthesize stereo via a wav instead
    import wave

    sr = 22_050
    left = _sine(330.0, 1.0, sr)
    right = _sine(330.0, 1.0, sr)
    inter = np.empty(2 * len(left), np.float32)
    inter[0::2], inter[1::2] = left, right
    wav_path = str(tmp_path / "stereo.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((inter * 32767).astype(np.int16).tobytes())
    d = audiodec.decode(wav_path, sr)  # decoder handles wav too
    assert abs(len(d) - sr) <= 2
    assert _peak_freq(d, sr) == pytest.approx(330.0, abs=2.0)


def test_load_clip_mp3_and_pipeline(tmp_path):
    """features.load_clip consumes .mp3 and the MFCC embedder runs on it
    — a reference-format clips/ directory is fully featurizable."""
    from gcn_song_embeddings_tpu.features import (
        CLIP_SAMPLES,
        MFCC,
        SAMPLE_RATE,
        load_clip,
    )

    sr = 32_000
    path = str(tmp_path / "clip0.mp3")
    audiodec.encode_mp3(path, _sine(523.25, 3.0, sr), sr)
    y = load_clip(path)
    assert y.shape == (CLIP_SAMPLES,) and y.dtype == np.float32
    # first 3 s carry the tone, the pad is silent
    assert np.abs(y[: 2 * SAMPLE_RATE]).max() > 0.2
    assert np.abs(y[-SAMPLE_RATE:]).max() == 0.0
    assert _peak_freq(y[: 2 * SAMPLE_RATE], SAMPLE_RATE) == \
        pytest.approx(523.25, abs=3.0)

    feats = MFCC(n_mfcc=20).embed_batch(y[None, :])
    assert feats.shape == (1, 20) and np.isfinite(feats).all()


def test_decode_error_paths(tmp_path):
    bad = tmp_path / "not_audio.mp3"
    bad.write_bytes(b"this is not an mp3 file at all" * 10)
    with pytest.raises(ValueError, match="decode failed"):
        audiodec.decode(str(bad), 16_000)
    with pytest.raises(ValueError):
        audiodec.decode(str(tmp_path / "missing.mp3"), 16_000)
