"""(Re)generate the audio-embedder golden fixtures (tests/golden/).

For each native audio CNN (OpenL3 / VGGish / MusicNN) this pins, for a
deterministic seeded weight set and a deterministic synthetic clip, the
full frontend→forward embedding vector.  `tests/test_audio_golden.py`
replays the same computation and asserts near-equality, so ANY refactor
of the conv stacks, frontends, or BN folding that changes numerics is
caught — the offline-buildable half of pretrained-weight parity
(converted real checkpoints slot into the same code path via
load_weights; see README "Pretrained audio weights").

Run on CPU (fixtures are platform-pinned to CPU so CI reproduces them):

    JAX_PLATFORMS=cpu PYTHONPATH=.:/root/.axon_site \
        python scripts/make_audio_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gcn_song_embeddings_tpu.models import audio_embedders as ae  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def golden_clip(seconds: float = 3.1, sr: int = 22_050) -> np.ndarray:
    """Deterministic test clip: three harmonics + AM + seeded noise floor.

    Spectrally non-trivial (exercises mel bands across the range) and
    includes a near-silent leading segment (exercises the dB floors)."""
    t = np.arange(int(seconds * sr), dtype=np.float64) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)
         + 0.3 * np.sin(2 * np.pi * 880.0 * t)
         + 0.2 * np.sin(2 * np.pi * 3520.0 * t) * np.sin(2 * np.pi * 3.0 * t))
    x[: sr // 4] *= 1e-4                       # near-silent lead-in
    x += 1e-3 * np.random.default_rng(7).standard_normal(x.shape)
    return x.astype(np.float32)


def main() -> None:
    os.makedirs(GOLDEN, exist_ok=True)
    clip, sr = golden_clip(), 22_050

    out = {"clip_sha_first8": np.frombuffer(
        __import__("hashlib").sha256(clip.tobytes()).digest()[:8],
        dtype=np.uint8)}

    p = ae.init_openl3(seed=0)
    mel, n_win = ae.openl3_mel_windows(clip, sr=sr)
    out["openl3_mel"] = mel
    out["openl3_emb"] = np.asarray(ae.openl3_forward(p, mel))
    out["openl3_n_win"] = np.int64(n_win)

    p = ae.init_vggish(seed=0)
    patches, n_p = ae.vggish_log_mel_patches(clip, sr=sr)
    out["vggish_patches"] = patches
    out["vggish_emb"] = np.asarray(ae.vggish_forward(p, patches))
    out["vggish_n_patches"] = np.int64(n_p)

    p = ae.init_musicnn(seed=0)
    patches, n_p = ae.musicnn_log_mel_patches(clip, sr=sr)
    out["musicnn_patches"] = patches
    out["musicnn_emb"] = np.asarray(ae.musicnn_forward(p, patches))
    out["musicnn_n_patches"] = np.int64(n_p)

    path = os.path.join(GOLDEN, "audio_golden.npz")
    np.savez_compressed(path, **out)
    for k, v in out.items():
        v = np.asarray(v)
        print(f"{k}: shape {v.shape} "
              f"mean {float(v.astype(np.float64).mean()):.6g}")
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
