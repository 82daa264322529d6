"""Convert pretrained audio-embedder checkpoints to this framework's .npz.

Thin CLI over models/audio_embedders.py's shape-ordered state_dict
converters (torchopenl3 audio model / torchvggish -> our parameter
pytrees).  Run WHERE THE CHECKPOINT EXISTS (needs torch; no network use):

    python scripts/convert_audio_weights.py openl3 state_dict.pt openl3.npz
    python scripts/convert_audio_weights.py vggish vggish.pt vggish.npz

then pass the npz as `OpenL3(weights_path=...)` / `--feature-weights`.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=("openl3", "vggish"))
    ap.add_argument("src", help="torch checkpoint (.pt state_dict)")
    ap.add_argument("dst", help="output .npz")
    args = ap.parse_args()

    import torch

    from gcn_song_embeddings_tpu.models.audio_embedders import (
        convert_openl3,
        convert_vggish,
        save_weights,
    )

    # Plain state_dicts load under the safe weights_only unpickler; fall
    # back to full (arbitrary-code) unpickling only for pickled model
    # objects, which torch >= 2.6 rejects by default.
    try:
        sd = torch.load(args.src, map_location="cpu", weights_only=True)
    except Exception:
        print("note: not a plain state_dict — falling back to full "
              "unpickling (only convert checkpoints you trust)",
              file=sys.stderr)
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = (convert_openl3 if args.model == "openl3"
              else convert_vggish)(sd)
    save_weights(params, args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
