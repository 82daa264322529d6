"""Convert pretrained audio-embedder checkpoints to this framework's .npz.

Thin CLI over models/audio_embedders.py's shape-ordered converters
(torchopenl3 audio model / torchvggish state_dicts, musicnn TF-1
checkpoints -> our parameter pytrees).  Run WHERE THE CHECKPOINT EXISTS
(openl3/vggish need torch; musicnn needs tensorflow only if `src` is a
raw checkpoint rather than an .npz of its variables; no network use):

    python scripts/convert_audio_weights.py openl3 state_dict.pt openl3.npz
    python scripts/convert_audio_weights.py vggish vggish.pt vggish.npz
    python scripts/convert_audio_weights.py musicnn MTT_musicnn/ musicnn.npz
    python scripts/convert_audio_weights.py musicnn tfvars.npz musicnn.npz

then pass the npz as `OpenL3(weights_path=...)` / `--feature-weights`.
For musicnn, `tfvars.npz` is the checkpoint's name->tensor map, e.g.::

    reader = tf.train.load_checkpoint("MTT_musicnn/")
    np.savez("tfvars.npz", **{n: reader.get_tensor(n)
             for n in reader.get_variable_to_shape_map()})
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load_tf_variables(src: str) -> dict:
    """musicnn sources: an .npz of name->tensor, or a TF checkpoint
    path/dir (needs tensorflow installed)."""
    import numpy as np

    if src.endswith(".npz"):
        with np.load(src) as z:
            return {k: z[k] for k in z.files}
    import tensorflow as tf  # only needed for raw checkpoints

    if os.path.isdir(src):
        src = tf.train.latest_checkpoint(src) or src
    reader = tf.train.load_checkpoint(src)
    return {n: reader.get_tensor(n)
            for n in reader.get_variable_to_shape_map()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=("openl3", "vggish", "musicnn"))
    ap.add_argument("src", help="torch .pt state_dict (openl3/vggish) or "
                                "TF checkpoint dir / variables .npz "
                                "(musicnn)")
    ap.add_argument("dst", help="output .npz")
    args = ap.parse_args()

    from gcn_song_embeddings_tpu.models.audio_embedders import (
        convert_musicnn,
        convert_openl3,
        convert_vggish,
        save_weights,
    )

    if args.model == "musicnn":
        save_weights(convert_musicnn(_load_tf_variables(args.src)), args.dst)
        print(f"wrote {args.dst}")
        return

    import torch

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
