"""Fault tolerance: SIGKILL mid-training must leave a resumable state.

The reference's only recovery mechanism is resume-on-init from its
every-batch torch.save (pinsage_training.py:248-295) — with non-atomic
in-place writes, so a kill during the write corrupts the run.  This
framework writes atomic checkpoints (tmp + rename, utils/checkpoint.py);
this test hard-kills a training subprocess repeatedly at random points and
asserts a fresh trainer always resumes and completes.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

TRAIN_SNIPPET = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from gcn_song_embeddings_tpu.config import RunConfig, config_with_overrides
from gcn_song_embeddings_tpu.data import SongGraph
from gcn_song_embeddings_tpu.data.device import DeviceGraph
from gcn_song_embeddings_tpu.train.trainer import PinSageTrainer

ds, run_dir = sys.argv[1], sys.argv[2]
g = SongGraph(ds, features_file=ds + "/features.npy")
pos = g.load_positives(ds + "/positives.json")
cfg = config_with_overrides(RunConfig(run_name="ft"), {
    "train.epochs": 4, "train.batches_per_epoch": 8,
    "train.batch_size": 16, "train.checkpoint_every_batches": 2,
    "walk.n_hops": 50, "walk.batch_walkers": 256})
tr = PinSageTrainer(DeviceGraph.from_graph(g), g.n_items, g.features, pos,
                    cfg=cfg, base_run_dir=run_dir,
                    nbhds_path=ds + "/nb_ft.npz", log=True,
                    load_save=True, verbose=False)
print("START", tr.e, tr.b, flush=True)
tr.train()
print("DONE", tr.e, flush=True)
"""


def test_sigkill_resume(dataset_dir, tmp_path):
    run_dir = str(tmp_path / "runs")
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [os.getcwd()] + os.environ.get("PYTHONPATH", "").split(os.pathsep)))

    attempts = 0
    for attempt in range(12):
        attempts = attempt + 1
        proc = subprocess.Popen(
            [sys.executable, "-c", TRAIN_SNIPPET, dataset_dir, run_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True)
        if attempt < 3:
            # kill at staggered points (compile window, mid-train)
            time.sleep(4.0 + 2.5 * attempt)
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            continue
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out
        if "DONE 4" in out:
            break
    else:
        raise AssertionError("training never completed")

    # state resumable + final epoch recorded
    state = os.path.join(run_dir, "ft", "state.npz")
    assert os.path.isfile(state)
    with np.load(state) as z:
        assert float(z["__scalar__epochs_done"]) == 4
    # no leftover corrupt tmp file
    assert not os.path.isfile(state + ".tmp")
    # metrics rows only ever appended in whole chunks
    rows = [json.loads(line) for line in
            open(os.path.join(run_dir, "ft", "metrics.jsonl"))]
    assert len(rows) % 2 == 0  # chunk size 2
