"""Subprocess worker for the 2-process multi-host test (not a test module).

Each process owns 4 virtual CPU devices; jax.distributed joins them into an
8-device global mesh (2 hosts x 4 devices — the XLA multi-process simulation
SURVEY §4 calls for).  Gloo backs the cross-process CPU collectives.

Usage: python multihost_worker.py <process_id> <port> <out_dir>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    proc_id, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.parallel.multihost import (
        initialize_multihost,
        make_global_mesh,
    )
    from gcn_song_embeddings_tpu.parallel.train_step import ShardedTrainer

    pid = initialize_multihost(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=proc_id)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = make_global_mesh(n_graph=2)
    rng = np.random.default_rng(0)  # same problem on every process
    n_items, feat_dim = 512, 64
    features = rng.normal(size=(n_items, feat_dim)).astype(np.float32)
    nb_n = rng.integers(0, n_items, size=(n_items, 16)).astype(np.int32)
    nb_w = np.sort(rng.random((n_items, 16)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    positives = rng.integers(0, n_items, size=(2048, 2)).astype(np.int32)

    cfg = config_with_overrides(RunConfig(run_name="mh"), {
        "model.in_dim": feat_dim, "model.hidden_dim": 64,
        "model.out_dim": 32, "train.batch_size": 32})
    tr = ShardedTrainer(mesh, cfg, n_items, features, (nb_w, nb_n),
                        positives)
    losses = tr.train_chunk(2)
    assert np.isfinite(losses).all(), losses
    emb = tr.embed(batch_size=256)
    assert emb.shape == (n_items, 32) and np.isfinite(emb).all()

    np.save(os.path.join(out_dir, f"emb_{pid}.npy"), emb)
    np.save(os.path.join(out_dir, f"losses_{pid}.npy"), losses)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
