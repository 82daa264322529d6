"""Subprocess worker for the multi-host tests (not a test module).

Each process owns `local_devices` virtual CPU devices; jax.distributed
joins `num_processes` of them into one global mesh (the XLA multi-process
simulation SURVEY §4 calls for).  Gloo backs the cross-process CPU
collectives.

Axis-to-network mapping rule (SURVEY §2.2): `jax.devices()` orders
devices process-major and `make_mesh` reshapes row-major to
(dp, graph), so with n_graph = local_devices each dp row is exactly one
process — `graph` (the table-gather/halo-exchange axis) stays INSIDE a
host where its collectives would ride ICI, while `dp` (one gradient
psum per step) spans hosts over DCN.  The 4-process matrix exercises
that mapping for real: dp=4 across processes, graph=2 within.

Usage: python multihost_worker.py <process_id> <num_processes>
           <local_devices> <n_graph> <port> <out_dir>
"""
import os
import sys

_LOCAL = sys.argv[3] if len(sys.argv) > 3 else "4"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_LOCAL}")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    proc_id, num_procs, local, n_graph = (int(sys.argv[1]),
                                          int(sys.argv[2]),
                                          int(sys.argv[3]),
                                          int(sys.argv[4]))
    port, out_dir = sys.argv[5], sys.argv[6]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from gcn_song_embeddings_tpu.config import (
        RunConfig,
        config_with_overrides,
    )
    from gcn_song_embeddings_tpu.data.device import DeviceGraph
    from gcn_song_embeddings_tpu.data.graph import _build_csr
    from gcn_song_embeddings_tpu.parallel.multihost import (
        initialize_multihost,
        make_global_mesh,
    )
    from gcn_song_embeddings_tpu.parallel.train_step import ShardedTrainer
    from gcn_song_embeddings_tpu.parallel.walks_sharded import (
        make_sharded_walker,
        shard_graph,
    )

    pid = initialize_multihost(coordinator_address=f"localhost:{port}",
                               num_processes=num_procs, process_id=proc_id)
    n_global = num_procs * local
    assert len(jax.devices()) == n_global, jax.devices()
    assert len(jax.local_devices()) == local

    mesh = make_global_mesh(n_graph=n_graph)
    # verify the DCN mapping rule when graph == local: each dp row must be
    # one process's devices (graph-axis collectives stay intra-host)
    if n_graph == local:
        for row in mesh.devices:
            assert len({d.process_index for d in row}) == 1, mesh.devices
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

    # --- multihost partitioned PPR sweep: edge-partitioned CSR walker over
    # the global mesh (graph rows live on different processes' devices)
    rng2 = np.random.default_rng(1)
    n_it, n_co = 96, 24
    dst = rng2.integers(0, n_co, size=3 * n_it).astype(np.int64)
    src = np.repeat(np.arange(n_it, dtype=np.int64), 3)
    i2c = _build_csr(src, dst, n_it)
    c2i = _build_csr(dst, src, n_co)
    dgraph = DeviceGraph.from_arrays(i2c.indptr, i2c.indices,
                                     c2i.indptr, c2i.indices)
    sg = shard_graph(dgraph, mesh)
    walker = make_sharded_walker(mesh, sg, n_hops=200, alpha=0.85)
    W = 8 * n_global  # walker rows sharded over every device
    nodeset = jnp.asarray(np.arange(W, dtype=np.int32) % n_it)
    trace = walker(nodeset, jax.random.PRNGKey(3))
    trace_full = np.asarray(
        multihost_utils.process_allgather(trace, tiled=True))
    visits = np.bincount(trace_full.reshape(-1) % n_it, minlength=n_it)

    np.save(os.path.join(out_dir, f"emb_{pid}.npy"), emb)
    np.save(os.path.join(out_dir, f"losses_{pid}.npy"), losses)
    np.save(os.path.join(out_dir, f"ppr_{pid}.npy"), visits)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
