"""Multi-host initialization + mesh construction.

Single-host multi-chip runs need nothing special (make_mesh over local
devices).  Multi-host pod-slice runs initialize the JAX distributed
runtime first, after which `jax.devices()` spans every host and the same
(dp, graph) mesh code works unchanged — XLA routes intra-slice collectives
over ICI and inter-slice traffic over DCN.

This environment has one chip, so multi-host behavior is validated by a
REAL 2-process run in tests/test_parallel.py::test_multihost_two_process_
training: two OS processes x 4 virtual CPU devices each, joined by
jax.distributed over gloo CPU collectives into one 8-device global mesh,
training + embedding through ShardedTrainer with bit-identical results on
both processes.  The API mirrors standard jax.distributed usage so
real-pod runs need no code changes.
"""

from __future__ import annotations

import jax

from gcn_song_embeddings_tpu.parallel.mesh import make_mesh

_initialized = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> int:
    """Initialize jax.distributed (idempotent).

    With no arguments, uses the TPU environment's auto-detection (the
    standard pod-slice path).  Returns this process's index.  On a single
    process with no coordinator it is a no-op returning 0.
    """
    global _initialized
    if _initialized:
        return jax.process_index()
    if num_processes == 1:
        _initialized = True
        return 0
    try:
        # no-arg call uses the TPU environment's auto-detection (the
        # standard pod-slice path); explicit args override it
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception as e:
        if coordinator_address is not None or num_processes is not None:
            raise  # explicit multi-host request must not silently degrade
        import os

        # A pod environment that FAILED to initialize must not silently
        # degrade either: one worker continuing single-process while its
        # peers form the global mesh hangs every collective on the job.
        # (TPU_WORKER_HOSTNAMES counts only when it lists MULTIPLE hosts —
        # single-host TPU runtimes set it too.)
        pod_hints = [v for v in (
            "MEGASCALE_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
        ) if os.environ.get(v)]
        if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
            pod_hints.append("TPU_WORKER_HOSTNAMES")
        if pod_hints:
            raise RuntimeError(
                f"jax.distributed auto-init failed ({e!r}) but pod "
                f"environment variables are set ({pod_hints}); refusing "
                f"to continue single-process on a multi-host job") from e
        # genuinely no pod environment: single-process fallback
        import warnings

        warnings.warn(f"jax.distributed auto-init unavailable ({e!r}); "
                      f"continuing single-process")
    _initialized = True
    return jax.process_index()


def make_global_mesh(n_graph: int = 1):
    """(dp, graph) mesh over ALL processes' devices.

    Call after `initialize_multihost`.  Parameters stay replicated and
    gradients psum over both axes (ShardedTrainer works unchanged); node
    tables shard over `graph`, which should be kept within a host/slice
    so table-gather collectives ride ICI rather than DCN.
    """
    devices = jax.devices()
    return make_mesh(n_dp=len(devices) // n_graph, n_graph=n_graph,
                     devices=devices)
