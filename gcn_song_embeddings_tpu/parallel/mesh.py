"""Device mesh helpers.

The framework scales over a 2D logical mesh:

  * ``dp``    — data parallelism over training triples,
  * ``graph`` — graph parallelism: the node-indexed tables (features,
                precomputed PPR neighborhoods) are row-sharded so each
                device holds N/g rows in HBM.

The reference has no distributed code at all (SURVEY §2.2); this layer is
the new-build equivalent of its NCCL-backed peers, expressed as
`jax.sharding.Mesh` + `shard_map` with XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_dp: int | None = None, n_graph: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, graph) mesh over `devices` (default: all).

    With only one count given, the other is inferred from the device count.
    Defaults to putting all devices on the dp axis (parameter-replicated
    data parallelism — the right default for PinSage's ~0.6M params,
    SURVEY §2.2).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_dp is None and n_graph is None:
        n_dp, n_graph = n, 1
    elif n_dp is None:
        n_dp = n // n_graph
    elif n_graph is None:
        n_graph = n // n_dp
    if n_dp * n_graph != n:
        raise ValueError(f"mesh {n_dp}x{n_graph} != {n} devices")
    arr = np.array(devices).reshape(n_dp, n_graph)
    return Mesh(arr, axis_names=("dp", "graph"))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
