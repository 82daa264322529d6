"""Distributed node-table gather: the boundary-exchange collective.

Node-indexed tables (features [N, d], PPR neighborhoods [N, T]) are
row-sharded across the ``graph`` mesh axis.  A conv layer's frontier needs
arbitrary global rows, so the lookup is the classic sharded-embedding
exchange, built from XLA collectives that ride ICI:

    1. `all_gather` every peer's requested ids along ``graph``   [g, m]
    2. answer ALL requests from the local shard (masked gather)  [g, m, d]
    3. `psum_scatter` along ``graph``: each peer receives the sum of all
       contributions for ITS requests                            [m, d]

Exactly one peer holds each row, so the sum is the row itself.  This is the
all-to-all boundary-embedding exchange described in SURVEY §2.2/§5, with
compute-communication overlap left to XLA's latency-hiding scheduler.

Must be called inside `shard_map` with a ``graph`` axis in scope.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sharded_table_gather(table_local: jnp.ndarray, ids: jnp.ndarray,
                         axis_name: str = "graph") -> jnp.ndarray:
    """Gather global rows `ids` from a row-sharded table.

    Args:
      table_local: [N/g, ...] this device's contiguous row shard (shard i
        holds global rows [i*N/g, (i+1)*N/g)).
      ids: [m] int32 global row ids — may differ per device.

    Returns: [m, ...] the requested rows (same dtype as the table).
    """
    g = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    shard_rows = table_local.shape[0]

    all_ids = lax.all_gather(ids, axis_name)            # [g, m]
    flat = all_ids.reshape(-1)                          # [g*m]
    local = flat - my * shard_rows
    in_range = (local >= 0) & (local < shard_rows)
    rows = table_local[jnp.clip(local, 0, shard_rows - 1)]
    rows = jnp.where(
        in_range.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0)
    rows = rows.reshape((g,) + ids.shape + table_local.shape[1:])
    # each peer receives the summed answers for its own request block
    return lax.psum_scatter(rows, axis_name, scatter_dimension=0,
                            tiled=False)
