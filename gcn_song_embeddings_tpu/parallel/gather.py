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


def sharded_table_gather_ring(table_local: jnp.ndarray, ids: jnp.ndarray,
                              axis_name: str = "graph") -> jnp.ndarray:
    """Ring-pipelined variant of `sharded_table_gather`.

    The (requests, partial answers) packet travels the ``graph`` ring via
    `ppermute`; every hop each device answers the packet it just received
    from its own shard and forwards it.  After g hops the packet is home,
    fully answered.  Per-link traffic is m·d rows per hop — the same
    aggregate volume as the reduce-scatter path — but the local masked
    gather of hop k overlaps the in-flight permute of hop k+1 (XLA emits
    async collective-permute start/done pairs), i.e. the double-buffered
    boundary-exchange/local-aggregation overlap described in SURVEY §2.2/§5.
    Prefer this on real ICI meshes with large row payloads; the
    `psum_scatter` path has fewer steps and wins at small g or tiny rows.
    """
    g = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    shard_rows = table_local.shape[0]
    perm = [(i, (i + 1) % g) for i in range(g)]
    flat_ids = ids.reshape(-1)

    def answer(req_ids):  # [m] -> [m, ...] rows, zeros for remote rows
        local = req_ids - my * shard_rows
        ok = (local >= 0) & (local < shard_rows)
        rows = table_local[jnp.clip(local, 0, shard_rows - 1)]
        return jnp.where(ok.reshape((-1,) + (1,) * (rows.ndim - 1)), rows, 0)

    acc = answer(flat_ids)  # hop 0: answer own requests from the local shard

    def hop(carry, _):
        req, acc = carry
        req = lax.ppermute(req, axis_name, perm)
        acc = lax.ppermute(acc, axis_name, perm)
        acc = acc + answer(req)
        return (req, acc), None

    (_, acc), _ = lax.scan(hop, (flat_ids, acc), None, length=g - 1)
    if g > 1:
        # one final hop brings the fully-answered packet home
        acc = lax.ppermute(acc, axis_name, perm)
    return acc.reshape(ids.shape + table_local.shape[1:])
