"""One-deep dispatch/drain software pipelining.

JAX dispatch is asynchronous: a jitted call returns device arrays before
the computation finishes.  Loops of the shape

    for block in blocks:
        out = jitted(block)        # async dispatch
        host[...] = np.asarray(out)  # BLOCKS until `out` is done

serialize device compute against device->host copy-out.  Draining each
dispatch one iteration late lets block i's copy-out ride behind block
i+1's compute — measured wins recorded in RESULTS.md (e.g. the 1M-node
PPR sweep).  Depth 1 is deliberate: deeper pipelines hold more device
output buffers live for no extra overlap on a single copy engine.
"""

from __future__ import annotations

from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")


def lagged(items: Iterable[T]) -> Iterator[T]:
    """Yield each element of `items` one iteration late.

    `for out in lagged(dispatch(b) for b in blocks): drain(out)` overlaps
    each drain with the next dispatch's compute.  The generator argument
    is advanced eagerly one element ahead of the consumer.
    """
    sentinel = object()
    pending: object = sentinel
    for item in items:
        if pending is not sentinel:
            yield pending  # type: ignore[misc]
        pending = item
    if pending is not sentinel:
        yield pending  # type: ignore[misc]
