"""Device-side batch prefetching: overlap H2D transfer with compute.

Wraps a host batch iterator so the NEXT batch's arrays are already on
device (optionally sharded over the dp mesh) while the current step
computes — double-buffered H2D, the jax equivalent of the reference's
DataLoader worker pipelining (utils.py:93) extended across the PCIe
boundary.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import jax


def device_prefetch(
    batches: Iterable,
    mesh=None,
    put_indices: Tuple[int, ...] = (1, 2, 3),
    local_indices: Tuple[int, ...] = (),
) -> Iterator:
    """Yields batches with elements at ``put_indices`` placed on device
    one step ahead.  Non-array elements (e.g. path tuples) pass through.
    local_indices: elements that hold ONLY this process's rows (the
    multi-host process-sharded loader's images) — assembled into the
    global array via mesh.put_sharded(local_rows=True)."""
    from show_tell_tpu.parallel.mesh import batch_sharding, put_sharded

    if not set(local_indices) <= set(put_indices):
        # A local-rows element that is never device_put would flow into
        # the step as this process's PARTIAL batch — a silent multi-host
        # divergence, not an error XLA can catch.
        raise ValueError(
            "local_indices %r must be a subset of put_indices %r"
            % (local_indices, put_indices)
        )
    sharding = batch_sharding(mesh) if mesh is not None else None

    def put(batch):
        out = list(batch)
        for i in put_indices:
            out[i] = (
                put_sharded(out[i], sharding, local_rows=i in local_indices)
                if sharding is not None
                else jax.device_put(out[i])
            )
        return tuple(out)

    it = iter(batches)
    try:
        pending = put(next(it))
    except StopIteration:
        return
    for nxt in it:
        nxt_dev = put(nxt)  # enqueue next H2D before yielding current
        yield pending
        pending = nxt_dev
    yield pending
