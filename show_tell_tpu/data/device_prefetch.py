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
    replicated_indices: Tuple[int, ...] = (),
    stage_ahead: bool = True,
) -> Iterator:
    """Yields batches with elements at ``put_indices`` placed on device
    one step ahead.  Non-array elements (e.g. path tuples) pass through.
    local_indices: elements that hold ONLY this process's rows (the
    multi-host process-sharded loader's images) — assembled into the
    global array via mesh.put_sharded(local_rows=True).

    A batch whose rows do not divide the mesh's dp axis (the eval
    loader's drop_last=False tail) is placed fully REPLICATED instead:
    every device computes that one partial batch whole — bit-identical
    results, and the inputs stay on the mesh's device set so they can
    feed the same mesh-placed params (a plain single-device put could
    not; jit rejects mixed device sets).

    replicated_indices: elements always placed replicated on the mesh
    (the eval loop's captions/lengths — the host-side scoring reads them
    back, and a replicated array is addressable on every process).

    stage_ahead=False disables the one-batch-ahead staging (each batch is
    placed when consumed — the reference's serial H2D order); it exists
    for the `bench.py --eval` staging A/B, same pattern as the tester's
    PIPELINE_SCORING flag."""
    from show_tell_tpu.parallel.mesh import batch_sharding, put_sharded, replicated

    if not set(local_indices) <= set(put_indices):
        # A local-rows element that is never device_put would flow into
        # the step as this process's PARTIAL batch — a silent multi-host
        # divergence, not an error XLA can catch.
        raise ValueError(
            "local_indices %r must be a subset of put_indices %r"
            % (local_indices, put_indices)
        )
    sharding = batch_sharding(mesh) if mesh is not None else None
    dp = mesh.shape["dp"] if mesh is not None else 1
    nproc = jax.process_count()

    def put(batch):
        out = list(batch)
        for i in put_indices:
            if sharding is None:
                out[i] = jax.device_put(out[i])
                continue
            sh = sharding
            if i in replicated_indices:
                if i in local_indices:
                    raise ValueError(
                        "element %d cannot be both replicated and local-rows" % i
                    )
                out[i] = put_sharded(out[i], replicated(mesh))
                continue
            # Divisibility is over GLOBAL rows: a local-rows element holds
            # only this process's 1/nproc slice of the batch, but the dp
            # axis it shards over spans every process's devices.
            rows = out[i].shape[0] * (nproc if i in local_indices else 1)
            if rows % dp:
                if i in local_indices:
                    # Partial local rows cannot be assembled replicated
                    # (each process holds different data); the process-
                    # sharded loader enforces drop_last so this is a
                    # caller bug, not a tail batch.
                    raise ValueError(
                        "batch element %d has %d local rows (%d global), not "
                        "divisible over dp=%d, and holds local rows only"
                        % (i, out[i].shape[0], rows, dp)
                    )
                sh = replicated(mesh)
            out[i] = put_sharded(out[i], sh, local_rows=i in local_indices)
        return tuple(out)

    it = iter(batches)
    if not stage_ahead:  # serial order: place each batch as consumed
        for batch in it:
            yield put(batch)
        return
    try:
        pending = put(next(it))
    except StopIteration:
        return
    for nxt in it:
        nxt_dev = put(nxt)  # enqueue next H2D before yielding current
        yield pending
        pending = nxt_dev
    yield pending
