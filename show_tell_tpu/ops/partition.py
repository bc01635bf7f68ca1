"""GSPMD partitioning rules for the Pallas kernels.

GSPMD/Shardy cannot partition a Mosaic custom call by itself, which is
why round-2's kernel policy fell back to XLA whenever device_count > 1
— surrendering the measured kernel wins exactly in the v5e-8 serving
configuration the framework targets.  Every kernel here is batch-
parallel (its grid blocks the batch dimension; weights are broadcast),
so the right fix is to TELL the partitioner that: each kernel wrapper
is registered via ``jax.experimental.custom_partitioning`` with a rule
that shards the data operands along the mesh axis their batch dimension
already carries and replicates the weight operands.  Under a dp (or
dp x mp) mesh the kernel then runs per-shard on the local batch — the
same program it runs single-chip — and the surrounding decode keeps its
GSPMD collectives.  No shard_map threading, no policy fork: the same
jitted serving path now works on 1 chip and on a sharded mesh.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def batch_partitioned(
    fn: Callable,
    arg_batch_dims: Sequence[Optional[int]],
    out_batch_dims: Sequence[Optional[int]],
    sharding_rule: str,
):
    """Wrap a flat-array Pallas kernel wrapper `fn` with a batch-parallel
    partitioning rule.

    arg_batch_dims[i] / out_batch_dims[j]: index of the batch dimension
    in operand i / result j, or None for replicated (weight) operands.
    The mesh axis name is read off the first batch operand's incoming
    sharding; if no batch operand is sharded, everything stays
    replicated and the kernel runs whole (the single-chip case).
    sharding_rule: the equivalent einsum-like rule for the Shardy
    partitioner (same contract, string form).
    """
    inner = fn

    def fn(*args):  # positional-only: custom_partitioning rejects
        return inner(*args)  # functools.partial keyword bindings

    wrapped = custom_partitioning(fn)

    def _batch_axis_name(arg_shapes):
        for i, d in enumerate(arg_batch_dims):
            if d is None:
                continue
            spec = arg_shapes[i].sharding.spec
            if len(spec) > d and spec[d] is not None:
                return spec[d]
        return None

    def _shardings(mesh, name, shapes, batch_dims):
        out = []
        for s, d in zip(shapes, batch_dims):
            spec = [None] * len(s.shape)
            if d is not None and name is not None:
                spec[d] = name
            out.append(NamedSharding(mesh, P(*spec)))
        return out

    def _result_shardings(mesh, name, result_shape):
        multi = isinstance(result_shape, (list, tuple))
        shapes = list(result_shape) if multi else [result_shape]
        outs = _shardings(mesh, name, shapes, out_batch_dims)
        return type(result_shape)(outs) if multi else outs[0]

    def infer(mesh, arg_shapes, result_shape):
        return _result_shardings(mesh, _batch_axis_name(arg_shapes), result_shape)

    def partition(mesh, arg_shapes, result_shape):
        name = _batch_axis_name(arg_shapes)
        arg_sh = tuple(_shardings(mesh, name, arg_shapes, arg_batch_dims))
        return mesh, fn, _result_shardings(mesh, name, result_shape), arg_sh

    wrapped.def_partition(
        infer_sharding_from_operands=infer, partition=partition, sharding_rule=sharding_rule
    )
    return wrapped
