"""Device mesh + sharding rules.

The reference is single-process single-GPU (SURVEY.md §2.4); here
parallelism is first-class: one ``jax.sharding.Mesh`` with a ``dp`` (batch)
axis — the only strategy this model family's size justifies — plus a spare
``mp`` axis hook for tensor-parallel experiments.  The same jitted train /
decode step runs on 1 chip or a pod slice: batches are sharded along
``dp``, params are replicated, and XLA/GSPMD inserts the gradient psum
over ICI automatically.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, mp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """dp=0 means all visible devices (divided by mp)."""
    devices = list(devices if devices is not None else jax.devices())
    if dp <= 0:
        dp = len(devices) // mp
    if dp * mp > len(devices):
        raise ValueError(
            "mesh dp=%d x mp=%d needs %d devices but only %d are visible"
            % (dp, mp, dp * mp, len(devices))
        )
    devs = np.array(devices[: dp * mp]).reshape(dp, mp)
    if jax.process_count() > 1:
        # Multi-host meshes must cover every process EQUALLY: a process
        # whose devices all fell off the dp*mp prefix has zero
        # addressable shards (put_sharded fails obscurely there and the
        # other processes hang in their first collective), and UNEQUAL
        # coverage breaks the equal-share convention the process-sharded
        # loader and put_sharded(local_rows=True) both assume (each host
        # contributes exactly 1/Nth of every batch).  Reject up front.
        counts: dict = {}
        for d in devs.flat:
            counts[d.process_index] = counts.get(d.process_index, 0) + 1
        if len(counts) != jax.process_count() or len(set(counts.values())) != 1:
            raise ValueError(
                "multi-host mesh (dp=%d, mp=%d) covers processes unevenly "
                "(%s of %d processes); every process must own the same number "
                "of mesh devices — use dp*mp == jax.device_count() (= %d) or "
                "run single-host"
                % (dp, mp, dict(sorted(counts.items())), jax.process_count(), jax.device_count())
            )
    return Mesh(devs, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across dp, rest replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(x, sharding: NamedSharding, local_rows: bool = False):
    """device_put that also works when the sharding spans PROCESSES
    (multi-host, parallel/multihost.py).  Convention there: every
    process passes the identical global value and contributes the rows
    its addressable devices own (contiguous, because make_mesh lays the
    mesh over jax.devices(), which groups devices by process).

    local_rows=True: ``x`` holds ONLY this process's rows (equal share
    of the leading axis) — the process-sharded loader's images path,
    which decodes 1/Nth of each batch per host instead of all of it."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    if local_rows:
        if sharding.is_fully_replicated:
            # local_rows means "x holds ONLY this process's rows" — under
            # a replicated sharding that would silently build a 'global'
            # array from per-process partial (divergent) data.
            raise ValueError(
                "put_sharded(local_rows=True) with a fully-replicated sharding: "
                "each process holds different rows, so no replicated global "
                "value exists — pass the full batch, or shard the batch axis"
            )
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape=global_shape)
    if sharding.is_fully_replicated:
        local = x
    else:
        # (start, stop) tuples, not slice objects: slices are unhashable
        # before Python 3.12 and this package supports 3.10+.
        spans = {
            (sl[0].start, sl[0].stop)
            for sl in sharding.addressable_devices_indices_map(x.shape).values()
        }
        if not spans:
            raise ValueError(
                "put_sharded: this process owns no devices of the sharding's mesh "
                "(multi-host meshes must span every process — see make_mesh)"
            )
        start = min(st or 0 for st, _ in spans)
        stop = max(x.shape[0] if sp is None else sp for _, sp in spans)
        local = x[start:stop]
    return jax.make_array_from_process_local_data(sharding, local, global_shape=x.shape)


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    out = tuple(put_sharded(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: put_sharded(x, sh), tree)


def decoder_param_shardings(mesh: Mesh, trainable) -> Any:
    """Tensor-parallel sharding rule for the decoder's large params.

    The vocab-sized tensors dominate decoder memory and FLOPs:
      * ``decoder.linear.w [H, V]`` / ``.b [V]`` shard over ``mp`` on the
        vocab axis — each device computes a [B, V/mp] logit shard and
        GSPMD turns the softmax/argmax reductions into ICI collectives;
      * ``decoder.embedding [V, E]`` shards over ``mp`` on V — token
        gathers become collective lookups.
    Everything else (recurrence weights, encoder head) is replicated —
    at H=512 the MXU tiles are already small; splitting them would only
    add latency (SURVEY.md §2.4: DP is the justified strategy, TP exists
    as a mesh-axis hook).

    Returns a pytree of NamedSharding matching ``trainable``.
    """

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "decoder" in names and "linear" in names and names[-1] == "w":
            return NamedSharding(mesh, P(None, "mp"))
        if "decoder" in names and "linear" in names and names[-1] == "b":
            return NamedSharding(mesh, P("mp"))
        if "decoder" in names and names[-1] == "embedding":
            return NamedSharding(mesh, P("mp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, trainable)


def shard_train_state(mesh: Mesh, train_state, tensor_parallel: bool = False):
    """Place a TrainState on the mesh: params replicated (or TP-sharded
    per decoder_param_shardings), optimizer state sharded like its params."""
    if not tensor_parallel:
        return replicate(mesh, train_state)
    if jax.process_count() > 1:
        # mp traffic is per-decode-step (logit/softmax collectives) and
        # belongs on ICI within one host; dp is the only axis that
        # should cross DCN (parallel/multihost.py).
        raise NotImplementedError("tensor parallelism (mp>1) is single-host only")
    t_sh = decoder_param_shardings(mesh, train_state.trainable)

    def put_like_params(subtree):
        """Shard a subtree that mirrors the trainable tree; else replicate."""
        if jax.tree.structure(subtree) == jax.tree.structure(train_state.trainable):
            return jax.tree.map(lambda x, s: jax.device_put(x, s), subtree, t_sh)
        return replicate(mesh, subtree)

    # optax chain state: tuple of per-transform states, each a NamedTuple
    # whose fields either mirror the param tree (trace/mu/nu) or are
    # scalars (count).
    new_opt = []
    for st in train_state.opt_state:
        if hasattr(st, "_fields"):
            new_opt.append(type(st)(**{f: put_like_params(getattr(st, f)) for f in st._fields}))
        else:
            new_opt.append(replicate(mesh, st))

    return type(train_state)(
        jax.tree.map(lambda x, s: jax.device_put(x, s), train_state.trainable, t_sh),
        replicate(mesh, train_state.frozen),
        replicate(mesh, train_state.bn_state),
        tuple(new_opt),
        replicate(mesh, train_state.rng),
        replicate(mesh, train_state.step),
    )
