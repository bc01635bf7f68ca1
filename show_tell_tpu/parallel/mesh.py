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

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, mp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """dp=0 means all visible devices (divided by mp)."""
    devices = list(devices if devices is not None else jax.devices())
    if dp <= 0:
        dp = len(devices) // mp
    devs = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(devs, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across dp, rest replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
