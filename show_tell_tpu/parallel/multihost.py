"""Multi-host (multi-process) execution over DCN.

The reference is strictly single-process, single-device (SURVEY §2.4).
Here the same dp-sharded program spans hosts: ``initialize()`` wires the
processes into one JAX runtime, ``make_mesh()`` then sees every host's
devices, and the shard/replicate helpers in ``parallel/mesh.py``
transparently assemble global arrays from process-local data
(``jax.make_array_from_process_local_data``).  GSPMD keeps gradient
psums on ICI within a host and crosses DCN only for the inter-host
reduction — dp over DCN, everything denser within the host; mp (tensor
parallelism) is deliberately confined to a single host
(``shard_train_state`` refuses it under multi-process).

Conventions:
  * every process runs the SAME program over the SAME logical data
    stream (identical shuffle seed / identical loader construction) and
    contributes the batch rows its mesh slice owns;
  * checkpointing, metric logging, and progress prints happen on
    process 0 only (``is_primary``, used by train/loop.py) — params are
    replicated, so process 0's copy is the global state.

CLI: pass ``--multihost HOST:PORT,NPROC,PID`` (same string on every
host except PID) to any entry point; on TPU pods prefer the platform's
automatic bootstrap (``jax.distributed.initialize()`` with no args)
via ``--multihost auto``.

Tested end-to-end in tests/test_multihost.py: two OS processes x 4
virtual CPU devices each form one dp=8 mesh whose train step reproduces
the single-process dp=8 result (collectives ride Gloo, the CPU stand-in
for DCN).
"""

from __future__ import annotations

import jax


def initialize(spec: str) -> None:
    """Join this process into a multi-host JAX runtime.

    spec: ``"coordinator_host:port,num_processes,process_id"`` — or
    ``"auto"`` for platforms whose bootstrap needs no arguments (TPU
    pods).  Must run before any backend-initializing JAX call; after it,
    ``jax.devices()`` lists every host's devices and ``make_mesh()``
    builds the global mesh.
    """
    if spec == "auto":
        jax.distributed.initialize()
        return
    parts = [p.strip() for p in spec.split(",")]
    if len(parts) != 3:
        raise ValueError(
            "--multihost expects 'coordinator_host:port,num_processes,process_id' "
            "or 'auto'; got %r" % spec
        )
    jax.distributed.initialize(
        coordinator_address=parts[0],
        num_processes=int(parts[1]),
        process_id=int(parts[2]),
    )


def is_primary() -> bool:
    """True on the process that owns checkpointing/logging (process 0);
    always True single-process."""
    return jax.process_index() == 0
