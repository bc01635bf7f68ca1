"""Pallas TPU kernels and the measured kernel-selection policy."""

import jax


def pallas_auto_default() -> bool:
    """The measured `--use_pallas -1` auto policy (tools/tpu_smoke.py
    --bench): the fused attention context kernel wins 1.18-1.37x on a
    single TPU chip; under multi-device meshes GSPMD has no partitioning
    rule for the Mosaic custom call, so auto falls back to XLA there."""
    return jax.default_backend() == "tpu" and jax.device_count() == 1
