"""--device flag semantics (reference main.py:62,104-113): cpu forces the
JAX CPU backend, gpu/tpu alias to the default accelerator, junk rejected."""

import os
import subprocess
import sys

import pytest

import jax

from show_tell_tpu.cli.run import apply_device

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_device_gpu_and_tpu_are_accelerator_aliases():
    # No-ops: the reference's .cuda() placement == "whatever accelerator
    # the runtime sees"; must not raise or change the backend.
    before = jax.default_backend()
    apply_device("gpu")
    apply_device("tpu")
    assert jax.default_backend() == before


def test_device_rejects_unknown():
    with pytest.raises(ValueError):
        apply_device("quantum")


def test_device_cpu_forces_cpu_backend_subprocess():
    """In a fresh process (where the site hook would pick the TPU
    platform), --device cpu must win before backend initialization."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # simulate the production environment
    code = (
        "from show_tell_tpu.cli.run import apply_device\n"
        "apply_device('cpu')\n"
        "import jax\n"
        "print('backend=' + jax.default_backend())\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO_ROOT,
        timeout=600,
    )
    assert "backend=cpu" in out.stdout, out.stderr
