"""Build the native fastimage library (g++ + libjpeg).

Usage: python -m show_tell_tpu.native.build
The library is also auto-built on first use (fastimage.is_available()).
"""

from __future__ import annotations

import os
import subprocess

SRC = os.path.join(os.path.dirname(__file__), "fastimage.cpp")
# ABI-versioned filename: dlopen caches by path, so re-dlopening a path
# that was already loaded returns the OLD handle even after the file is
# rewritten — a new ABI must live at a new path (v2 = fast_scale entry
# points; v3 = s2d output mode).  Bump the suffix whenever the C ABI changes.
LIB = os.path.join(os.path.dirname(__file__), "libfastimage_v3.so")


def build(verbose: bool = True) -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        SRC,
        "-o",
        LIB,
        "-ljpeg",
        "-lpthread",
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print("fastimage build failed:", e)
        return False
    if result.returncode != 0:
        if verbose:
            print("fastimage build failed:\n", result.stderr)
        return False
    if verbose:
        print("built", LIB)
    return True


SRC_METRICS = os.path.join(os.path.dirname(__file__), "fastmetrics.cpp")
LIB_METRICS = os.path.join(os.path.dirname(__file__), "libfastmetrics_v1.so")


def build_metrics(verbose: bool = True) -> bool:
    """Build the native caption scorer (fastmetrics.cpp).

    -ffp-contract=off is load-bearing: FMA contraction would change
    float roundings and break the bit-exactness contract with the
    Python scorers (no -ffast-math for the same reason).
    """
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-ffp-contract=off",
        "-std=c++17",
        "-shared",
        "-fPIC",
        SRC_METRICS,
        "-o",
        LIB_METRICS,
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print("fastmetrics build failed:", e)
        return False
    if result.returncode != 0:
        if verbose:
            print("fastmetrics build failed:\n", result.stderr)
        return False
    if verbose:
        print("built", LIB_METRICS)
    return True


if __name__ == "__main__":
    ok = build()
    ok = build_metrics() and ok
    raise SystemExit(0 if ok else 1)
