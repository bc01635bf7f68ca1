"""Pallas TPU kernel: fused uint8 -> normalized-float image preprocessing.

The serving input stage (reference utils.py:84-88 minus augmentation):
cast uint8, /255, per-channel mean/std normalize — fused into one VMEM
pass.  The NHWC image is viewed as [B, H*W*C] (224*224*3 = 150528 =
1176 lanes of 128), and the per-position channel constants are
precomputed into flat scale/shift vectors so the kernel body is a single
multiply-add:

    y = x * scale + shift,  scale = 1/(255*std_c), shift = -mean_c/std_c

XLA fuses the same chain into the first conv automatically (and the
training path keeps the XLA version, data/transforms.py); this kernel is
the explicit-Pallas form of that stage.  Measured on v5e: XLA's fused
version is ~2.4x faster (1.6ms vs 3.9ms at B=512) because Mosaic lacks a
direct uint8->f32 cast (int32 hop doubles VPU work) while XLA folds the
whole chain into the conv epilogue — so the XLA path stays the default
and this kernel exists as the explicit-kernel alternative and template.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _kernel(x_ref, scale_ref, shift_ref, out_ref):
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    out_ref[...] = (x * scale_ref[...] + shift_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "block_b", "interpret"))
def preprocess_images_pallas(
    images_u8: jax.Array,  # [B, H, W, 3] uint8
    dtype=jnp.bfloat16,
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    B, H, W, C = images_u8.shape
    flat = H * W * C
    assert flat % 128 == 0, "H*W*C must tile onto 128 lanes"
    assert B % block_b == 0, (B, block_b)

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    scale = jnp.asarray(np.tile(1.0 / (255.0 * std), H * W), jnp.float32)  # [flat]
    shift = jnp.asarray(np.tile(-mean / std, H * W), jnp.float32)

    x = images_u8.reshape(B, flat)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, flat), dtype),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, flat), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((flat,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((flat,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, flat), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale, shift)
    return out.reshape(B, H, W, C)
