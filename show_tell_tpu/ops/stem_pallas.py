"""Pallas TPU kernel: fully fused ResNet stem — a MEASURED NEGATIVE
RESULT, kept as a verified artifact (not wired into serving).

The stem (conv1 7x7/s2 + BN + relu + 3x3/s2 maxpool, reference
cnn.py:44-51 via torchvision) is the encoder's MFU floor: XLA runs the
C_in=3 convolution at ~6% MFU and round-trips the [B,112,112,64]
pre-pool activation through HBM twice (conv write + pool read) — ~1.6GB
at B=512 bf16.  This kernel is the round-2 study's one untried lever
(ops/s2d_stem.py:18-20: the s2d transform "pays off only when the
pipeline emits s2d"): it consumes the space-to-depth UINT8 image
(zero-padded in XLA, which is ~free) and does everything else in one
VMEM pass per image.  Outcome (tools/stem_bench.py, fresh processes,
varied inputs): exact but 4x SLOWER than the XLA stem — 35.5ms vs
8.9ms at B=512 — because the im2col tap stores and the u8 cast move
12-of-128-lane padded vregs (~10.7x phantom VPU traffic) and Mosaic
offers no denser construct (lane concat NotImplemented, sub-rectangle
DMA crashes the compiler).  Full study: docs/ARCHITECTURE.md "Measured
limits".  Kernel structure:

    u8 [115,115,12] --(VPU)--> cast to compute dtype (one pass)
        --(im2col, 16 tap stores)--> patches [112*112, 192]
        --(MXU, f32 accum)--> @ w' [192,64]  + T[p,q,o] bias map, relu
        --(VPU)--> 3x3/s2 maxpool --> out [56,56,64]

The normalize never runs as elementwise math: its per-channel SCALE
folds into the matmul weights (w' = w * s_c along K) and its per-channel
SHIFT passes through the convolution as a precomputed constant bias map
T[p,q,o] = sum_taps w.(shift * interior_mask) + folded-BN bias — exact
including the borders, where conv1's zero padding means the shift term
is absent.  That matters on TPU: the s2d image's 12-channel lane dim
pads to 128 lanes (10.7x VPU waste), so every elementwise pass on it is
disproportionately slow, while the dense [.,192] patches and [.,64]
output layouts are lane-efficient.

HBM traffic per image: 147KB in + 392KB out (bf16) — the 1.6MB conv
activation never leaves VMEM.  The im2col packs the 16 taps into K=192,
so the MXU runs dense K instead of the stock kernel's C_in=3 lanes.

Weights come from ``prepare_stem``: the s2d-rearranged conv1 kernel
(ops/s2d_stem.transform_conv1_weight) flattened to [192, 64] with the
eval-mode BN folded in (w * gamma/sqrt(var+eps)) and the normalize
scale folded per input channel — numerically the stem of
models/serving.py's folded encoder on normalized images.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def prepare_stem(resnet_params: Dict[str, jax.Array], resnet_state: Dict[str, jax.Array], dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """conv1 + bn1 (eval mode) + normalize -> kernel operands.

    Returns {"w": [192, Cout] BN- and scale-folded matmul weight,
    "t": [112, 112, Cout] f32 additive map = normalize-shift passed
    through the conv (zero at the padded borders) + folded BN bias}.
    """
    from show_tell_tpu.models.resnet import BN_EPS
    from show_tell_tpu.ops.s2d_stem import transform_conv1_weight

    w4 = transform_conv1_weight(resnet_params["conv1.weight"])  # [4,4,12,Cout]
    mult = resnet_params["bn1.weight"] * jax.lax.rsqrt(resnet_state["bn1.running_var"] + BN_EPS)
    w4 = w4 * mult[None, None, None, :]
    bias = resnet_params["bn1.bias"] - resnet_state["bn1.running_mean"] * mult

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    scale = np.tile(1.0 / (255.0 * std), 4).astype(np.float32)  # [12] s2d (di,dj,c)
    shift = np.tile(-mean / std, 4).astype(np.float32)

    # Shift term through the conv: T[p,q,o] = sum_{a,b,c} w4[a,b,c,o] *
    # shift_c * interior_mask[p+a, q+b].  conv1's padding is zero
    # POST-normalize, so the mask kills the shift outside the image.
    tmask = np.zeros((1, 115, 115, 12), np.float32)
    tmask[:, 2:114, 2:114, :] = shift
    tmap = jax.lax.conv_general_dilated(
        jnp.asarray(tmask), w4.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + bias.astype(jnp.float32)  # [112, 112, Cout]

    # Normalize scale folds into the matmul K rows (per input channel).
    w = (w4 * scale[None, None, :, None]).reshape(16 * 12, -1)
    return {"w": w.astype(dtype), "t": tmap}


def _kernel(x_ref, w_ref, t_ref, out_ref, xc, patches, *, pool):
    # One cast pass u8 -> compute dtype (int32 hop: Mosaic has no direct
    # u8->f32).  No normalize math here — scale lives in w, shift in t.
    xc[...] = x_ref[0].astype(jnp.int32).astype(jnp.float32).astype(xc.dtype)

    # im2col: 16 tap stores, each a full-rectangle ref read at offsets
    # (a, b) into a lane-offset slice of the patches scratch.
    for k, (a, b) in enumerate([(i, j) for i in range(4) for j in range(4)]):
        patches[:, :, k * 12 : (k + 1) * 12] = xc[a : a + 112, b : b + 112, :]
    y = jnp.dot(
        patches[...].reshape(112 * 112, 192), w_ref[...], preferred_element_type=jnp.float32
    ).reshape(112, 112, -1) + t_ref[...]
    y = jnp.maximum(y, 0.0)

    if not pool:
        out_ref[0] = y.astype(out_ref.dtype)
        return

    # 3x3/s2 maxpool, pad 1 (torchvision stem): rows 2p-1..2p+1.  Pair
    # rows as [56, 2, ...]: window p = max(pair[p-1][1], pair[p][0],
    # pair[p][1]); the p-1 shift is a pad+slice (row -1 is -inf).
    neg = jnp.float32(-3e38)

    def pool1d(t):  # [112, ...] -> [56, ...] over axis 0
        pairs = t.reshape(56, 2, *t.shape[1:])
        prev_hi = jnp.concatenate([jnp.full_like(pairs[:1, 1], neg), pairs[:-1, 1]], axis=0)
        return jnp.maximum(jnp.maximum(pairs[:, 0], pairs[:, 1]), prev_hi)

    y = pool1d(y)  # rows -> [56,112,C]
    y = jnp.transpose(pool1d(jnp.transpose(y, (1, 0, 2))), (1, 0, 2))  # cols
    out_ref[0] = y.astype(out_ref.dtype)


def _stem_raw(xs_u8, w, t, *, pool, interpret):
    B = xs_u8.shape[0]  # [B, 115, 115, 12] zero-padded s2d u8
    C = w.shape[1]
    out_hw = 56 if pool else 112
    return pl.pallas_call(
        functools.partial(_kernel, pool=pool),
        out_shape=jax.ShapeDtypeStruct((B, out_hw, out_hw, C), w.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 115, 115, 12), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(t.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_hw, out_hw, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((115, 115, 12), w.dtype),
            pltpu.VMEM((112, 112, 192), w.dtype),
        ],
        # ~25MB live per grid step (the 12-lane dims of the u8 block and
        # the cast scratch pad to 128 lanes); the 16MB scoped default is
        # a compiler heuristic, not the 128MB hardware VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xs_u8, w, t)


@functools.lru_cache(maxsize=None)
def _partitioned(pool: bool, interpret: bool):
    """Batch-parallel GSPMD rule, same as every kernel (ops/partition.py)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_stem_raw, pool=pool, interpret=interpret),
        arg_batch_dims=(0, None, None),
        out_batch_dims=(0,),
        sharding_rule="b h w c, k o, x y o -> b p q o",
    )


def stem_fused_pallas(
    images_u8: jax.Array,  # [B, 224, 224, 3] uint8 (or [B,112,112,12] pre-s2d)
    prepared: Dict[str, jax.Array],  # from prepare_stem
    pool: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """uint8 image -> post-stem activation ([B,56,56,C] with pool, else
    [B,112,112,C]); == normalize + conv1 + eval-BN + relu (+ maxpool)."""
    if images_u8.shape[-1] == 3:
        from show_tell_tpu.ops.s2d_stem import space_to_depth

        images_u8 = space_to_depth(images_u8)  # cheap u8 relayout, XLA
    if images_u8.shape[1] == 112:
        # conv1's pad 3 on the 224 image == pad (2, 1) in s2d coords.
        # u8 zero-pad in XLA is ~free; the T map keeps the border exact.
        images_u8 = jnp.pad(images_u8, ((0, 0), (2, 1), (2, 1), (0, 0)))
    return _partitioned(pool, interpret)(images_u8, prepared["w"], prepared["t"])
