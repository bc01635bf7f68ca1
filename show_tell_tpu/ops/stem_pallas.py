"""Pallas TPU kernel: fully fused ResNet stem for serving.

The stem (conv1 7x7/s2 + BN + relu + 3x3/s2 maxpool, reference
cnn.py:44-51 via torchvision) is the encoder's MFU floor: XLA runs the
C_in=3 convolution at ~6% MFU and round-trips the [B,112,112,64]
pre-pool activation through HBM twice (conv write + pool read) — ~1.6GB
at B=512 bf16.  This kernel is the round-2 study's one untried lever
(ops/s2d_stem.py:18-20: the s2d transform "pays off only when the
pipeline emits s2d"): it consumes the space-to-depth UINT8 image the
input stage can emit directly and does everything else in one VMEM pass
per image:

    u8 [112,112,12] --(VPU)--> normalize (scale/shift, zero-padded
                               borders == post-normalize zeros)
        --(im2col, 16 static slices)--> patches [112*112, 192]
        --(MXU, f32 accum)--> @ w4 [192,64] + folded BN bias, relu
        --(VPU)--> 3x3/s2 maxpool --> out [56,56,64]

HBM traffic per image: 147KB in + 392KB out (bf16) — the 1.6MB conv
activation and the 602KB normalized image never leave VMEM.  The im2col
packs the 16 taps into K=192, so the MXU runs dense K instead of the
stock kernel's C_in=3 lanes.

Weights come from ``prepare_stem``: the s2d-rearranged conv1 kernel
(ops/s2d_stem.transform_conv1_weight) flattened to [192, 64] with the
eval-mode BN folded in (w * gamma/sqrt(var+eps); bias carries the rest)
— numerically identical to conv + eval BN (models/serving.py).
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
    """conv1 + bn1 (eval mode) -> s2d matmul weights for the kernel.

    Returns {"w": [192, Cout] folded kernel, "b": [1, Cout] folded bias,
    "scale"/"shift": [1, 12] normalize constants in s2d channel order}.
    """
    from show_tell_tpu.models.resnet import BN_EPS
    from show_tell_tpu.ops.s2d_stem import transform_conv1_weight

    w4 = transform_conv1_weight(resnet_params["conv1.weight"])  # [4,4,12,Cout]
    mult = resnet_params["bn1.weight"] * jax.lax.rsqrt(resnet_state["bn1.running_var"] + BN_EPS)
    w4 = w4 * mult[None, None, None, :]
    bias = resnet_params["bn1.bias"] - resnet_state["bn1.running_mean"] * mult
    # im2col channel order: tap (a, b) contributes channels [  (a*4+b)*12 : +12 ]
    w = w4.reshape(16 * 12, -1)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    scale = jnp.asarray(np.tile(1.0 / (255.0 * std), 4), jnp.float32)  # [12] s2d (di,dj,c)
    shift = jnp.asarray(np.tile(-mean / std, 4), jnp.float32)
    return {
        "w": w.astype(dtype),
        "b": bias.astype(jnp.float32)[None, :],
        "scale": scale[None, :],
        "shift": shift[None, :],
    }


def _kernel(x_ref, w_ref, b_ref, scale_ref, shift_ref, out_ref, xs_pad, *, pool):
    # normalize: u8 -> f32 (int32 hop: Mosaic has no direct u8->f32) -> bf16
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [112,112,12]
    x = x * scale_ref[...] + shift_ref[...]
    # zero borders == post-normalize zero padding of conv1 (pad (2,1))
    xs_pad[...] = jnp.zeros_like(xs_pad)
    xs_pad[2:114, 2:114, :] = x.astype(xs_pad.dtype)

    patches = jnp.concatenate(
        [xs_pad[a : a + 112, b : b + 112, :] for a in range(4) for b in range(4)], axis=-1
    )  # [112,112,192]
    y = jnp.dot(
        patches.reshape(112 * 112, 192), w_ref[...], preferred_element_type=jnp.float32
    ) + b_ref[...]
    y = jnp.maximum(y, 0.0).reshape(112, 112, -1)

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


def _stem_raw(xs_u8, w, b, scale, shift, *, pool, interpret):
    B = xs_u8.shape[0]
    C = w.shape[1]
    out_hw = 56 if pool else 112
    return pl.pallas_call(
        functools.partial(_kernel, pool=pool),
        out_shape=jax.ShapeDtypeStruct((B, out_hw, out_hw, C), w.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 112, 112, 12), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(shift.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_hw, out_hw, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((115, 115, 12), w.dtype)],
        interpret=interpret,
    )(xs_u8, w, b, scale, shift)


@functools.lru_cache(maxsize=None)
def _partitioned(pool: bool, interpret: bool):
    """Batch-parallel GSPMD rule, same as every kernel (ops/partition.py)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_stem_raw, pool=pool, interpret=interpret),
        arg_batch_dims=(0, None, None, None, None),
        out_batch_dims=(0,),
        sharding_rule="b h w c, k o, u o, u c, u c -> b p q o",
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
    return _partitioned(pool, interpret)(
        images_u8, prepared["w"], prepared["b"], prepared["scale"], prepared["shift"]
    )
