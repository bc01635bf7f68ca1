"""Device-side image preprocessing (the fused transform stage).

Replaces the torchvision transform tail (reference utils.py:84-88):
RandomHorizontalFlip -> RandomVerticalFlip -> ToTensor -> Normalize.
Resize-to-224 happens on host at decode time (see data/dataset.py) so the
host->device transfer is a compact uint8 tensor; everything after the
transfer is one jitted XLA program that fuses into the encoder's first
convolution:

    uint8 NHWC --(cast, /255, per-sample flips, mean/std normalize)--> f32 NHWC

Note the reference applies the same *augmenting* transform at test time
(utils.py:96) — flips at eval are a faithful reference behavior, controlled
here by the ``augment`` flag so parity runs can reproduce or disable it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# ImageNet normalization constants (reference utils.py:88).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.partial(jax.jit, static_argnames=("augment", "dtype"))
def preprocess_images(
    images_u8: jax.Array,
    key: jax.Array,
    augment: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """uint8 [B,H,W,3] -> normalized [B,H,W,3] float, with random flips.

    Flip semantics match torchvision: horizontal then vertical, each an
    independent per-sample Bernoulli(0.5) draw.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if augment:
        kh, kv = jax.random.split(key)
        b = x.shape[0]
        hflip = jax.random.uniform(kh, (b, 1, 1, 1)) < 0.5
        vflip = jax.random.uniform(kv, (b, 1, 1, 1)) < 0.5
        x = jnp.where(hflip, x[:, :, ::-1, :], x)
        x = jnp.where(vflip, x[:, ::-1, :, :], x)
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)


def host_space_to_depth(images_u8):
    """Host-side numpy relayout: uint8 [B,224,224,3] -> [B,112,112,12]
    with the (di,dj,c) channel order of ops/s2d_stem.py.  This is what a
    native emitter produces at decode time (fastimage's s2d output mode
    / an s2d image-cache layout); provided in numpy so any host pipeline
    can emit the layout.  Same byte count — H2D cost is unchanged."""
    import numpy as np

    B, H, W, C = images_u8.shape
    x = images_u8.reshape(B, H // 2, 2, W // 2, 2, C)
    return np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C))


@functools.partial(jax.jit, static_argnames=("augment", "dtype"))
def preprocess_images_s2d(
    images_u8: jax.Array,  # [B, 112, 112, 12] s2d-layout uint8
    key: jax.Array,
    augment: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """The s2d twin of preprocess_images: the input ARRIVES in
    space-to-depth layout (emitted by the host pipeline —
    host_space_to_depth / fastimage s2d mode), so the device never pays
    the relayout transpose that made the on-device s2d stem a measured
    negative (ops/s2d_stem.py:15-19).  Normalization indexes the RGB
    constants by k % 3 (channel k holds (di, dj, c=k%3)); flips are
    EXACT in s2d coordinates: horizontal = reverse the W/2 axis and swap
    dj within channels, vertical = reverse H/2 and swap di — the same
    pixels the stock flip moves, regrouped."""
    x = images_u8.astype(jnp.float32) / 255.0
    B, H2, W2, C12 = x.shape
    if augment:
        kh, kv = jax.random.split(key)
        xg = x.reshape(B, H2, W2, 2, 2, 3)  # [.., di, dj, c]
        # identical draw SHAPE to preprocess_images so the same key flips
        # the same samples (bit-exact pipeline equivalence by test)
        hflip = (jax.random.uniform(kh, (B, 1, 1, 1)) < 0.5).reshape(B, 1, 1, 1, 1, 1)
        vflip = (jax.random.uniform(kv, (B, 1, 1, 1)) < 0.5).reshape(B, 1, 1, 1, 1, 1)
        xg = jnp.where(hflip, xg[:, :, ::-1, :, ::-1, :], xg)
        xg = jnp.where(vflip, xg[:, ::-1, :, ::-1, :, :], xg)
        x = xg.reshape(B, H2, W2, C12)
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32), 4)
    std = jnp.tile(jnp.asarray(IMAGENET_STD, dtype=jnp.float32), 4)
    x = (x - mean) / std
    return x.astype(dtype)
