"""ResNet-18/34/50/101/152 in functional JAX (XLA convolutions, NHWC).

TPU-native replacement for the torchvision backbones the reference wraps
(cnn.py:22-34).  Design:

  * params/state are *flat dicts keyed by the torchvision state_dict names*
    ("layer1.0.conv1.weight", ...) — valid pytrees, and the torch->jax
    converter becomes a transpose-only walk, so reference checkpoints and
    ImageNet .pth files load directly;
  * conv weights live in HWIO, activations in NHWC (the layouts XLA tiles
    best onto the MXU);
  * BatchNorm is explicit two-mode: training mode normalizes with batch
    statistics and returns updated running stats (torch semantics,
    momentum 0.1 backbone) — the reference runs its *frozen* backbone in
    train mode, so running stats drift exactly like torch's do; eval mode
    uses running stats.

The final fc layer is never created (the reference strips it, cnn.py:34).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5

# (block_type, layers-per-stage) per version — the standard ResNet recipe.
RESNET_SPECS: Dict[int, Tuple[str, List[int]]] = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
}

STAGE_WIDTHS = [64, 128, 256, 512]


def feature_dim(version: int) -> int:
    block, _ = RESNET_SPECS[version]
    return 512 if block == "basic" else 2048


def _conv_init(key, shape):
    """torch kaiming_normal_(fan_out, relu) on an OIHW conv -> HWIO here."""
    h, w, cin, cout = shape
    fan_out = h * w * cout
    std = float(np.sqrt(2.0 / fan_out))
    return jax.random.normal(key, shape, jnp.float32) * std


def init_resnet_params(key: jax.Array, version: int):
    """Returns (params, state): flat torch-keyed dicts."""
    block, stages = RESNET_SPECS[version]
    params: Dict[str, jax.Array] = {}
    state: Dict[str, jax.Array] = {}

    def add_conv(name, kh, cin, cout):
        nonlocal key
        key, sub = jax.random.split(key)
        params[name + ".weight"] = _conv_init(sub, (kh, kh, cin, cout))

    def add_bn(name, c):
        params[name + ".weight"] = jnp.ones((c,), jnp.float32)
        params[name + ".bias"] = jnp.zeros((c,), jnp.float32)
        state[name + ".running_mean"] = jnp.zeros((c,), jnp.float32)
        state[name + ".running_var"] = jnp.ones((c,), jnp.float32)

    add_conv("conv1", 7, 3, 64)
    add_bn("bn1", 64)

    in_c = 64
    expansion = 1 if block == "basic" else 4
    for s, n_blocks in enumerate(stages):
        width = STAGE_WIDTHS[s]
        out_c = width * expansion
        for b in range(n_blocks):
            prefix = f"layer{s + 1}.{b}"
            stride = 2 if (b == 0 and s > 0) else 1
            if block == "basic":
                add_conv(f"{prefix}.conv1", 3, in_c, width)
                add_bn(f"{prefix}.bn1", width)
                add_conv(f"{prefix}.conv2", 3, width, width)
                add_bn(f"{prefix}.bn2", width)
            else:
                add_conv(f"{prefix}.conv1", 1, in_c, width)
                add_bn(f"{prefix}.bn1", width)
                add_conv(f"{prefix}.conv2", 3, width, width)
                add_bn(f"{prefix}.bn2", width)
                add_conv(f"{prefix}.conv3", 1, width, out_c)
                add_bn(f"{prefix}.bn3", out_c)
            if b == 0 and (stride != 1 or in_c != out_c):
                add_conv(f"{prefix}.downsample.0", 1, in_c, out_c)
                add_bn(f"{prefix}.downsample.1", out_c)
            in_c = out_c
    return params, state


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(params, state, updates, name, x, training, momentum=0.1, axes=(0, 1, 2)):
    scale = params[name + ".weight"]
    bias = params[name + ".bias"]
    if training:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        updates[name + ".running_mean"] = (1 - momentum) * state[name + ".running_mean"] + momentum * mean
        updates[name + ".running_var"] = (1 - momentum) * state[name + ".running_var"] + momentum * unbiased
    else:
        mean = state[name + ".running_mean"]
        var = state[name + ".running_var"]
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (x - mean) * (inv * scale) + bias


def _max_pool_3x3s2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _forward_impl(version: int, x: jax.Array, unit):
    """Shared backbone traversal.  ``unit(conv_name, bn_name, x, stride,
    padding)`` applies conv (+BN or folded bias)."""
    block, stages = RESNET_SPECS[version]

    if x.shape[-1] == 12:
        # s2d-layout input (emitted by the host pipeline,
        # data/transforms.preprocess_images_s2d): conv1 runs as the
        # exactly-equivalent 4x4/s1 conv on [B,112,112,12]
        # (ops/s2d_stem.py derivation).  unit() resolves the
        # weight transform by name.
        y = unit("conv1", "bn1", x, 1, [(2, 1), (2, 1)])
    else:
        y = unit("conv1", "bn1", x, 2, [(3, 3), (3, 3)])
    y = jax.nn.relu(y)
    y = _max_pool_3x3s2(y)

    for s, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            prefix = f"layer{s + 1}.{b}"
            stride = 2 if (b == 0 and s > 0) else 1
            identity = y
            if block == "basic":
                h = jax.nn.relu(unit(f"{prefix}.conv1", f"{prefix}.bn1", y, stride, [(1, 1), (1, 1)]))
                h = unit(f"{prefix}.conv2", f"{prefix}.bn2", h, 1, [(1, 1), (1, 1)])
            else:
                h = jax.nn.relu(unit(f"{prefix}.conv1", f"{prefix}.bn1", y, 1, [(0, 0), (0, 0)]))
                h = jax.nn.relu(unit(f"{prefix}.conv2", f"{prefix}.bn2", h, stride, [(1, 1), (1, 1)]))
                h = unit(f"{prefix}.conv3", f"{prefix}.bn3", h, 1, [(0, 0), (0, 0)])
            if b == 0 and (stride != 1 or identity.shape[-1] != h.shape[-1]):
                identity = unit(
                    f"{prefix}.downsample.0", f"{prefix}.downsample.1", y, stride, [(0, 0), (0, 0)]
                )
            y = jax.nn.relu(h + identity)
    return y


def resnet_forward(
    params: Dict[str, jax.Array],
    state: Dict[str, jax.Array],
    version: int,
    x: jax.Array,  # [B, H, W, 3] normalized float
    training: bool = False,
):
    """Backbone forward up to the final 7x7 feature map.

    Returns (features [B, 7, 7, C], new_state).
    """
    updates: Dict[str, jax.Array] = {}

    def unit(conv_name, bn_name, h, stride, padding):
        w = params[conv_name + ".weight"]
        if conv_name == "conv1" and h.shape[-1] == 12 and w.shape[2] == 3:
            from show_tell_tpu.ops.s2d_stem import transform_conv1_weight

            w = transform_conv1_weight(w)  # constant-folded under jit
        h = _conv(h, w, stride, padding)
        return _bn(params, state, updates, bn_name, h, training)

    y = _forward_impl(version, x, unit)
    new_state = dict(state)
    new_state.update(updates)
    return y, new_state


def resnet_forward_folded(folded: Dict[str, jax.Array], version: int, x: jax.Array) -> jax.Array:
    """Eval-mode forward on BN-folded params (see models/serving.py)."""

    def unit(conv_name, bn_name, h, stride, padding):
        h = _conv(h, folded[conv_name + ".weight"], stride, padding)
        return h + folded[conv_name + ".bias"]

    return _forward_impl(version, x, unit)


def resnet_params_from_torch(state_dict: Dict[str, Any]):
    """torchvision ResNet state_dict -> (params, state) flat dicts.

    Conv weights OIHW -> HWIO; fc.* and num_batches_tracked are dropped
    (the reference strips fc, cnn.py:34).
    """

    from show_tell_tpu.models.convert import _np  # the one copying helper

    params: Dict[str, jax.Array] = {}
    state: Dict[str, jax.Array] = {}
    for k, v in state_dict.items():
        if k.startswith("fc.") or k.endswith("num_batches_tracked"):
            continue
        arr = _np(v)
        if k.endswith(".weight") and arr.ndim == 4:
            params[k] = jnp.asarray(np.transpose(arr, (2, 3, 1, 0)))  # OIHW->HWIO
        elif k.endswith(".running_mean") or k.endswith(".running_var"):
            state[k] = jnp.asarray(arr)
        else:
            params[k] = jnp.asarray(arr)
    return params, state
