"""Serving-time graph transforms: BatchNorm folding + dtype casting.

For inference the encoder's BatchNorms run in eval mode (affine in the
running stats), so each conv+BN pair folds into a single biased conv:

    w' = w * scale / sqrt(var + eps)        (per output channel)
    b' = bias - mean * scale / sqrt(var + eps)

This removes every BN elementwise pass from the serving path and lets XLA
fuse the bias add into the convolution epilogue.  The head Linear+BN1d
folds the same way.  Folded params are a *different* pytree (convs carry
``.bias`` keys, BNs are gone); ``resnet_forward``/``encoder_forward``
detect it via the ``folded`` flag.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from show_tell_tpu.models.resnet import BN_EPS


def fold_resnet_bn(params: Dict[str, jax.Array], state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Flat torch-keyed resnet params/state -> folded biased-conv params."""
    folded: Dict[str, jax.Array] = {}
    for k, w in params.items():
        if not (k.endswith(".weight") and w.ndim == 4):
            continue
        conv = k[: -len(".weight")]
        # Find the BN that follows this conv by torchvision naming.
        if conv == "conv1":
            bn = "bn1"
        elif conv.endswith(".downsample.0"):
            bn = conv[: -1] + "1"
        else:  # layerX.Y.convN -> layerX.Y.bnN
            bn = conv.replace(".conv", ".bn")
        scale = params[bn + ".weight"]
        bias = params[bn + ".bias"]
        mean = state[bn + ".running_mean"]
        var = state[bn + ".running_var"]
        mult = scale * jax.lax.rsqrt(var + BN_EPS)  # [Cout]
        folded[k] = w * mult[None, None, None, :]
        folded[conv + ".bias"] = bias - mean * mult
    return folded


def fold_encoder(params: Dict[str, Any], state: Dict[str, Any], dtype=None) -> Dict[str, Any]:
    """Full encoder params+state -> folded serving params (no state needed).

    The pooled head's Linear+BatchNorm1d also folds:
        y = BN(x W + b)  ==  x (W * m) + ((b - mean) * m + beta),
    m = gamma / sqrt(var + eps).
    """
    res = fold_resnet_bn(params["resnet"], state["resnet"])
    lin_w = params["linear_secondlast_layer"]["w"]
    lin_b = params["linear_secondlast_layer"]["b"]
    bn = params["last_layer"]
    bs = state["last_layer"]
    m = bn["weight"] * jax.lax.rsqrt(bs["running_var"] + BN_EPS)
    head = {
        "w": lin_w * m[None, :],
        "b": (lin_b - bs["running_mean"]) * m + bn["bias"],
    }
    out = {"resnet": res, "head": head}
    if dtype is not None:
        out = jax.tree.map(lambda x: x.astype(dtype), out)
    return out


def folded_encoder_forward(folded: Dict[str, Any], version: int, images: jax.Array, spatial: bool = False):
    """Eval-mode encoder forward on folded params (no BN, no state)."""
    from show_tell_tpu.models.resnet import resnet_forward_folded

    fmap = resnet_forward_folded(folded["resnet"], version, images)
    if spatial:
        B, H, W, C = fmap.shape
        return jnp.transpose(fmap, (0, 3, 1, 2)).reshape(B, C, H * W)
    pooled = jnp.mean(fmap, axis=(1, 2))
    h = jnp.dot(pooled, folded["head"]["w"], preferred_element_type=jnp.float32) + folded["head"]["b"]
    return h.astype(pooled.dtype)
