"""Image encoders: frozen ResNet backbone + trainable Linear/BatchNorm head.

Mirrors reference cnn.py (pooled) and Attention/cnn_attn.py (spatial):
  * backbone output is wrapped in ``stop_gradient`` — the reference detaches
    it (``Variable(x.data)``, cnn.py:47) so gradients reach only the head;
  * pooled mode: avgpool -> Linear(C->embed) -> BatchNorm1d(embed,
    momentum=0.01) (cnn.py:37-38); head init = weight ~ N(0, 0.05)
    (cnn.py:41), bias torch-default, BN bias zeroed (cnn.py:42);
  * spatial mode returns [B, C, 49] raw features (cnn_attn.py:49); the
    Linear/BN head is still *created* (and optimized — dead params) to stay
    checkpoint-compatible with the reference's registered-but-unused head
    (cnn_attn.py:37-38,50, main_attn.py:90).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from show_tell_tpu.models.resnet import (
    BN_EPS,
    feature_dim,
    init_resnet_params,
    resnet_forward,
    resnet_params_from_torch,
)

HEAD_BN_MOMENTUM = 0.01  # reference cnn.py:38


class EncoderConfig(NamedTuple):
    resnet_version: int
    embed_dim: int
    spatial: bool = False  # False: cnn.py pooled; True: cnn_attn.py [B,C,49]


def init_encoder_params(key: jax.Array, cfg: EncoderConfig):
    k_res, k_w, k_b = jax.random.split(key, 3)
    res_params, res_state = init_resnet_params(k_res, cfg.resnet_version)
    C = feature_dim(cfg.resnet_version)
    bound = 1.0 / (C ** 0.5)
    params = {
        "resnet": res_params,
        "linear_secondlast_layer": {
            "w": jax.random.normal(k_w, (C, cfg.embed_dim), jnp.float32) * 0.05,
            "b": jax.random.uniform(k_b, (cfg.embed_dim,), minval=-bound, maxval=bound, dtype=jnp.float32),
        },
        "last_layer": {
            "weight": jnp.ones((cfg.embed_dim,), jnp.float32),
            "bias": jnp.zeros((cfg.embed_dim,), jnp.float32),
        },
    }
    state = {
        "resnet": res_state,
        "last_layer": {
            "running_mean": jnp.zeros((cfg.embed_dim,), jnp.float32),
            "running_var": jnp.ones((cfg.embed_dim,), jnp.float32),
        },
    }
    return params, state


def _bn1d(params, state, x, training, momentum=HEAD_BN_MOMENTUM):
    """BatchNorm1d over [B, F]; returns (y, new_state)."""
    if training:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (x - mean) * (inv * params["weight"]) + params["bias"], new_state


def encoder_forward(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: EncoderConfig,
    images: jax.Array,  # [B, 224, 224, 3] normalized float, NHWC
    training: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Returns (features, new_state).

    Pooled: [B, embed].  Spatial: [B, C, 49] with position p = 7*row + col
    (torch row-major flatten of the [B, C, 7, 7] map, cnn_attn.py:49).
    """
    fmap, res_state = resnet_forward(params["resnet"], state["resnet"], cfg.resnet_version, images, training)
    fmap = jax.lax.stop_gradient(fmap)  # cnn.py:47 detach

    if cfg.spatial:
        B, H, W, C = fmap.shape
        feats = jnp.transpose(fmap, (0, 3, 1, 2)).reshape(B, C, H * W)
        return feats, {"resnet": res_state, "last_layer": state["last_layer"]}

    pooled = jnp.mean(fmap, axis=(1, 2))  # adaptive avgpool to 1x1 (cnn.py:34 keeps avgpool)
    h = jnp.dot(pooled, params["linear_secondlast_layer"]["w"], preferred_element_type=jnp.float32)
    h = h + params["linear_secondlast_layer"]["b"]
    out, bn_state = _bn1d(params["last_layer"], state["last_layer"], h, training)
    return out, {"resnet": res_state, "last_layer": bn_state}


def encoder_params_from_torch(state_dict: Dict[str, Any], cfg: EncoderConfig):
    """Reference cnn.ResNet state_dict -> (params, state).

    Reference keys: 'model.N.*' (Sequential-wrapped torchvision layers,
    cnn.py:34), 'linear_secondlast_layer.*', 'last_layer.*'.  The
    Sequential index N maps back to torchvision names positionally:
    0=conv1 1=bn1 4..7=layer1..4 (2=relu, 3=maxpool have no params).
    """
    from show_tell_tpu.models.convert import _np  # the one copying helper

    seq_map = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4"}
    tv_sd = {}
    head_lin = {}
    head_bn_p = {}
    head_bn_s = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            rest = k[len("model."):]
            idx, _, tail = rest.partition(".")
            name = seq_map.get(idx)
            if name is None:
                continue
            tv_sd[name + "." + tail if tail else name] = v
        elif k == "linear_secondlast_layer.weight":
            head_lin["w"] = jnp.asarray(_np(v).T)
        elif k == "linear_secondlast_layer.bias":
            head_lin["b"] = jnp.asarray(_np(v))
        elif k == "last_layer.weight":
            head_bn_p["weight"] = jnp.asarray(_np(v))
        elif k == "last_layer.bias":
            head_bn_p["bias"] = jnp.asarray(_np(v))
        elif k == "last_layer.running_mean":
            head_bn_s["running_mean"] = jnp.asarray(_np(v))
        elif k == "last_layer.running_var":
            head_bn_s["running_var"] = jnp.asarray(_np(v))
    res_params, res_state = resnet_params_from_torch(tv_sd)
    params = {
        "resnet": res_params,
        "linear_secondlast_layer": head_lin,
        "last_layer": head_bn_p,
    }
    state = {"resnet": res_state, "last_layer": head_bn_s}
    return params, state
