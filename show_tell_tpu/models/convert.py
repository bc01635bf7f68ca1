"""torch <-> JAX parameter converters.

Lets reference-trained checkpoints (torch.save dicts, utils.py:131-138)
load into this framework and vice versa.  Key names follow the reference
modules: decoder ``embeddings.weight / unit.weight_ih_l{k} / unit.weight_hh_l{k}
/ unit.bias_ih_l{k} / unit.bias_hh_l{k} / linear.weight / linear.bias``
(rnn.py:23-25), attention decoder adds ``init_h / attn.* / embed``
(Attention/rnn_attn.py:49-58), encoder ``model.* / linear_secondlast_layer.*
/ last_layer.*`` (cnn.py:34-38) in torchvision ResNet layout.

All functions accept either torch tensors or numpy arrays (torch optional).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        # Copy: .numpy() views torch memory, and jnp.asarray can be
        # zero-copy on CPU — later in-place torch mutations (e.g. BN
        # running-stat updates) must not leak into converted params.
        return np.array(x.detach().cpu().numpy())
    return np.asarray(x)


def decoder_params_from_torch(state_dict: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Reference RNN/LSTM decoder state_dict -> our decoder params pytree."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    layers = []
    for l in range(num_layers):
        layers.append(
            {
                "w_ih": jnp.asarray(sd[f"unit.weight_ih_l{l}"].T),
                "w_hh": jnp.asarray(sd[f"unit.weight_hh_l{l}"].T),
                "b_ih": jnp.asarray(sd[f"unit.bias_ih_l{l}"]),
                "b_hh": jnp.asarray(sd[f"unit.bias_hh_l{l}"]),
            }
        )
    return {
        "embedding": jnp.asarray(sd["embeddings.weight"]),
        "rnn": layers,
        "linear": {"w": jnp.asarray(sd["linear.weight"].T), "b": jnp.asarray(sd["linear.bias"])},
    }


def decoder_params_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our decoder params -> reference-keyed numpy state dict."""
    out: Dict[str, np.ndarray] = {
        "embeddings.weight": _np(params["embedding"]),
        "linear.weight": _np(params["linear"]["w"]).T,
        "linear.bias": _np(params["linear"]["b"]),
    }
    for l, layer in enumerate(params["rnn"]):
        out[f"unit.weight_ih_l{l}"] = _np(layer["w_ih"]).T
        out[f"unit.weight_hh_l{l}"] = _np(layer["w_hh"]).T
        out[f"unit.bias_ih_l{l}"] = _np(layer["b_ih"])
        out[f"unit.bias_hh_l{l}"] = _np(layer["b_hh"])
    return out


def linear_from_torch(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "w": jnp.asarray(_np(sd[prefix + ".weight"]).T),
        "b": jnp.asarray(_np(sd[prefix + ".bias"])),
    }


def attn_decoder_params_from_torch(state_dict: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Reference RNN_Attn state_dict -> our attention decoder params."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    base = decoder_params_from_torch(sd, num_layers)
    base["init_h"] = linear_from_torch(sd, "init_h")
    if "init_c.weight" in sd:
        base["init_c"] = linear_from_torch(sd, "init_c")
    base["embed"] = linear_from_torch(sd, "embed")
    base["attn"] = {
        "encoder_att": linear_from_torch(sd, "attn.encoder_att"),
        "decoder_att": linear_from_torch(sd, "attn.decoder_att"),
        "full_att": linear_from_torch(sd, "attn.full_att"),
    }
    return base
