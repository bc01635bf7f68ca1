"""BN folding: folded serving forward == eval-mode forward."""

import numpy as np

import jax
import jax.numpy as jnp

from show_tell_tpu.models.encoder import EncoderConfig, encoder_forward, init_encoder_params
from show_tell_tpu.models.serving import fold_encoder, folded_encoder_forward


def _randomized_state(key, state):
    """Perturb running stats so folding is tested against nontrivial BN."""
    leaves, treedef = jax.tree.flatten(state)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, leaf in zip(keys, leaves):
        if leaf.min() >= 1.0:  # running_var init
            out.append(leaf * jax.random.uniform(k, leaf.shape, minval=0.5, maxval=2.0))
        else:  # running_mean init
            out.append(leaf + jax.random.normal(k, leaf.shape) * 0.1)
    return jax.tree.unflatten(treedef, out)


def test_folded_matches_eval_pooled():
    cfg = EncoderConfig(resnet_version=18, embed_dim=16, spatial=False)
    params, state = init_encoder_params(jax.random.PRNGKey(0), cfg)
    state = _randomized_state(jax.random.PRNGKey(1), state)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))

    ref, _ = encoder_forward(params, state, cfg, x, training=False)
    folded = fold_encoder(params, state)
    got = folded_encoder_forward(folded, 18, x, spatial=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_folded_matches_eval_spatial():
    cfg = EncoderConfig(resnet_version=50, embed_dim=16, spatial=True)
    params, state = init_encoder_params(jax.random.PRNGKey(2), cfg)
    state = _randomized_state(jax.random.PRNGKey(3), state)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32))

    ref, _ = encoder_forward(params, state, cfg, x, training=False)
    folded = fold_encoder(params, state)
    got = folded_encoder_forward(folded, 50, x, spatial=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
