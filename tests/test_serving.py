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


def test_make_test_step_early_exit_ids_match_all_variants():
    """The eval-path early_exit decode (make_test_step early_exit=True,
    the serving while_loop greedy) must agree with the fixed-25-step
    parity decode on every variant: identical ids up to and including
    each row's first <end>, <pad> after (caption output identical)."""
    from show_tell_tpu.evaluation.tester import make_test_step
    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state

    rng = np.random.RandomState(0)
    B, T = 4, 8
    images = rng.randint(0, 255, (B, 32, 32, 3), dtype=np.uint8)
    captions = rng.randint(4, 20, (B, T)).astype(np.int32)
    lengths = np.sort(rng.randint(3, T + 1, B))[::-1].astype(np.int32).copy()
    key = jax.random.PRNGKey(3)

    for variant in ["gru", "lstm", "attn", "attn_lstm"]:
        kw = dict(nos_filters=512, attn_dim=12) if variant.startswith("attn") else {}
        cfg = CaptionerConfig(variant, 18, 10, 12, 20, 2, **kw)
        ts = create_train_state(jax.random.PRNGKey(1), cfg, make_optimizer("SGD", 0.01, 0.9))
        args = (ts.trainable, ts.frozen, ts.bn_state, images, captions, lengths, key)
        loss_a, ids_a = make_test_step(cfg, 0, augment=False)(*args)
        loss_b, ids_b = make_test_step(cfg, 0, augment=False, early_exit=True)(*args)
        assert float(loss_a) == float(loss_b), variant
        ids_a, ids_b = np.asarray(ids_a), np.asarray(ids_b)
        for b in range(B):
            ends = np.where(ids_a[b] == 2)[0]
            upto = (ends[0] + 1) if len(ends) else ids_a.shape[1]
            np.testing.assert_array_equal(ids_b[b, :upto], ids_a[b, :upto], err_msg=variant)
            assert (ids_b[b, upto:] == 0).all(), variant
