"""Train step: loss decreases, BN stats update, checkpoint roundtrip,
DP-sharded step == single-device step (SURVEY.md §4d-e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from show_tell_tpu.models.captioner import CaptionerConfig
from show_tell_tpu.train.checkpoint import (
    create_checkpoint,
    load_checkpoint,
    restore_train_state,
)
from show_tell_tpu.train.optim import make_optimizer
from show_tell_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

CFG = CaptionerConfig(
    variant="gru",
    resnet_version=18,
    embed_dim=24,
    hidden_dim=32,
    vocab_size=40,
    num_layers=2,
)


def make_batch(rng, B=8, T=12, img=32):
    images = rng.randint(0, 255, (B, img, img, 3), dtype=np.uint8)
    lengths = np.sort(rng.randint(3, T + 1, B))[::-1].astype(np.int32)
    captions = rng.randint(4, CFG.vocab_size, (B, T)).astype(np.int32)
    for i, l in enumerate(lengths):
        captions[i, l:] = 0
        captions[i, 0] = 1
        captions[i, l - 1] = 2
    return images, captions, np.ascontiguousarray(lengths)


@pytest.mark.parametrize("variant", ["gru", "lstm", "attn", "attn_lstm"])
def test_loss_decreases(variant):
    # alpha_c small: on tiny feature maps the doubly-stochastic penalty has
    # a large irreducible floor ((1 - L)^2 with few spatial positions) that
    # would mask the CE trend this test watches.
    cfg = CFG._replace(variant=variant, nos_filters=512, attn_dim=16, alpha_c=0.01)
    opt = make_optimizer("Adam", 1e-2)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, augment=False)
    rng = np.random.RandomState(0)
    images, captions, lengths = make_batch(rng, img=64)
    losses = []
    for _ in range(12):
        ts, loss = step(ts, images, captions, lengths)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses).all()


def test_bn_state_updates_and_backbone_frozen():
    opt = make_optimizer("SGD", 0.01, 0.9)
    ts = create_train_state(jax.random.PRNGKey(1), CFG, opt)
    step = make_train_step(CFG, opt, augment=False)
    images, captions, lengths = make_batch(np.random.RandomState(1))
    frozen_before = jax.tree.map(lambda x: np.asarray(x).copy(), ts.frozen)
    bn_before = np.asarray(ts.bn_state["resnet"]["bn1.running_mean"]).copy()
    ts2, _ = step(ts, images, captions, lengths)
    # Backbone params unchanged...
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b), ts2.frozen, frozen_before
    )
    # ...but BN running stats drifted (reference runs backbone in train mode).
    assert not np.allclose(np.asarray(ts2.bn_state["resnet"]["bn1.running_mean"]), bn_before)
    # And the head DID train.
    w0 = np.asarray(ts.trainable["encoder"]["linear_secondlast_layer"]["w"])
    w1 = np.asarray(ts2.trainable["encoder"]["linear_secondlast_layer"]["w"])
    assert not np.allclose(w0, w1)


def test_eval_step_shapes():
    opt = make_optimizer("Adam", 1e-3)
    ts = create_train_state(jax.random.PRNGKey(2), CFG, opt)
    evaluate = make_eval_step(CFG, augment=False)
    images, captions, lengths = make_batch(np.random.RandomState(2), B=4)
    loss, ids = evaluate(ts, images, captions, lengths, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert ids.shape == (4, CFG.max_caption_length)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < CFG.vocab_size).all()


def test_checkpoint_roundtrip(tmp_path):
    opt = make_optimizer("SGD", 0.01, 0.9)
    ts = create_train_state(jax.random.PRNGKey(3), CFG, opt)
    step = make_train_step(CFG, opt, augment=False)
    images, captions, lengths = make_batch(np.random.RandomState(3))
    ts, _ = step(ts, images, captions, lengths)

    params = {"output_dir": str(tmp_path)}
    path = create_checkpoint(ts, 1, 1, [1.0], params)
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 1 and ckpt["step"] == 1

    ts_fresh = create_train_state(jax.random.PRNGKey(99), CFG, opt)
    ts_restored = restore_train_state(ts_fresh, ckpt)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.trainable,
        ts_restored.trainable,
    )
    # Continuing training from the restored state reproduces the original.
    ts_a, loss_a = step(ts, images, captions, lengths)
    ts_b, loss_b = step(ts_restored._replace(rng=ts.rng), images, captions, lengths)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def _mesh_cfg(variant):
    """Single-layer tiny config per variant.  Attention uses the
    test_loss_decreases settings (small alpha_c; see comment there) and
    exercises the variant-specific params under sharding: attn
    projections, init_h/init_c, the alpha penalty's gradients."""
    cfg = CFG._replace(variant=variant, num_layers=1)
    if cfg.is_attention:
        cfg = cfg._replace(nos_filters=512, attn_dim=16, alpha_c=0.01)
    return cfg


@pytest.mark.parametrize("variant", ["gru", "attn", "attn_lstm"])
def test_dp_sharded_step_matches_single_device(variant):
    """8-device dp mesh must produce the same params as 1 device."""
    from show_tell_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert len(jax.devices()) >= 8
    opt = make_optimizer("SGD", 0.01, 0.9)
    cfg = _mesh_cfg(variant)
    step = make_train_step(cfg, opt, augment=False)
    images, captions, lengths = make_batch(np.random.RandomState(4), B=8, img=64 if cfg.is_attention else 32)

    ts_single = create_train_state(jax.random.PRNGKey(5), cfg, opt)
    ts_a, loss_a = step(ts_single, images, captions, lengths)

    mesh = make_mesh(dp=8)
    ts_sharded = replicate(mesh, create_train_state(jax.random.PRNGKey(5), cfg, opt))
    sb = shard_batch(mesh, images, captions, lengths)
    ts_b, loss_b = step(ts_sharded, *sb)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        ts_a.trainable,
        ts_b.trainable,
    )


@pytest.mark.parametrize("variant", ["gru", "attn", "attn_lstm"])
def test_tp_dp_hybrid_step_matches_single_device(variant):
    """dp=4 x mp=2 mesh with vocab-sharded decoder params must reproduce
    the single-device step (GSPMD inserts the collectives)."""
    from show_tell_tpu.parallel.mesh import make_mesh, shard_batch, shard_train_state

    assert len(jax.devices()) >= 8
    # SGD: Adam's first-step update is effectively sign(grad), which
    # amplifies float-reduction noise into full-size mismatches.
    opt = make_optimizer("SGD", 0.01, 0.9)
    cfg = _mesh_cfg(variant)
    step = make_train_step(cfg, opt, augment=False)
    images, captions, lengths = make_batch(np.random.RandomState(7), B=8, img=64 if cfg.is_attention else 32)

    ts_single = create_train_state(jax.random.PRNGKey(8), cfg, opt)
    ts_a, loss_a = step(ts_single, images, captions, lengths)

    mesh = make_mesh(dp=4, mp=2)
    ts_tp = shard_train_state(
        mesh, create_train_state(jax.random.PRNGKey(8), cfg, opt), tensor_parallel=True
    )
    # Sharding sanity: the vocab projection is split over mp.
    w_sh = ts_tp.trainable["decoder"]["linear"]["w"].sharding
    assert "mp" in (w_sh.spec[1],), w_sh
    sb = shard_batch(mesh, images, captions, lengths)
    ts_b, loss_b = step(ts_tp, *sb)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        ts_a.trainable,
        ts_b.trainable,
    )


def test_bf16_train_step_mixed_precision():
    """--train_dtype bfloat16 (train_step.make_train_step compute_dtype):
    bf16 forward/backward with f32 master weights — loss decreases, the
    TrainState stays f32 end-to-end (weights, optimizer, BN running
    stats), and the loss tracks the f32 step closely at identical
    inputs (same exponent range, no loss scaling)."""
    opt = make_optimizer("Adam", 1e-2)
    ts16 = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    ts32 = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step16 = make_train_step(CFG, opt, augment=False, compute_dtype=jnp.bfloat16)
    step32 = make_train_step(CFG, opt, augment=False)
    rng = np.random.RandomState(1)
    images, captions, lengths = make_batch(rng, img=64)
    losses16, losses32 = [], []
    for _ in range(12):
        ts16, l16 = step16(ts16, images, captions, lengths)
        ts32, l32 = step32(ts32, images, captions, lengths)
        losses16.append(float(l16))
        losses32.append(float(l32))
    assert np.isfinite(losses16).all()
    assert losses16[-1] < losses16[0] * 0.8, losses16
    # master state stays f32: every float leaf of weights/opt/BN
    for leaf in jax.tree.leaves((ts16.trainable, ts16.frozen, ts16.bn_state, ts16.opt_state)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
    # the bf16 loss trajectory tracks f32 (rounding-level divergence
    # compounds over steps; first-step losses must agree tightly)
    assert abs(losses16[0] - losses32[0]) < 0.05 * abs(losses32[0]) + 0.05, (
        losses16[0], losses32[0])
