"""The jitted train / eval steps.

One XLA program per step (reference main.py:136-152 inlined the same work
as eager torch ops): device-side image preprocessing, encoder forward with
BN stat updates, decoder scan, masked CE (+ attention penalty), backward
over the trainable subtree only, optimizer update.  Data parallelism falls
out of input shardings (see parallel/mesh.py) — no code changes.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from show_tell_tpu.data.transforms import preprocess_images
from show_tell_tpu.models.captioner import (
    CaptionerConfig,
    captioner_greedy_decode,
    captioner_loss,
    init_captioner,
    merge_params,
    split_trainable,
)


class TrainState(NamedTuple):
    trainable: Any  # decoder + encoder head params
    frozen: Any  # resnet backbone params
    bn_state: Any  # encoder BN running stats
    opt_state: Any
    rng: jax.Array
    step: jax.Array  # int32 scalar


def create_train_state(
    key: jax.Array, cfg: CaptionerConfig, optimizer: optax.GradientTransformation
) -> TrainState:
    k_init, k_rng = jax.random.split(key)
    params, bn_state = init_captioner(k_init, cfg)
    trainable, frozen = split_trainable(params)
    opt_state = optimizer.init(trainable)
    return TrainState(trainable, frozen, bn_state, opt_state, k_rng, jnp.int32(0))


def make_train_step(
    cfg: CaptionerConfig,
    optimizer: optax.GradientTransformation,
    augment: bool = True,
    compute_dtype=None,
):
    """Returns jitted step(ts, images_u8, captions, lengths) -> (ts, loss).

    compute_dtype (`--train_dtype bfloat16`): mixed-precision training in
    the TPU-idiomatic form — master weights, gradients, and the optimizer
    stay f32 (the cast sits INSIDE loss_fn, so the backward pass upcasts
    cotangents on the way out), while the forward/backward compute runs
    in bf16.  No loss scaling: bf16 keeps f32's exponent range.  The
    loss-critical reductions stay f32 regardless (vocab projection uses
    preferred_element_type=f32; CE/logsumexp runs on those f32 logits),
    and BN running stats stay f32 (the pooled head's BN input is the f32
    projection output).  f32 is the default and the parity dtype —
    matmuls already take the bf16 MXU pass under jax default precision,
    so what bf16 buys is the activation/weight HBM stream, not FLOPs;
    see bench.py --train --bf16 for the measured A/B."""
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def loss_fn(trainable, frozen, bn_state, images, captions, lengths):
        params = merge_params(trainable, frozen)
        if cd is not None:
            params = jax.tree.map(
                lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params
            )
            images = images.astype(cd)
        return captioner_loss(params, bn_state, cfg, images, captions, lengths, training=True)

    # Note: no donate_argnums — donation of the TrainState measured
    # perf-neutral here (temp memory is 2.2GB of 16GB HBM) and it breaks
    # re-stepping from a held state.
    @jax.jit
    def step(ts: TrainState, images_u8, captions, lengths) -> Tuple[TrainState, jax.Array]:
        next_rng, k_aug = jax.random.split(ts.rng)
        images = preprocess_images(images_u8, k_aug, augment=augment)
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.trainable, ts.frozen, ts.bn_state, images, captions, lengths
        )
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.trainable)
        trainable = optax.apply_updates(ts.trainable, updates)
        return TrainState(trainable, ts.frozen, new_bn, opt_state, next_rng, ts.step + 1), loss

    return step


def make_eval_step(cfg: CaptionerConfig, augment: bool = True):
    """Returns jitted eval(ts, images_u8, captions, lengths, key) ->
    (loss, decoded_ids).  BN in eval mode (reference main.py:163-164);
    the reference *does* keep random flips at test time (utils.py:96) —
    ``augment`` mirrors that, with the key passed in for determinism."""

    @jax.jit
    def evaluate(ts: TrainState, images_u8, captions, lengths, key):
        images = preprocess_images(images_u8, key, augment=augment)
        params = merge_params(ts.trainable, ts.frozen)
        loss, _ = captioner_loss(params, ts.bn_state, cfg, images, captions, lengths, training=False)
        ids = captioner_greedy_decode(params, ts.bn_state, cfg, images)
        return loss, ids

    return evaluate
