"""Caption decoders (GRU / LSTM families) — reference rnn.py / LSTM/rnn_lstm.py.

Train-time semantics replicate the reference exactly (rnn.py:27-35):
the image feature is *prepended* as the step-0 input, so position j of the
unrolled RNN consumes ``feat`` (j=0) or ``emb(w_{j-1})`` (j>0) and is
trained to predict caption token w_j — proper next-token prediction.
torch's pack_padded_sequence keeps exactly ``length`` positions per sample
(the final concat position drops out); here that is a validity mask
``j < length`` over a fixed [B, T] grid, and the packed-CE "mean over all
packed tokens" becomes masked-sum / total-valid-tokens (identical value).

Decode (rnn.py:37-58): 25 fixed greedy steps, argmax feedback, no <end>
early exit — one `lax.scan`, fully batched on device.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from show_tell_tpu.models.rnn_cells import (
    init_rnn_params,
    init_state,
    rnn_scan,
    stack_step,
)


class DecoderConfig(NamedTuple):
    cell_type: str  # 'gru' | 'lstm'
    embed_dim: int
    hidden_dim: int
    vocab_size: int
    num_layers: int
    max_caption_length: int = 25  # reference rnn.py:39


def init_decoder_params(key: jax.Array, cfg: DecoderConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Init matching torch defaults: Embedding ~ N(0,1); Linear ~ torch
    kaiming-uniform == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight+bias."""
    k_emb, k_rnn, k_w, k_b = jax.random.split(key, 4)
    bound = 1.0 / (cfg.hidden_dim ** 0.5)
    return {
        "embedding": jax.random.normal(k_emb, (cfg.vocab_size, cfg.embed_dim), dtype),
        "rnn": init_rnn_params(k_rnn, cfg.cell_type, cfg.embed_dim, cfg.hidden_dim, cfg.num_layers, dtype),
        "linear": {
            "w": jax.random.uniform(k_w, (cfg.hidden_dim, cfg.vocab_size), minval=-bound, maxval=bound, dtype=dtype),
            "b": jax.random.uniform(k_b, (cfg.vocab_size,), minval=-bound, maxval=bound, dtype=dtype),
        },
    }


def decoder_forward(
    params: Dict[str, Any],
    cfg: DecoderConfig,
    cnn_feature: jax.Array,  # [B, E]
    captions: jax.Array,  # [B, T] int32
    lengths: jax.Array,  # [B] int32
) -> jax.Array:
    """Teacher-forced logits [B, T, V]; position j predicts captions[:, j].

    Only positions j < lengths are meaningful (mask applied by the loss).
    """
    emb = params["embedding"][captions]  # [B, T, E]
    # Prepend the image feature, drop the last embedding (never consumed:
    # pack keeps `length` inputs from the length+1 concat, rnn.py:30-31).
    inputs = jnp.concatenate([cnn_feature.astype(emb.dtype)[:, None, :], emb[:, :-1, :]], axis=1)
    state = init_state(cfg.cell_type, cfg.num_layers, captions.shape[0], cfg.hidden_dim, inputs.dtype)
    outs, _ = rnn_scan(params["rnn"], cfg.cell_type, inputs, state)
    return jnp.dot(outs, params["linear"]["w"], preferred_element_type=jnp.float32) + params["linear"]["b"]


def masked_cross_entropy(logits: jax.Array, targets: jax.Array, lengths: jax.Array) -> jax.Array:
    """Mean CE over valid (packed) positions — matches torch
    CrossEntropyLoss over pack_padded_sequence data (main.py:145,149)."""
    T = logits.shape[1]
    mask = jnp.arange(T)[None, :] < lengths[:, None]  # [B, T]
    logz = jax.nn.logsumexp(logits, axis=-1)  # [B, T]
    tok_logp = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = logz - tok_logp
    return jnp.sum(nll * mask) / jnp.sum(mask)


def greedy_decode(
    params: Dict[str, Any],
    cfg: DecoderConfig,
    cnn_feature: jax.Array,  # [B, E]
    end_token: "int | None" = None,
) -> jax.Array:
    """Batched greedy decode, 25 fixed steps (reference rnn.py:44-58).

    end_token (serving extension, off by default): stop as soon as every
    sequence has emitted <end> (`lax.while_loop` instead of the fixed
    scan).  Positions after a sequence's first <end> are <pad> instead of
    the reference's dont-care argmax continuations — downstream caption
    formatting truncates at <end>, so caption OUTPUT is identical while a
    trained model (mean caption ~12 tokens) skips ~half the steps.
    """
    B = cnn_feature.shape[0]
    T = cfg.max_caption_length
    step_fn = stack_step(cfg.cell_type)
    dtype = params["embedding"].dtype
    cnn_feature = cnn_feature.astype(dtype)
    state = init_state(cfg.cell_type, cfg.num_layers, B, cfg.hidden_dim, dtype)

    def step(x, st):
        top, st2 = step_fn(params["rnn"], x, st)
        logits = jnp.dot(top, params["linear"]["w"], preferred_element_type=jnp.float32) + params["linear"]["b"]
        return jnp.argmax(logits, axis=-1), st2  # [B]

    if end_token is None:

        def body(carry, _):
            x, st = carry
            tok, st2 = step(x, st)
            return (params["embedding"][tok], st2), tok

        (_, _), toks = jax.lax.scan(body, (cnn_feature, state), None, length=T)
        return jnp.swapaxes(toks, 0, 1)  # [B, 25]

    return greedy_early_exit_loop(step, params["embedding"], cnn_feature, state, B, T, end_token)


def greedy_early_exit_loop(step, embedding, x0, state0, B: int, T: int, end_token: int) -> jax.Array:
    """Shared `lax.while_loop` greedy engine for the early-exit decode
    paths (XLA and Pallas, pooled and attention): run ``step(x, st) ->
    (tok, st2)`` until every row has emitted ``end_token`` (or T steps),
    feeding back ``embedding[tok]``.  Positions after a row's first
    <end> are <pad>; rows and steps before that are identical to the
    fixed-T scan (pinned by test)."""

    def cond(carry):
        t, _, _, _, done = carry
        return jnp.logical_and(t < T, ~jnp.all(done))

    def body(carry):
        t, x, st, toks, done = carry
        tok, st2 = step(x, st)
        tok = jnp.where(done, 0, tok)  # <pad> after <end>
        toks = jax.lax.dynamic_update_slice(toks, tok[:, None].astype(jnp.int32), (0, t))
        return (t + 1, embedding[tok], st2, toks, done | (tok == end_token))

    toks0 = jnp.zeros((B, T), jnp.int32)
    done0 = jnp.zeros((B,), bool)
    _, _, _, toks, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, state0, toks0, done0))
    return toks
