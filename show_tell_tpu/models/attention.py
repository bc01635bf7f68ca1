"""Soft-attention caption decoders — reference Attention/rnn_attn.py and
Attention/rnn_attn_LSTM.py, rebuilt as lax.scan programs.

Components (Attention/rnn_attn.py:8-58):
  * additive (Bahdanau) attention: Linear(2048->A) on features,
    Linear(H->A) on the last-layer hidden, LeakyReLU(0.2), Linear(A->1),
    softmax over the 49 spatial positions; context = alpha-weighted feature
    sum (rnn_attn.py:21-31);
  * decoder: GRU/LSTM(2E, H, L) over cat(word_embedding, Linear(2048->E)
    of the context) (rnn_attn.py:50,58,70); hidden init =
    Linear(2048->H)(mean-pooled features) repeated across layers
    (rnn_attn.py:54,62), LSTM adds init_c (rnn_attn_LSTM.py:55,63).

Faithful reference semantics preserved on purpose:
  * TRAINING ALIGNMENT QUIRK: step t consumes caption token w_t as input
    and is trained to predict the same w_t (rnn_attn.py:70 + packed target
    from the same caption, main_attn.py:126) — NOT next-token.  See
    SURVEY.md §3.2.
  * the shrinking-batch trick (rnn_attn.py:68-74) freezes hidden state for
    finished sequences and leaves zeros in predictions/alphas rows at
    t >= length — here a `where` mask, exactly equivalent on a sorted or
    unsorted batch;
  * decode runs 25 fixed steps from the <start> embedding with argmax
    feedback (rnn_attn.py:77-94), no <end> early exit.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from show_tell_tpu.models.rnn_cells import init_rnn_params, stack_step


class AttnDecoderConfig(NamedTuple):
    cell_type: str  # 'gru' | 'lstm'
    embed_dim: int
    nos_filters: int  # CNN channels (2048)
    attention_dim: int
    hidden_dim: int
    vocab_size: int
    num_layers: int
    max_caption_length: int = 25  # rnn_attn.py:53


def _linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    bound = 1.0 / (in_dim ** 0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=dtype),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound, dtype=dtype),
    }


def _linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def init_attn_decoder_params(key: jax.Array, cfg: AttnDecoderConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 9)
    params = {
        "embedding": jax.random.normal(ks[0], (cfg.vocab_size, cfg.embed_dim), dtype),
        "rnn": init_rnn_params(ks[1], cfg.cell_type, 2 * cfg.embed_dim, cfg.hidden_dim, cfg.num_layers, dtype),
        "linear": _linear_init(ks[2], cfg.hidden_dim, cfg.vocab_size, dtype),
        "init_h": _linear_init(ks[3], cfg.nos_filters, cfg.hidden_dim, dtype),
        "embed": _linear_init(ks[4], cfg.nos_filters, cfg.embed_dim, dtype),
        "attn": {
            "encoder_att": _linear_init(ks[5], cfg.nos_filters, cfg.attention_dim, dtype),
            "decoder_att": _linear_init(ks[6], cfg.hidden_dim, cfg.attention_dim, dtype),
            "full_att": _linear_init(ks[7], cfg.attention_dim, 1, dtype),
        },
    }
    if cfg.cell_type == "lstm":
        params["init_c"] = _linear_init(ks[8], cfg.nos_filters, cfg.hidden_dim, dtype)
    return params


def attention_net(attn_params: Dict[str, Any], img_feat: jax.Array, hidden: jax.Array):
    """img_feat: [B, P, C] (positions-major, i.e. cnn_feature.transpose(1,2)),
    hidden: [B, H].  Returns (context [B, C], alpha [B, P])."""
    att1 = _linear(attn_params["encoder_att"], img_feat)  # [B, P, A]
    return attention_net_hoisted(attn_params, img_feat, att1, hidden)


def attention_net_hoisted(
    attn_params: Dict[str, Any], img_feat: jax.Array, att1: jax.Array, hidden: jax.Array
):
    """Attention with the encoder-side projection ``att1`` precomputed.

    att1 is constant across decode/teacher-forcing steps for a given
    image; the reference recomputes it every step (rnn_attn.py:23,69).
    Hoisting it out of the time loop removes the largest matmul in the
    step ([B,P,C]x[C,A]) with bit-identical results.
    """
    att2 = _linear(attn_params["decoder_att"], hidden)  # [B, A]
    act = jax.nn.leaky_relu(att1 + att2[:, None, :], negative_slope=0.2)
    e = _linear(attn_params["full_att"], act)[..., 0]  # [B, P]
    alpha = jax.nn.softmax(e, axis=1)
    context = jnp.sum(img_feat * alpha[..., None], axis=1)  # [B, C]
    return context, alpha


def _init_hidden(params: Dict[str, Any], cfg: AttnDecoderConfig, cnn_feature: jax.Array):
    """cnn_feature: [B, C, P].  hidden = init_h(mean over positions),
    repeated across layers (rnn_attn.py:54,62)."""
    dtype = params["embedding"].dtype  # compute dtype (bf16 in fast serving)
    pooled = jnp.mean(cnn_feature, axis=2)  # [B, C]
    h0 = _linear(params["init_h"], pooled).astype(dtype)  # [B, H]
    hs = jnp.broadcast_to(h0[None], (cfg.num_layers,) + h0.shape)
    if cfg.cell_type == "lstm":
        c0 = _linear(params["init_c"], pooled).astype(dtype)
        cs = jnp.broadcast_to(c0[None], (cfg.num_layers,) + c0.shape)
        return (hs, cs)
    return hs


def _last_h(state, cell_type):
    hs = state[0] if cell_type == "lstm" else state
    return hs[-1]  # hidden[:, -1, :] in reference layout (rnn_attn.py:69)


def attn_decoder_forward(
    params: Dict[str, Any],
    cfg: AttnDecoderConfig,
    cnn_feature: jax.Array,  # [B, C, P]
    captions: jax.Array,  # [B, T] int32
    lengths: jax.Array,  # [B] int32
) -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced pass.  Returns (predictions [B,T,V], alphas [B,T,P]).

    predictions[:, t] predicts caption token t from input token t (the
    reference's w_t -> w_t alignment, SURVEY.md §3.2); rows with t >=
    lengths are zero, like the reference's preallocated zero tensors
    (rnn_attn.py:64-65).
    """
    B, T = captions.shape
    feats_pm = jnp.swapaxes(cnn_feature, 1, 2)  # [B, P, C] positions-major
    att1 = _linear(params["attn"]["encoder_att"], feats_pm)  # hoisted: constant over t
    emb = params["embedding"][captions]  # [B, T, E]
    state0 = _init_hidden(params, cfg, cnn_feature)
    step_fn = stack_step(cfg.cell_type)

    def body(carry, xt):
        t, st = carry
        w_emb = xt  # [B, E]
        context, alpha = attention_net_hoisted(params["attn"], feats_pm, att1, _last_h(st, cfg.cell_type))
        x = jnp.concatenate([w_emb, _linear(params["embed"], context).astype(w_emb.dtype)], axis=-1)
        top, st2 = step_fn(params["rnn"], x, st)
        logits = _linear(params["linear"], top)
        alive = t < lengths  # [B]
        st2 = jax.tree.map(lambda n, o: jnp.where(alive[None, :, None], n, o), st2, st)
        logits = jnp.where(alive[:, None], logits, 0.0)
        alpha = jnp.where(alive[:, None], alpha, 0.0)
        return (t + 1, st2), (logits, alpha)

    (_, _), (preds, alphas) = jax.lax.scan(body, (jnp.int32(0), state0), jnp.swapaxes(emb, 0, 1))
    return jnp.swapaxes(preds, 0, 1), jnp.swapaxes(alphas, 0, 1)


def attn_greedy_decode(
    params: Dict[str, Any],
    cfg: AttnDecoderConfig,
    cnn_feature: jax.Array,  # [B, C, P]
    start_token: int,
    end_token: "int | None" = None,
) -> jax.Array:
    """25-step greedy decode from <start> (rnn_attn.py:77-94,120-145).

    end_token (serving extension, off by default): stop once every
    sequence has emitted <end> (`lax.while_loop` over the same attention
    carry instead of the fixed scan).  Positions after a sequence's first
    <end> are <pad> instead of the reference's dont-care argmax
    continuations — caption formatting truncates at <end>, so caption
    OUTPUT is identical (same contract as decoder.greedy_decode).
    """
    B = cnn_feature.shape[0]
    T = cfg.max_caption_length
    feats_pm = jnp.swapaxes(cnn_feature, 1, 2)
    att1 = _linear(params["attn"]["encoder_att"], feats_pm)  # hoisted: constant over t
    state0 = _init_hidden(params, cfg, cnn_feature)
    w0 = params["embedding"][jnp.full((B,), start_token, jnp.int32)]
    step_fn = stack_step(cfg.cell_type)

    def step(w_emb, st):
        context, _alpha = attention_net_hoisted(params["attn"], feats_pm, att1, _last_h(st, cfg.cell_type))
        x = jnp.concatenate([w_emb, _linear(params["embed"], context).astype(w_emb.dtype)], axis=-1)
        top, st2 = step_fn(params["rnn"], x, st)
        logits = _linear(params["linear"], top)
        return jnp.argmax(logits, axis=-1), st2

    if end_token is None:

        def body(carry, _):
            w_emb, st = carry
            tok, st2 = step(w_emb, st)
            return (params["embedding"][tok], st2), tok

        (_, _), toks = jax.lax.scan(body, (w0, state0), None, length=T)
        return jnp.swapaxes(toks, 0, 1)

    from show_tell_tpu.models.decoder import greedy_early_exit_loop

    return greedy_early_exit_loop(step, params["embedding"], w0, state0, B, T, end_token)


def doubly_stochastic_penalty(alphas: jax.Array) -> jax.Array:
    """alpha_c regularizer: ((1 - sum_t alpha)^2).mean() (main_attn.py:131)."""
    return jnp.mean((1.0 - jnp.sum(alphas, axis=1)) ** 2)
