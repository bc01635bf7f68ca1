"""Pallas TPU kernel: fused soft-attention context computation.

One kernel fuses the per-step attention math of the reference
Attention_Net (Attention/rnn_attn.py:21-31) — decoder-side projection,
additive scores, LeakyReLU, softmax over spatial positions, and the
alpha-weighted feature sum — into a single VMEM pass per batch block:

    att2  = h @ W_dec + b_dec                     (MXU)
    e     = LeakyReLU(att1 + att2[:,None,:]) . w_full + b_full
    alpha = softmax_P(e)
    ctx   = sum_p alpha[:,p] * feats[:,p,:]

``att1 = feats @ W_enc + b_enc`` is *hoisted out*: it is constant across
decode steps for a given image, so callers precompute it once per batch
(the reference recomputes it every step, rnn_attn.py:23 — an algorithmic
win on top of the fusion).  The weighted reductions are written as
multiply+reduce (VPU) rather than batched matmuls, which Mosaic lowers
poorly.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(feats_ref, att1_ref, h_ref, wdec_ref, bdec_ref, wfull_ref, ctx_ref, alpha_ref):
    h = h_ref[...]  # [Bb, H]
    att2 = jnp.dot(h, wdec_ref[...], preferred_element_type=jnp.float32) + bdec_ref[...]
    act = jax.nn.leaky_relu(att1_ref[...].astype(jnp.float32) + att2[:, None, :], negative_slope=0.2)
    # e[b,p] = sum_a act[b,p,a] * w_full[a].  The reference adds b_full
    # here; the caller DROPS it (softmax-invariant constant — see
    # attention_context_pallas), so e differs from the reference by that
    # constant, and alpha/ctx do not.
    e = jnp.sum(act * wfull_ref[...][None, None, :], axis=-1)  # [Bb, P]
    alpha = jax.nn.softmax(e, axis=1)
    ctx = jnp.sum(feats_ref[...].astype(jnp.float32) * alpha[..., None], axis=1)  # [Bb, C]
    ctx_ref[...] = ctx.astype(ctx_ref.dtype)
    alpha_ref[...] = alpha.astype(alpha_ref.dtype)


def _attention_context_raw(feats_pm, att1, hidden, wdec, bdec, wfull, *, block_b, interpret):
    B, P, C = feats_pm.shape
    A = att1.shape[-1]
    H = hidden.shape[-1]
    if B % block_b != 0:  # local (per-shard) batch under a dp mesh
        block_b = 1

    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, C), feats_pm.dtype),
            jax.ShapeDtypeStruct((B, P), jnp.float32),
        ),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, P, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, P, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((A,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(feats_pm, att1, hidden, wdec, bdec, wfull)


@functools.lru_cache(maxsize=None)
def _partitioned(block_b: int, interpret: bool):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    context kernel runs per-shard on the local batch block; the (small)
    attention weights are replicated — parallel/mesh.py never shards
    them.  This is what keeps the measured 1.3x kernel win alive in the
    dp=8 (v5e-8) serving configuration."""
    from show_tell_tpu.ops.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_attention_context_raw, block_b=block_b, interpret=interpret),
        arg_batch_dims=(0, 0, 0, None, None, None),
        out_batch_dims=(0, 0),
        sharding_rule="b p c, b p a, b h, h a, a, a -> b c, b p",
    )


def attention_context_pallas(
    attn_params: Dict[str, jax.Array],
    feats_pm: jax.Array,  # [B, P, C] positions-major features
    att1: jax.Array,  # [B, P, A] precomputed encoder projection (+ b_enc)
    hidden: jax.Array,  # [B, H]
    block_b: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (context [B, C], alpha [B, P]).

    Softmax is invariant to the constant b_full, so it is dropped; the
    per-position scores therefore differ from the reference by a constant
    that cancels in alpha.
    """
    wfull = attn_params["full_att"]["w"][:, 0]  # [A]
    return _partitioned(block_b, interpret)(
        feats_pm, att1, hidden, attn_params["decoder_att"]["w"], attn_params["decoder_att"]["b"], wfull
    )


def precompute_att1(attn_params: Dict[str, jax.Array], feats_pm: jax.Array) -> jax.Array:
    """Encoder-side projection, constant across decode steps: [B, P, A]."""
    return (
        jnp.dot(feats_pm, attn_params["encoder_att"]["w"], preferred_element_type=jnp.float32)
        + attn_params["encoder_att"]["b"]
    )


def attn_greedy_decode_pallas(
    params: Dict[str, jax.Array],
    cfg,
    cnn_feature: jax.Array,  # [B, C, P]
    start_token: int,
    interpret: bool = None,
    end_token: "int | None" = None,
    vocab_sharded: "bool | None" = None,
) -> jax.Array:
    """Greedy attention decode with the fused Pallas context kernel and
    the fused vocab projection+argmax kernel (rnn_attn.py:77-94
    semantics; --use_pallas path for attn variants).

    end_token: shared early-exit `lax.while_loop` engine around the SAME
    Pallas step (decoder.greedy_early_exit_loop) — `--early_exit`
    composes with `--use_pallas`."""
    from show_tell_tpu.models.attention import _init_hidden, _last_h, _linear
    from show_tell_tpu.models.rnn_cells import stack_step
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab, project_argmax_pallas

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = cnn_feature.shape[0]
    feats_pm = jnp.swapaxes(cnn_feature, 1, 2)
    dtype = params["embedding"].dtype
    att1 = precompute_att1(params["attn"], feats_pm).astype(dtype)
    # mp-sharded vocab projection keeps the XLA path (GSPMD's native
    # vocab-axis collectives); otherwise the fused kernel skips the
    # [B, V] logits HBM round-trip.  vocab_sharded: statically-known
    # flag from jitted callers (inspecting traced params conservatively
    # reports sharded; evaluation/tester.py passes the concrete answer).
    if vocab_sharded is None:
        from show_tell_tpu.ops import vocab_projection_is_sharded

        vocab_sharded = vocab_projection_is_sharded(params["linear"])
    vocab_kernel = not vocab_sharded
    if vocab_kernel:
        vocab = prepare_vocab(params["linear"])  # padded ONCE, outside the scan
    state0 = _init_hidden(params, cfg, cnn_feature)
    w0 = params["embedding"][jnp.full((B,), start_token, jnp.int32)]
    step_fn = stack_step(cfg.cell_type)
    block_b = 8 if B % 8 == 0 else 1

    def step(w_emb, st):
        context, _alpha = attention_context_pallas(
            params["attn"], feats_pm, att1, _last_h(st, cfg.cell_type), block_b=block_b, interpret=interpret
        )
        x = jnp.concatenate([w_emb, _linear(params["embed"], context).astype(w_emb.dtype)], axis=-1)
        top, st2 = step_fn(params["rnn"], x, st)
        if vocab_kernel:
            tok = project_argmax_pallas(vocab, top, interpret=interpret)
        else:
            tok = jnp.argmax(_linear(params["linear"], top), axis=-1)
        return tok, st2

    if end_token is not None:
        from show_tell_tpu.models.decoder import greedy_early_exit_loop

        return greedy_early_exit_loop(
            step, params["embedding"], w0, state0, B, cfg.max_caption_length, end_token
        )

    def body(carry, _):
        w_emb, st = carry
        tok, st2 = step(w_emb, st)
        return (params["embedding"][tok], st2), tok

    (_, _), toks = jax.lax.scan(body, (w0, state0), None, length=cfg.max_caption_length)
    return jnp.swapaxes(toks, 0, 1)
