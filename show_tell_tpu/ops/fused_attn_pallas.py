"""Pallas TPU kernel: the FULLY fused attention decode step.

ONE Mosaic invocation advances a whole greedy decode step for the
soft-attention families (reference Attention/rnn_attn.py:69-94 — the
per-step attention + GRU/LSTM + projection hot loop): additive
attention over the 49 spatial positions, the context's embed
projection, the L-layer recurrence, the H x V vocab projection, and
the argmax.  Only the token-embedding gather stays in XLA (Mosaic
cannot express the dynamic row gather — rnn_pallas.py:14-19).

Two algebraic hoists shrink the per-step working set (both constant
across decode steps for a given image, both recomputed every step by
the reference):

  * ``att1 = feats @ W_enc + b_enc`` — the attention context kernel's
    existing hoist (ops/attention_pallas.py);
  * ``feats_e = feats @ W_embed`` — NEW: decode never uses the raw
    context or alpha, only ``embed(context)``; since
    ``embed(sum_p alpha_p * feats_p) = sum_p alpha_p * (feats_p @
    W_embed) + b_embed``, the alpha-weighted reduction runs in embed
    space (E=512) instead of feature space (C=2048), cutting the
    kernel's dominant stream ([B, P, C] every step at C=2048 = 50MB at
    B=256) by 4x AND dropping the per-step [B, C] x [C, E] matmul.

Grid: (B/block_b, n_sub + L + Vpad/block_v), batch blocks outermost:

    t < n_sub             attention sub-stage s=t: rows [s*sub_b, +sub_b)
                          of the block — att2/e/alpha from the last
                          layer's incoming hidden, ctx_e, write
                          cat(w_emb, ctx_e) into x_buf rows     (MXU+VPU)
    t == n_sub            layer 0: x_buf[:, :2E] @ w_ih0 + recurrence
    n_sub < t < n_sub+L   layer l=t-n_sub: x_buf[:, :H] with w_ihU
    t >= n_sub+L          vocab block j: logits -> first-max argmax merge
    last t                tok <- best_idx

The attention runs in sub_b-row sub-stages because feats_e/att1 blocks
for a full 256-row batch block would blow VMEM; the recurrence and the
vocab stream keep whole-block rows (the measured envelope discipline of
ops/fused_step_pallas.py).  Layer 0's [2E, GH] weights are a separate
constant-index operand (fetched once) so the streamed upper-layer
weights stay [H, GH] — stacking all layers at 2E rows would double
their traffic AND their FLOPs.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.ops.rnn_pallas import gru_cell_math, lstm_cell_math
from show_tell_tpu.ops.vocab_pallas import VOCAB_BLOCK, merge_block_argmax

ATTN_ROW_CAP = 256  # batch-block envelope (VMEM: feats_e/att1 sub-blocks + streamed gate weights)


def _attn_pick_block_b(B: int) -> int:
    return B if B <= ATTN_ROW_CAP else ATTN_ROW_CAP


def _attn_pad_rows(B: int) -> int:
    return (-B) % ATTN_ROW_CAP if B > ATTN_ROW_CAP else 0


def _kernel(
    # data operands
    w_emb_ref, feats_e_ref, att1_ref, h_in_ref, c_in_ref,
    # attention weights
    wdec_ref, bdec_ref, wfull_ref, b_emb_ref,
    # recurrence weights
    w_ih0_ref, w_ihU_ref, w_hh_ref, b_ih_ref, b_hh_ref,
    # vocab projection
    wv_ref, bv_ref,
    # outputs
    h_out_ref, c_out_ref, tok_ref,
    # scratch
    x_buf, best_val, best_idx,
    *, cell_type, n_sub, sub_b, L, n_blocks, block_v, E, out_mode="argmax",
):
    t = pl.program_id(1)
    lstm = cell_type == "lstm"

    @pl.when(t < n_sub)
    def _():
        # Attention sub-stage: rows [t*sub_b, +sub_b) of this batch block.
        h = h_in_ref[0, pl.dslice(t * sub_b, sub_b), :]  # [sub_b, H] last layer
        att2 = (
            jnp.dot(h, wdec_ref[...], preferred_element_type=jnp.float32)
            + bdec_ref[...].astype(jnp.float32)
        )  # [sub_b, A]
        act = jax.nn.leaky_relu(
            att1_ref[...].astype(jnp.float32) + att2[:, None, :], negative_slope=0.2
        )  # [sub_b, P, A]
        # b_full is softmax-invariant and dropped (ops/attention_pallas.py)
        e = jnp.sum(act * wfull_ref[...][None, None, :], axis=-1)  # [sub_b, P]
        alpha = jax.nn.softmax(e, axis=1)
        ctx_e = (
            jnp.sum(feats_e_ref[...].astype(jnp.float32) * alpha[..., None], axis=1)
            + b_emb_ref[...].astype(jnp.float32)
        )  # [sub_b, E]
        x = jnp.concatenate(
            [w_emb_ref[...].astype(x_buf.dtype), ctx_e.astype(x_buf.dtype)], axis=-1
        )  # [sub_b, 2E]
        x_buf[pl.dslice(t * sub_b, sub_b), :] = x

    def _cell(x, w_ih):
        if lstm:
            h2, c2 = lstm_cell_math(
                x, h_in_ref[0], c_in_ref[0], w_ih, w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
                h_out_ref.dtype, c_out_ref.dtype,
            )
            c_out_ref[0] = c2
        else:
            h2 = gru_cell_math(
                x, h_in_ref[0], w_ih, w_hh_ref[0], b_ih_ref[0], b_hh_ref[0], h_out_ref.dtype
            )
        h_out_ref[0] = h2
        x_buf[:, : h2.shape[1]] = h2

    @pl.when(t == n_sub)
    def _():
        _cell(x_buf[...], w_ih0_ref[...])  # layer 0: full [Bb, 2E] input

    @pl.when(jnp.logical_and(t > n_sub, t < n_sub + L))
    def _():
        H = w_hh_ref.shape[1]
        _cell(x_buf[:, :H], w_ihU_ref[0])  # upper layers: [Bb, H] input

    @pl.when(t >= n_sub + L)
    def _():
        H = w_hh_ref.shape[1]
        j = t - n_sub - L
        logits = (
            jnp.dot(x_buf[:, :H], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )  # [Bb, block_v]
        if out_mode == "dense":
            tok_ref[...] = logits  # tok_ref doubles as the logits block out
        else:
            merge_block_argmax(logits, j, block_v, t == n_sub + L, best_val, best_idx)

    if out_mode != "dense":

        @pl.when(t == n_sub + L + n_blocks - 1)
        def _():
            tok_ref[...] = best_idx[...]


def _raw(cell_type, w_emb, feats_e, att1, hs, cs, wdec, bdec, wfull, b_emb,
         w_ih0, w_ihU, w_hh, b_ih, b_hh, wv, bv, *, block_v, interpret, out_mode="argmax"):
    L, B, H = hs.shape
    P, E = feats_e.shape[1], feats_e.shape[2]
    A = att1.shape[2]
    I = w_ih0.shape[0]  # 2E
    GH = w_hh.shape[2]
    pad = _attn_pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated envelope
        w_emb = jnp.pad(w_emb, ((0, pad), (0, 0)))
        feats_e = jnp.pad(feats_e, ((0, pad), (0, 0), (0, 0)))
        att1 = jnp.pad(att1, ((0, pad), (0, 0), (0, 0)))
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        cs = jnp.pad(cs, ((0, 0), (0, pad), (0, 0))) if cs is not None else None
        out = _raw(cell_type, w_emb, feats_e, att1, hs, cs, wdec, bdec, wfull, b_emb,
                   w_ih0, w_ihU, w_hh, b_ih, b_hh, wv, bv,
                   block_v=block_v, interpret=interpret, out_mode=out_mode)
        return tuple(o[:, :B] if o.ndim == 3 else o[:B] for o in out)
    Vpad = wv.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _attn_pick_block_b(B)
    sub_b = 8 if block_b % 8 == 0 else 1
    n_sub = block_b // sub_b
    lstm = cell_type == "lstm"

    sub = lambda bb, t: (bb * n_sub + jnp.clip(t, 0, n_sub - 1), 0, 0)
    sub2 = lambda bb, t: (bb * n_sub + jnp.clip(t, 0, n_sub - 1), 0)
    lyr = lambda bb, t: (jnp.clip(t - n_sub, 0, L - 1), 0, 0)
    lyrU = lambda bb, t: (jnp.clip(t - n_sub - 1, 0, max(L - 2, 0)), 0, 0)
    # h_in: last layer during attention stages, layer l at layer stages
    h_idx = lambda bb, t: (jnp.where(t < n_sub, L - 1, jnp.clip(t - n_sub, 0, L - 1)), bb, 0)
    c_idx = lambda bb, t: (jnp.clip(t - n_sub, 0, L - 1), bb, 0)
    voc = lambda bb, t: (0, jnp.clip(t - n_sub - L, 0, n_blocks - 1))
    out_lyr = lambda bb, t: (jnp.clip(t - n_sub, 0, L - 1), bb, 0)
    const1 = lambda bb, t: (0,)
    const2 = lambda bb, t: (0, 0)

    in_specs = [
        pl.BlockSpec((sub_b, E), sub2, memory_space=pltpu.VMEM),          # w_emb
        pl.BlockSpec((sub_b, P, E), sub, memory_space=pltpu.VMEM),        # feats_e
        pl.BlockSpec((sub_b, P, A), sub, memory_space=pltpu.VMEM),        # att1
        pl.BlockSpec((1, block_b, H), h_idx, memory_space=pltpu.VMEM),    # h_in
    ]
    args = [w_emb, feats_e, att1, hs]
    if lstm:
        in_specs.append(pl.BlockSpec((1, block_b, H), c_idx, memory_space=pltpu.VMEM))
        args.append(cs)
    in_specs += [
        pl.BlockSpec((H, A), const2, memory_space=pltpu.VMEM),            # wdec
        pl.BlockSpec((A,), const1, memory_space=pltpu.VMEM),              # bdec
        pl.BlockSpec((A,), const1, memory_space=pltpu.VMEM),              # wfull
        pl.BlockSpec((E,), const1, memory_space=pltpu.VMEM),              # b_emb
        pl.BlockSpec((I, GH), const2, memory_space=pltpu.VMEM),           # w_ih0
        pl.BlockSpec((1, H, GH), lyrU, memory_space=pltpu.VMEM),          # w_ihU
        pl.BlockSpec((1, H, GH), lyr, memory_space=pltpu.VMEM),           # w_hh
        pl.BlockSpec((1, 1, GH), lyr, memory_space=pltpu.VMEM),           # b_ih
        pl.BlockSpec((1, 1, GH), lyr, memory_space=pltpu.VMEM),           # b_hh
        pl.BlockSpec((H, block_v), voc, memory_space=pltpu.VMEM),         # wv
        pl.BlockSpec((1, block_v), voc, memory_space=pltpu.VMEM),         # bv
    ]
    args += [wdec, bdec, wfull, b_emb, w_ih0, w_ihU, w_hh, b_ih, b_hh, wv, bv]

    out_shape = [jax.ShapeDtypeStruct((L, B, H), hs.dtype)]
    out_specs = [pl.BlockSpec((1, block_b, H), out_lyr, memory_space=pltpu.VMEM)]
    if lstm:
        out_shape.append(jax.ShapeDtypeStruct((L, B, H), cs.dtype))
        out_specs.append(pl.BlockSpec((1, block_b, H), out_lyr, memory_space=pltpu.VMEM))
    if out_mode == "dense":
        out_shape.append(jax.ShapeDtypeStruct((B, Vpad), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (block_b, block_v),
            lambda bb, t: (bb, jnp.clip(t - n_sub - L, 0, n_blocks - 1)),
            memory_space=pltpu.VMEM,
        ))
    else:
        out_shape.append(jax.ShapeDtypeStruct((B, 1), jnp.int32))
        out_specs.append(pl.BlockSpec((block_b, 1), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel if lstm else _kernel_gru_adapter,
        cell_type=cell_type, n_sub=n_sub, sub_b=sub_b, L=L,
        n_blocks=n_blocks, block_v=block_v, E=E, out_mode=out_mode,
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(B // block_b, n_sub + L + n_blocks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((block_b, I), hs.dtype),
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*args)


def _kernel_gru_adapter(w_emb_ref, feats_e_ref, att1_ref, h_in_ref,
                        wdec_ref, bdec_ref, wfull_ref, b_emb_ref,
                        w_ih0_ref, w_ihU_ref, w_hh_ref, b_ih_ref, b_hh_ref,
                        wv_ref, bv_ref, h_out_ref, tok_ref,
                        x_buf, best_val, best_idx, **kw):
    """GRU arity (no c operands/outputs) -> shared kernel body."""
    _kernel(w_emb_ref, feats_e_ref, att1_ref, h_in_ref, None,
            wdec_ref, bdec_ref, wfull_ref, b_emb_ref,
            w_ih0_ref, w_ihU_ref, w_hh_ref, b_ih_ref, b_hh_ref,
            wv_ref, bv_ref, h_out_ref, None, tok_ref,
            x_buf, best_val, best_idx, **kw)


@functools.lru_cache(maxsize=None)
def _partitioned(cell_type: str, block_v: int, interpret: bool, out_mode: str = "argmax"):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    fused attention step runs per-shard on the local batch; all weights
    stay replicated.  An mp(vocab)-sharded projection must not route
    here (callers check ops.vocab_projection_is_sharded first)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    tok = "b v" if out_mode == "dense" else "b"
    if cell_type == "lstm":
        return batch_partitioned(
            functools.partial(_raw, "lstm", block_v=block_v, interpret=interpret, out_mode=out_mode),
            arg_batch_dims=(0, 0, 0, 1, 1) + (None,) * 11,
            out_batch_dims=(1, 1, 0),
            sharding_rule=(
                "b e, b p e, b p a, l b h, l b h, h a, a, a, e, i g, m h g, "
                "l h g, l u g, l u g, h v, u v -> l b h, l b h, " + tok
            ),
        )
    return batch_partitioned(
        lambda w_emb, feats_e, att1, hs, *w: _raw(
            "gru", w_emb, feats_e, att1, hs, None, *w,
            block_v=block_v, interpret=interpret, out_mode=out_mode,
        ),
        arg_batch_dims=(0, 0, 0, 1) + (None,) * 11,
        out_batch_dims=(1, 0),
        sharding_rule=(
            "b e, b p e, b p a, l b h, h a, a, a, e, i g, m h g, "
            "l h g, l u g, l u g, h v, u v -> l b h, " + tok
        ),
    )


def prepare_attn_decode(params: Dict, feats_pm: jax.Array) -> Dict[str, jax.Array]:
    """Per-decode constants, hoisted ONCE outside the scan: att1 (encoder
    attention projection), feats_e (embed-space features — see module
    docstring), split/stacked recurrence weights, padded vocab."""
    from show_tell_tpu.ops.attention_pallas import precompute_att1
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    dtype = params["embedding"].dtype
    layers = params["rnn"]
    H = layers[0]["w_hh"].shape[0]
    upper = layers[1:] or [jax.tree.map(jnp.zeros_like, layers[0])]
    w_ihU = jnp.stack([l["w_ih"][:H] if l["w_ih"].shape[0] >= H else
                       jnp.pad(l["w_ih"], ((0, H - l["w_ih"].shape[0]), (0, 0)))
                       for l in upper])
    return {
        "att1": precompute_att1(params["attn"], feats_pm).astype(dtype),
        "feats_e": jnp.dot(
            feats_pm, params["embed"]["w"], preferred_element_type=jnp.float32
        ).astype(dtype),
        "b_emb": params["embed"]["b"],
        "wdec": params["attn"]["decoder_att"]["w"],
        "bdec": params["attn"]["decoder_att"]["b"],
        "wfull": params["attn"]["full_att"]["w"][:, 0],
        "w_ih0": layers[0]["w_ih"],
        "w_ihU": w_ihU,
        "w_hh": jnp.stack([l["w_hh"] for l in layers]),
        "b_ih": jnp.stack([l["b_ih"] for l in layers])[:, None, :],
        "b_hh": jnp.stack([l["b_hh"] for l in layers])[:, None, :],
        "vocab": prepare_vocab(params["linear"]),
    }


def fused_attn_decode_step_pallas(
    prep: Dict[str, jax.Array],  # prepare_attn_decode output
    cell_type: str,
    w_emb: jax.Array,  # [B, E] current token embedding
    state,  # hs [L, B, H] | (hs, cs)
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, object]:
    """One fused attention greedy decode step: (tok [B] int32, new_state)."""
    part = _partitioned(cell_type, block_v, interpret)
    weights = (
        prep["wdec"], prep["bdec"], prep["wfull"], prep["b_emb"],
        prep["w_ih0"], prep["w_ihU"], prep["w_hh"], prep["b_ih"], prep["b_hh"],
        prep["vocab"]["w"], prep["vocab"]["b"],
    )
    if cell_type == "lstm":
        hs, cs = state
        new_hs, new_cs, tok = part(w_emb, prep["feats_e"], prep["att1"], hs, cs, *weights)
        return tok[:, 0], (new_hs, new_cs)
    new_hs, tok = part(w_emb, prep["feats_e"], prep["att1"], state, *weights)
    return tok[:, 0], new_hs


def fused_attn_dense_step_pallas(
    prep: Dict[str, jax.Array],  # prepare_attn_decode output
    cell_type: str,
    w_emb: jax.Array,  # [B, E]
    state,  # hs | (hs, cs)
    n_vocab: int,  # unpadded V (logits sliced back to it)
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, object]:
    """One fused attention BEAM step, dense logits out: the same single
    invocation as the greedy step but the vocab stages write [B, Vpad]
    logits blocks instead of the argmax merge (the measured-best beam
    form — see ops.pallas_beam_fused_default).  Returns
    (logits [B, V] f32, new_state)."""
    part = _partitioned(cell_type, block_v, interpret, "dense")
    weights = (
        prep["wdec"], prep["bdec"], prep["wfull"], prep["b_emb"],
        prep["w_ih0"], prep["w_ihU"], prep["w_hh"], prep["b_ih"], prep["b_hh"],
        prep["vocab"]["w"], prep["vocab"]["b"],
    )
    if cell_type == "lstm":
        hs, cs = state
        new_hs, new_cs, logits = part(w_emb, prep["feats_e"], prep["att1"], hs, cs, *weights)
        return logits[:, :n_vocab], (new_hs, new_cs)
    new_hs, logits = part(w_emb, prep["feats_e"], prep["att1"], state, *weights)
    return logits[:, :n_vocab], new_hs


def attn_greedy_decode_fused_pallas(
    params: Dict,
    cfg,
    cnn_feature: jax.Array,  # [B, C, P]
    start_token: int,
    interpret: bool = None,
    end_token: "int | None" = None,
) -> jax.Array:
    """Greedy attention decode with the FULLY fused step kernel —
    rnn_attn.py:77-94 semantics, ids identical to attn_greedy_decode.

    end_token: shared early-exit `lax.while_loop` engine around the SAME
    fused step (decoder.greedy_early_exit_loop)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from show_tell_tpu.models.attention import _init_hidden

    B = cnn_feature.shape[0]
    feats_pm = jnp.swapaxes(cnn_feature, 1, 2)
    prep = prepare_attn_decode(params, feats_pm)
    state0 = _init_hidden(params, cfg, cnn_feature)
    w0 = params["embedding"][jnp.full((B,), start_token, jnp.int32)]

    def step(w_emb, st):
        return fused_attn_decode_step_pallas(prep, cfg.cell_type, w_emb, st, interpret=interpret)

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
