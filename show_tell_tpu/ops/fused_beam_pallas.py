"""Pallas TPU kernels: fused recurrence + vocab projection for BEAM search.

Beam search is the reference's only decode mode with published configs
(widths 3/5 — /root/reference/rnn.py:60-108 is its per-step hot loop),
yet until round 4 only its *projection* had a kernel path: the B*K beam
rows ran the L-layer recurrence through the XLA stack step, round-tripped
the [B*K, H] top activation through HBM, then (optionally) entered the
sparse projection+top-k kernel — which measured 0.93x alone, because its
k max/argmax/mask passes per vocab block cost more VPU time than the
avoided logits round-trip saved (ops.pallas_beam_default).

These kernels fuse the recurrence INTO the projection, two ways:

  * ``fused_*_dense_step_pallas`` — L-layer recurrence + H x Vpad
    projection in ONE Mosaic invocation, DENSE logits out.  XLA keeps
    the log_softmax + K*V top_k exactly as the measured-best beam step
    does today; the fusion removes the stack-step invocation and the
    [B*K, H] activation round-trip without paying the sparse
    extraction's VPU cost.
  * ``fused_*_topk_step_pallas`` — same recurrence, but the vocab stages
    run the shared per-block top-k + online logsumexp
    (ops/vocab_pallas.topk_block_stage), so only [B*K, n_blocks*k]
    candidates reach HBM.  The stronger fusion on paper; whether the
    extraction cost flips sign once the recurrence amortizes the
    invocation is a measured question (smoke_bench.json gru_beam3 rows).

Grid: (B/block_b, L + Vpad/block_v) — batch blocks outermost, layers
then vocab blocks streaming while the inter-layer activation stays in
VMEM scratch, identical discipline to the greedy fused step
(ops/fused_step_pallas.py).  The embedding gather stays in XLA (Mosaic
cannot express the dynamic row gather — rnn_pallas.py:14-19), as does
the beam engine's candidate reduction and state gather
(decode/beam.py — the 3.4x two-stage negative result rules out moving
selection into a kernel).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.ops.fused_step_pallas import _pad_input
from show_tell_tpu.ops.rnn_pallas import gru_cell_math, lstm_cell_math
from show_tell_tpu.ops.vocab_pallas import (
    VOCAB_BLOCK,
    _pad_rows,
    _pick_block_b,
    topk_block_stage,
)


# --------------------------- kernel bodies --------------------------- #


def _recurrence_stage(cell_type, t, L, x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
                      h_in_ref, c_in_ref, h_out_ref, c_out_ref, x_buf):
    """Shared layer stages: t==0 loads x, t<L advances layer t."""

    @pl.when(t == 0)
    def _():
        x_buf[...] = x_ref[...]

    @pl.when(t < L)
    def _():
        if cell_type == "lstm":
            h2, c2 = lstm_cell_math(
                x_buf[...], h_in_ref[0], c_in_ref[0],
                w_ih_ref[0], w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
                h_out_ref.dtype, c_out_ref.dtype,
            )
            c_out_ref[0] = c2
        else:
            h2 = gru_cell_math(
                x_buf[...], h_in_ref[0], w_ih_ref[0], w_hh_ref[0],
                b_ih_ref[0], b_hh_ref[0], h_out_ref.dtype,
            )
        h_out_ref[0] = h2
        x_buf[...] = h2


def _dense_kernel_gru(x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref,
                      wv_ref, bv_ref, h_out_ref, logits_ref, x_buf, *, L):
    t = pl.program_id(1)
    _recurrence_stage("gru", t, L, x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
                      h_in_ref, None, h_out_ref, None, x_buf)

    @pl.when(t >= L)
    def _():
        logits_ref[...] = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )


def _dense_kernel_lstm(x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref, c_in_ref,
                       wv_ref, bv_ref, h_out_ref, c_out_ref, logits_ref, x_buf, *, L):
    t = pl.program_id(1)
    _recurrence_stage("lstm", t, L, x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
                      h_in_ref, c_in_ref, h_out_ref, c_out_ref, x_buf)

    @pl.when(t >= L)
    def _():
        logits_ref[...] = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )


def _topk_kernel_gru(x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref,
                     wv_ref, bv_ref, h_out_ref, vals_ref, idx_ref, lse_ref,
                     x_buf, m_sc, s_sc, *, L, n_blocks, block_v, k):
    t = pl.program_id(1)
    _recurrence_stage("gru", t, L, x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
                      h_in_ref, None, h_out_ref, None, x_buf)

    @pl.when(t >= L)
    def _():
        j = t - L
        logits = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )
        topk_block_stage(logits, j, t == L, t == L + n_blocks - 1, block_v, k,
                         vals_ref, idx_ref, lse_ref, m_sc, s_sc)


def _topk_kernel_lstm(x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref, c_in_ref,
                      wv_ref, bv_ref, h_out_ref, c_out_ref, vals_ref, idx_ref, lse_ref,
                      x_buf, m_sc, s_sc, *, L, n_blocks, block_v, k):
    t = pl.program_id(1)
    _recurrence_stage("lstm", t, L, x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
                      h_in_ref, c_in_ref, h_out_ref, c_out_ref, x_buf)

    @pl.when(t >= L)
    def _():
        j = t - L
        logits = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )
        topk_block_stage(logits, j, t == L, t == L + n_blocks - 1, block_v, k,
                         vals_ref, idx_ref, lse_ref, m_sc, s_sc)


# ----------------------------- raw calls ------------------------------ #


def _specs(L, B, H, GH, block_b, block_v, n_blocks, lstm):
    """Input BlockSpecs shared by both kernel families (x, 4 stacked
    weight tensors, h state(s), vocab w/b)."""
    lyr_w = lambda bb, t: (jnp.minimum(t, L - 1), 0, 0)
    lyr_s = lambda bb, t: (jnp.minimum(t, L - 1), bb, 0)
    voc = lambda bb, t: (0, jnp.clip(t - L, 0, n_blocks - 1))
    specs = [
        pl.BlockSpec((block_b, H), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, GH), lyr_w, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, GH), lyr_w, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, GH), lyr_w, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, GH), lyr_w, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),
    ]
    if lstm:
        specs.append(pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM))
    specs += [
        pl.BlockSpec((H, block_v), voc, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_v), voc, memory_space=pltpu.VMEM),
    ]
    return specs, lyr_s


def _dense_raw(cell_type, x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv, *, block_v, interpret):
    L, B, H = hs.shape
    pad = _pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated 512-row envelope
        x = jnp.pad(x, ((0, pad), (0, 0)))
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        cs = jnp.pad(cs, ((0, 0), (0, pad), (0, 0))) if cs is not None else None
        out = _dense_raw(cell_type, x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv,
                         block_v=block_v, interpret=interpret)
        return tuple(o[:, :B] if o.ndim == 3 else o[:B] for o in out)
    GH = w_ih.shape[2]
    Vpad = wv.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B)
    lstm = cell_type == "lstm"
    in_specs, lyr_s = _specs(L, B, H, GH, block_b, block_v, n_blocks, lstm)
    logits_spec = pl.BlockSpec(
        (block_b, block_v), lambda bb, t: (bb, jnp.clip(t - L, 0, n_blocks - 1)),
        memory_space=pltpu.VMEM,
    )

    if lstm:
        return pl.pallas_call(
            functools.partial(_dense_kernel_lstm, L=L),
            out_shape=(
                jax.ShapeDtypeStruct((L, B, H), hs.dtype),
                jax.ShapeDtypeStruct((L, B, H), cs.dtype),
                jax.ShapeDtypeStruct((B, Vpad), jnp.float32),
            ),
            grid=(B // block_b, L + n_blocks),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),
                logits_spec,
            ),
            scratch_shapes=[pltpu.VMEM((block_b, H), hs.dtype)],
            interpret=interpret,
        )(x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv)
    return pl.pallas_call(
        functools.partial(_dense_kernel_gru, L=L),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, H), hs.dtype),
            jax.ShapeDtypeStruct((B, Vpad), jnp.float32),
        ),
        grid=(B // block_b, L + n_blocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),
            logits_spec,
        ),
        scratch_shapes=[pltpu.VMEM((block_b, H), hs.dtype)],
        interpret=interpret,
    )(x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv)


def _topk_raw(cell_type, x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv, *, k, block_v, interpret):
    L, B, H = hs.shape
    pad = _pad_rows(B)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        cs = jnp.pad(cs, ((0, 0), (0, pad), (0, 0))) if cs is not None else None
        out = _topk_raw(cell_type, x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv,
                        k=k, block_v=block_v, interpret=interpret)
        # outs: hs [L,Bp,H], (cs), vals [n,Bp,k], idx [n,Bp,k] (batch at
        # dim 1 for all of them), then lse [Bp,1] (batch at dim 0).
        return tuple(o[:, :B] for o in out[:-1]) + (out[-1][:B],)
    GH = w_ih.shape[2]
    Vpad = wv.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B)
    lstm = cell_type == "lstm"
    in_specs, lyr_s = _specs(L, B, H, GH, block_b, block_v, n_blocks, lstm)
    tk = lambda bb, t: (jnp.clip(t - L, 0, n_blocks - 1), bb, 0)
    tk_specs = (
        pl.BlockSpec((1, block_b, k), tk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, k), tk, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, 1), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
    )
    tk_shapes = (
        jax.ShapeDtypeStruct((n_blocks, B, k), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, B, k), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((block_b, H), hs.dtype),
        pltpu.VMEM((block_b, 1), jnp.float32),
        pltpu.VMEM((block_b, 1), jnp.float32),
    ]

    if lstm:
        return pl.pallas_call(
            functools.partial(_topk_kernel_lstm, L=L, n_blocks=n_blocks, block_v=block_v, k=k),
            out_shape=(
                jax.ShapeDtypeStruct((L, B, H), hs.dtype),
                jax.ShapeDtypeStruct((L, B, H), cs.dtype),
            ) + tk_shapes,
            grid=(B // block_b, L + n_blocks),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),
            ) + tk_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv)
    return pl.pallas_call(
        functools.partial(_topk_kernel_gru, L=L, n_blocks=n_blocks, block_v=block_v, k=k),
        out_shape=(jax.ShapeDtypeStruct((L, B, H), hs.dtype),) + tk_shapes,
        grid=(B // block_b, L + n_blocks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, block_b, H), lyr_s, memory_space=pltpu.VMEM),) + tk_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv)


# --------------------- GSPMD partitioning + wrappers ------------------ #


@functools.lru_cache(maxsize=None)
def _partitioned_dense(cell_type: str, block_v: int, interpret: bool):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    fused beam step runs per-shard on the local B*K rows; weights stay
    replicated.  mp(vocab)-sharded projections must not route here
    (decode/beam.py checks vocab_projection_is_sharded first)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    if cell_type == "lstm":
        return batch_partitioned(
            functools.partial(_dense_raw, "lstm", block_v=block_v, interpret=interpret),
            arg_batch_dims=(0, None, None, None, None, 1, 1, None, None),
            out_batch_dims=(1, 1, 0),
            sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, l b h, h v, u v -> l b h, l b h, b v",
        )
    return batch_partitioned(
        lambda x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv: _dense_raw(
            "gru", x, w_ih, w_hh, b_ih, b_hh, hs, None, wv, bv,
            block_v=block_v, interpret=interpret,
        ),
        arg_batch_dims=(0, None, None, None, None, 1, None, None),
        out_batch_dims=(1, 0),
        sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, h v, u v -> l b h, b v",
    )


@functools.lru_cache(maxsize=None)
def _partitioned_topk(cell_type: str, k: int, block_v: int, interpret: bool):
    from show_tell_tpu.ops.partition import batch_partitioned

    if cell_type == "lstm":
        return batch_partitioned(
            functools.partial(_topk_raw, "lstm", k=k, block_v=block_v, interpret=interpret),
            arg_batch_dims=(0, None, None, None, None, 1, 1, None, None),
            out_batch_dims=(1, 1, 1, 1, 0),
            sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, l b h, h v, u v -> l b h, l b h, n b k, n b k, b u",
        )
    return batch_partitioned(
        lambda x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv: _topk_raw(
            "gru", x, w_ih, w_hh, b_ih, b_hh, hs, None, wv, bv,
            k=k, block_v=block_v, interpret=interpret,
        ),
        arg_batch_dims=(0, None, None, None, None, 1, None, None),
        out_batch_dims=(1, 1, 1, 0),
        sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, h v, u v -> l b h, n b k, n b k, b u",
    )


def fused_dense_step_pallas(
    cell_type: str,
    stacked: Dict[str, jax.Array],  # prepare_rnn_weights output
    vocab: Dict[str, jax.Array],  # prepare_vocab output: w [H, Vpad], b [1, Vpad]
    x: jax.Array,  # [B, E] with E <= H
    state,  # hs [L, B, H] (gru) | (hs, cs) (lstm)
    n_vocab: int,  # unpadded V (logits sliced back to it)
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
):
    """One fused beam step, dense logits out.  Returns
    (logits [B, V] f32, new_state).  Oversized batches (B*K > 512 rows)
    are padded to the 512-row envelope inside the per-shard raw fn."""
    if cell_type == "lstm":
        hs, cs = state
        x = _pad_input(x, hs.shape[2], hs.dtype)
        new_hs, new_cs, logits = _partitioned_dense("lstm", block_v, interpret)(
            x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"],
            hs, cs, vocab["w"], vocab["b"],
        )
        return logits[:, :n_vocab], (new_hs, new_cs)
    hs = state
    x = _pad_input(x, hs.shape[2], hs.dtype)
    new_hs, logits = _partitioned_dense("gru", block_v, interpret)(
        x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"],
        hs, vocab["w"], vocab["b"],
    )
    return logits[:, :n_vocab], new_hs


def fused_topk_step_pallas(
    cell_type: str,
    stacked: Dict[str, jax.Array],
    vocab: Dict[str, jax.Array],
    x: jax.Array,  # [B, E] with E <= H
    state,
    k: int,
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> Tuple[Tuple[jax.Array, jax.Array], object]:
    """One fused beam step, sparse top-k out.  Returns
    ((logp [B, k], ids [B, k]), new_state) — mathematically equal to
    ``lax.top_k(log_softmax(logits), k)`` (per-block top-ks contain the
    global top-k; ops/vocab_pallas.project_topk_pallas's reduction)."""
    if cell_type == "lstm":
        hs, cs = state
        x = _pad_input(x, hs.shape[2], hs.dtype)
        new_hs, new_cs, vals, idx, lse = _partitioned_topk("lstm", k, block_v, interpret)(
            x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"],
            hs, cs, vocab["w"], vocab["b"],
        )
        new_state = (new_hs, new_cs)
    else:
        hs = state
        x = _pad_input(x, hs.shape[2], hs.dtype)
        new_hs, vals, idx, lse = _partitioned_topk("gru", k, block_v, interpret)(
            x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"],
            hs, vocab["w"], vocab["b"],
        )
        new_state = new_hs
    B = x.shape[0]
    n_blocks = vals.shape[0]
    vals = jnp.moveaxis(vals, 0, 1).reshape(B, n_blocks * k)
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, n_blocks * k)
    best, flat = jax.lax.top_k(vals, k)
    ids = jnp.take_along_axis(idx, flat, axis=1)
    return (best - lse, ids), new_state
