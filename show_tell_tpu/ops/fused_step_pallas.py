"""Pallas TPU kernel: the fully fused pooled-decoder greedy decode step.

ONE Mosaic invocation advances a whole greedy decode step for the pooled
GRU/LSTM families: the L-layer recurrence, the H x V vocab projection,
and the argmax — the complete cuDNN-fused hot loop of the reference
(/root/reference/rnn.py:24,44-58; SURVEY §2.3 row 1) minus only the
embedding gather, which stays in XLA (Mosaic cannot express the dynamic
row gather — rnn_pallas.py:14-19).

Why fuse further when the two-kernel hybrid (stack step + separate
projection/argmax) already wins 1.04-1.06x: decode is OVERHEAD-bound,
not bandwidth-bound.  At B=512 a decode step's FLOPs are ~70us at peak
but a measured step costs ~390us (decode MFU 22%, ARCHITECTURE.md) —
the cost is fixed per-invocation setup plus inter-kernel HBM hops, so
removing one Mosaic invocation and the [B, H] top-activation round-trip
per step attacks the actual bottleneck.

Grid: (B/block_b, L + Vpad/block_v), batch blocks outermost, so each
batch block runs its layers then streams the vocab blocks while the
inter-layer activation stays resident in VMEM scratch:

    t <  L             layer t: x_buf <- GRU/LSTM(x_buf, h[t])   (MXU+VPU)
    t >= L             vocab block j=t-L: logits_j = x_buf @ Wv[:, j] + bv[j]
                       first-max merge into (best_val, best_idx)  (VPU)
    t == L+NB-1        tok <- best_idx

Tie semantics match jnp.argmax exactly (first index wins, in-block via
iota+min, across blocks via strict >) — identical to the standalone
ops/vocab_pallas.py kernel.  Weight blocks are double-buffered by the
grid pipeline; the vocab stream for block j prefetches while block j-1
(or the last layer) computes.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.ops.rnn_pallas import gru_cell_math, lstm_cell_math
from show_tell_tpu.ops.vocab_pallas import (
    VOCAB_BLOCK,
    _pad_rows,
    _pick_block_b,
    merge_block_argmax,
)


def _fused_gru_kernel(
    x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref, wv_ref, bv_ref,
    h_out_ref, tok_ref, x_buf, best_val, best_idx, *, L, n_blocks, block_v,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_buf[...] = x_ref[...]

    @pl.when(t < L)
    def _():
        h2 = gru_cell_math(
            x_buf[...], h_in_ref[0], w_ih_ref[0], w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
            h_out_ref.dtype,
        )
        h_out_ref[0] = h2
        x_buf[...] = h2

    @pl.when(t >= L)
    def _():
        j = t - L
        logits = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )  # [Bb, block_v]
        merge_block_argmax(logits, j, block_v, t == L, best_val, best_idx)

    @pl.when(t == L + n_blocks - 1)
    def _():
        tok_ref[...] = best_idx[...]


def _fused_lstm_kernel(
    x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref, c_in_ref, wv_ref, bv_ref,
    h_out_ref, c_out_ref, tok_ref, x_buf, best_val, best_idx, *, L, n_blocks, block_v,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_buf[...] = x_ref[...]

    @pl.when(t < L)
    def _():
        h2, c2 = lstm_cell_math(
            x_buf[...], h_in_ref[0], c_in_ref[0],
            w_ih_ref[0], w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
            h_out_ref.dtype, c_out_ref.dtype,
        )
        h_out_ref[0] = h2
        c_out_ref[0] = c2
        x_buf[...] = h2

    @pl.when(t >= L)
    def _():
        j = t - L
        logits = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )
        merge_block_argmax(logits, j, block_v, t == L, best_val, best_idx)

    @pl.when(t == L + n_blocks - 1)
    def _():
        tok_ref[...] = best_idx[...]


# _pick_block_b / _pad_rows: the shared 512-row batch envelope (and its
# measured rationale) lives in ops/vocab_pallas.py — every decode kernel
# family applies it inside its per-shard raw function.


def _fused_gru_raw(x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv, *, block_v, interpret):
    L, B, H = hs.shape
    pad = _pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated 512-row envelope
        x = jnp.pad(x, ((0, pad), (0, 0)))
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        new_hs, tok = _fused_gru_raw(x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv,
                                     block_v=block_v, interpret=interpret)
        return new_hs[:, :B], tok[:B]
    GH = 3 * H
    Vpad = wv.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B)
    lyr = lambda bb, t: (jnp.minimum(t, L - 1), bb, 0)

    new_hs, tok = pl.pallas_call(
        functools.partial(_fused_gru_kernel, L=L, n_blocks=n_blocks, block_v=block_v),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, H), hs.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        grid=(B // block_b, L + n_blocks),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda bb, t: (0, jnp.clip(t - L, 0, n_blocks - 1)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda bb, t: (0, jnp.clip(t - L, 0, n_blocks - 1)), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), hs.dtype),
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, w_ih, w_hh, b_ih, b_hh, hs, wv, bv)
    return new_hs, tok[:, 0]


def _fused_lstm_raw(x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv, *, block_v, interpret):
    L, B, H = hs.shape
    pad = _pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated 512-row envelope
        x = jnp.pad(x, ((0, pad), (0, 0)))
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        cs = jnp.pad(cs, ((0, 0), (0, pad), (0, 0)))
        new_hs, new_cs, tok = _fused_lstm_raw(x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv,
                                              block_v=block_v, interpret=interpret)
        return new_hs[:, :B], new_cs[:, :B], tok[:B]
    GH = 4 * H
    Vpad = wv.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B)
    lyr = lambda bb, t: (jnp.minimum(t, L - 1), bb, 0)

    new_hs, new_cs, tok = pl.pallas_call(
        functools.partial(_fused_lstm_kernel, L=L, n_blocks=n_blocks, block_v=block_v),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, H), hs.dtype),
            jax.ShapeDtypeStruct((L, B, H), cs.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        grid=(B // block_b, L + n_blocks),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), lambda bb, t: (jnp.minimum(t, L - 1), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda bb, t: (0, jnp.clip(t - L, 0, n_blocks - 1)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda bb, t: (0, jnp.clip(t - L, 0, n_blocks - 1)), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda bb, t: (bb, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), hs.dtype),
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, w_ih, w_hh, b_ih, b_hh, hs, cs, wv, bv)
    return new_hs, new_cs, tok[:, 0]


@functools.lru_cache(maxsize=None)
def _partitioned(cell_type: str, block_v: int, interpret: bool):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    fused step runs per-shard on the local batch; recurrence and vocab
    weights stay replicated.  An mp(vocab)-sharded projection must not
    route here (callers check ops.vocab_projection_is_sharded first)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    if cell_type == "lstm":
        return batch_partitioned(
            functools.partial(_fused_lstm_raw, block_v=block_v, interpret=interpret),
            arg_batch_dims=(0, None, None, None, None, 1, 1, None, None),
            out_batch_dims=(1, 1, 0),
            sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, l b h, h v, u v -> l b h, l b h, b",
        )
    return batch_partitioned(
        functools.partial(_fused_gru_raw, block_v=block_v, interpret=interpret),
        arg_batch_dims=(0, None, None, None, None, 1, None, None),
        out_batch_dims=(1, 0),
        sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, h v, u v -> l b h, b",
    )


def _pad_input(x: jax.Array, H: int, dtype) -> jax.Array:
    E = x.shape[1]
    assert E <= H, (E, H)
    if E < H:
        x = jnp.pad(x, ((0, 0), (0, H - E)))
    return x.astype(dtype)


def fused_gru_decode_step_pallas(
    stacked: Dict[str, jax.Array],  # prepare_rnn_weights output
    vocab: Dict[str, jax.Array],  # prepare_vocab output: w [H, Vpad], b [1, Vpad]
    x: jax.Array,  # [B, E] with E <= H
    hs: jax.Array,  # [L, B, H]
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One fused greedy decode step.  Returns (tok [B] int32, new_hs).

    Oversized batches (> 512 rows) are padded to a 512-row multiple
    INSIDE the per-shard raw function — under a dp mesh each shard sees
    its own local batch, so padding here at the global level would not
    keep per-shard blocks inside the VMEM envelope."""
    x = _pad_input(x, hs.shape[2], hs.dtype)
    new_hs, tok = _partitioned("gru", block_v, interpret)(
        x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"], hs,
        vocab["w"], vocab["b"],
    )
    return tok, new_hs


def fused_lstm_decode_step_pallas(
    stacked: Dict[str, jax.Array],
    vocab: Dict[str, jax.Array],
    x: jax.Array,  # [B, E] with E <= H
    hs: jax.Array,  # [L, B, H]
    cs: jax.Array,  # [L, B, H]
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One fused greedy decode step.  Returns (tok [B] int32, (hs, cs)).
    Row padding happens per-shard inside the raw fn — see the GRU twin."""
    x = _pad_input(x, hs.shape[2], hs.dtype)
    new_hs, new_cs, tok = _partitioned("lstm", block_v, interpret)(
        x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"], hs, cs,
        vocab["w"], vocab["b"],
    )
    return tok, (new_hs, new_cs)
