"""Pallas TPU kernel: the ENTIRE T-step pooled-GRU greedy decode in ONE
Mosaic invocation.

The round-4 fused step kernel (ops/fused_step_pallas.py) collapsed each
decode step to one invocation but still paid, 25x per decode: a Mosaic
launch, the XLA embedding gather between steps, the lax.scan plumbing,
and a [L, B, H] hidden-state HBM round-trip per step.  Those per-step
residues are the measured gap between the ~111 us/step fused step and
the ~70 us analytic floor (docs/ARCHITECTURE.md "How decode kernels
must be measured").  This kernel moves the scan INSIDE the grid:

    grid = (B/block_b, T, L + V/block_v)        t outermost-sequential
      j <  L           layer j:  x_buf <- GRU(x_buf, hs[j])   (MXU+VPU)
      j >= L           vocab block vb = j - L:
                         logits_vb = x_buf @ Wv[:, vb] + bv[vb]
                         first-max merge into (best_val, best_idx)
                         AND  best_emb <- onehot(local winner) @ emb[vb]
      j == last        tokens[:, t] = best_idx;  x_buf[:, :E] <- best_emb

The token-feedback embedding gather — the one op Mosaic cannot express
as a dynamic row gather (rnn_pallas.py:14-21) — is folded into the
argmax merge itself: at each vocab block the block-local winner's
embedding row is materialized as a one-hot x emb-block MXU matmul
(exact: a one-hot f32 accumulation selects the bf16 row bit-identically)
and kept in a running best_emb scratch under the same strictly-greater
merge rule as best_val/best_idx.  No separate embedding phase, no extra
grid cells; the [block_e, E] embedding block streams alongside the
[H, block_v] projection block it shares a grid cell with.

Per-step HBM traffic vs the per-step kernel at B=512 bf16 flagship
shapes: the 5.1 MB embedding stream REPLACES the 5.2 MB hidden-state
round-trip (hs/cs now live in VMEM scratch for the whole decode and
never touch HBM), so bandwidth is a wash and the 25 kernel launches,
25 XLA gathers, and the scan carry threading are pure savings.  The
extra MXU work (B x Vpad x E one-hot MACs/step, ~14 us at B=512) rides
the bandwidth-bound vocab stream.

MEASURED OUTCOME (round 5, on-chip, bit-equal to the per-step kernel):
a NEGATIVE — 0.99x at T=25 / 0.96x at T=200 at B=512, 0.82x at B=1
(smoke_bench.json `gru_greedy_whole*`).  The analysis above holds at
B=512 but misses that the embedding stream is B-INDEPENDENT while the
hidden round-trip it replaces scales with B, so every batch below the
flagship shape pays 5.1 MB/step for nothing — and even at B=512 the
per-step launches turn out to be XLA-internal dispatches too cheap to
buy back the one-hot MXU work.  Default OFF
(ops.pallas_whole_decode_default); kept available and re-measured each
round.  See docs/ARCHITECTURE.md "Measured limits".

Semantics are the reference greedy loop (rnn.py:44-58): step-0 input is
the image feature, feedback is embed(argmax), fixed T steps, no <end>
early exit (the early-exit path keeps the shared while_loop engine over
the per-step kernel — a dynamic trip count cannot live inside a Mosaic
grid).  Tie rule is jnp.argmax's, via the shared merge helper
(vocab_pallas.merge_block_argmax) extended here with the embedding
merge.  GRU-only: the LSTM's 4-gate weight blocks plus a second [L, B,
H] cell-state scratch exceed the 16 MB VMEM budget at flagship shapes
(and the per-step LSTM fusion was already a measured negative).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.ops.rnn_pallas import gru_cell_math
from show_tell_tpu.ops.vocab_pallas import VOCAB_BLOCK, _pad_rows, _pick_block_b


def _whole_gru_kernel(
    feat_ref, emb_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, wv_ref, bv_ref,
    tok_out_ref, hs, x_buf, best_val, best_idx, best_emb, toks,
    *, L, n_blocks, block_v, E, T,
):
    t = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((t == 0) & (j == 0))
    def _():
        hs[...] = jnp.zeros_like(hs)
        x_buf[...] = feat_ref[...]

    @pl.when((t > 0) & (j == 0))
    def _():
        # Feed back the previous step's winning embedding row.  Columns
        # E..H of x_buf keep stale values; layer 0's w_ih rows E..H are
        # zero-padded (rnn_pallas.prepare_rnn_weights) so they cannot
        # contribute.
        x_buf[:, :E] = best_emb[...].astype(x_buf.dtype)

    for l in range(L):  # static unroll: no dynamic scratch indexing
        @pl.when(j == l)
        def _(l=l):
            h2 = gru_cell_math(
                x_buf[...], hs[l], w_ih_ref[0], w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
                hs.dtype,
            )
            hs[l] = h2
            x_buf[...] = h2

    @pl.when(j >= L)
    def _():
        vb = j - L
        logits = (
            jnp.dot(x_buf[...], wv_ref[...], preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        )  # [Bb, block_v]
        # merge_block_argmax, extended with the winner-embedding merge
        # (the tie rule must stay bit-identical to jnp.argmax: first
        # index in-block, strictly-greater across blocks).
        local_max = jnp.max(logits, axis=1, keepdims=True)  # [Bb, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        local_col = jnp.min(
            jnp.where(logits == local_max, iota, jnp.int32(2**30)), axis=1, keepdims=True
        )  # [Bb, 1] in-block column of the first max
        onehot = (iota == local_col).astype(emb_ref.dtype)  # [Bb, block_v]
        local_emb = jnp.dot(onehot, emb_ref[...], preferred_element_type=jnp.float32)
        better = (local_max > best_val[...]) | (j == L)
        best_val[...] = jnp.where(better, local_max, best_val[...])
        best_idx[...] = jnp.where(better, local_col + vb * block_v, best_idx[...])
        best_emb[...] = jnp.where(better, local_emb, best_emb[...])

    @pl.when(j == L + n_blocks - 1)
    def _():
        # Mosaic's output-block constraint (last dim 128-divisible or
        # full) rules out a [block_b, 1] per-step block: accumulate the
        # step's winner into a [block_b, T] scratch column instead and
        # flush the whole block once after the last step.
        col = jax.lax.broadcasted_iota(jnp.int32, toks.shape, 1)
        toks[...] = jnp.where(col == t, best_idx[...], toks[...])

    @pl.when((t == T - 1) & (j == L + n_blocks - 1))
    def _():
        tok_out_ref[...] = toks[...]


def _whole_gru_raw(feat, emb, w_ih, w_hh, b_ih, b_hh, wv, bv, *, T, block_v, interpret):
    """feat [B, H] (E zero-padded to H), emb [Vpad, E], weights as in the
    fused step kernel.  Returns tokens [B, T] int32."""
    B, H = feat.shape
    pad = _pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated 512-row envelope
        toks = _whole_gru_raw(
            jnp.pad(feat, ((0, pad), (0, 0))), emb, w_ih, w_hh, b_ih, b_hh, wv, bv,
            T=T, block_v=block_v, interpret=interpret,
        )
        return toks[:B]
    L = w_ih.shape[0]
    GH = 3 * H
    Vpad, E = emb.shape
    assert Vpad == wv.shape[1] and Vpad % block_v == 0, (emb.shape, wv.shape, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B)
    wgt = lambda bb, t, j: (jnp.minimum(j, L - 1), 0, 0)
    vcb = lambda bb, t, j: (0, jnp.clip(j - L, 0, n_blocks - 1))

    toks = pl.pallas_call(
        functools.partial(_whole_gru_kernel, L=L, n_blocks=n_blocks, block_v=block_v, E=E, T=T),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.int32),
        grid=(B // block_b, T, L + n_blocks),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, t, j: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, E), lambda bb, t, j: (jnp.clip(j - L, 0, n_blocks - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), vcb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), vcb, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, T), lambda bb, t, j: (bb, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w_ih.shape[0], block_b, H), feat.dtype),  # hs, VMEM-resident all T steps
            pltpu.VMEM((block_b, H), feat.dtype),  # x_buf
            pltpu.VMEM((block_b, 1), jnp.float32),  # best_val
            pltpu.VMEM((block_b, 1), jnp.int32),  # best_idx
            pltpu.VMEM((block_b, E), jnp.float32),  # best_emb
            pltpu.VMEM((block_b, T), jnp.int32),  # toks, flushed once at the end
        ],
        interpret=interpret,
    )(feat, emb, w_ih, w_hh, b_ih, b_hh, wv, bv)
    return toks


@functools.lru_cache(maxsize=None)
def _partitioned(T: int, block_v: int, interpret: bool):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    whole decode runs per-shard on the local batch; embedding,
    recurrence, and vocab weights stay replicated."""
    from show_tell_tpu.ops.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_whole_gru_raw, T=T, block_v=block_v, interpret=interpret),
        arg_batch_dims=(0, None, None, None, None, None, None, None),
        out_batch_dims=(0,),
        sharding_rule="b h, p e, l h g, l h g, l u g, l u g, h v, u v -> b t",
    )


def whole_decode_fits(hidden_dim: int, embed_dim: int, dtype, interpret: bool = False) -> bool:
    """VMEM envelope for the whole-decode kernel (GRU only).  On top of
    the fused per-step budget (double-buffered 3-gate weight blocks +
    vocab stream) this kernel holds the [L, block_b, H] hidden scratch,
    the f32 best_emb, and the double-buffered embedding block — ~13 MB
    at bf16 flagship shapes, which fits; f32 does not (and f32 is the
    parity dtype, which keeps the XLA scan anyway)."""
    import numpy as np

    if embed_dim > hidden_dim:
        return False
    if interpret:
        return True
    from show_tell_tpu.ops import fused_pooled_step_fits

    itemsize = np.dtype(dtype).itemsize
    extra = (
        5 * 512 * hidden_dim * itemsize  # hs scratch (L<=5 validated envelope)
        + 512 * embed_dim * 4  # best_emb f32
        + 2 * VOCAB_BLOCK * embed_dim * itemsize  # emb double buffer
    )
    return (
        fused_pooled_step_fits("gru", hidden_dim, embed_dim, dtype, interpret=False)
        and extra <= 4 * 1024 * 1024
    )


def prepare_embedding(embedding: jax.Array, vpad: int) -> jax.Array:
    """Zero-pad the [V, E] table's rows up to the padded vocab width
    (prepare_vocab pads the projection columns the same way; padded
    columns carry a -1e9 bias so their rows are never selected)."""
    V, _ = embedding.shape
    assert vpad >= V, (vpad, V)
    return jnp.pad(embedding, ((0, vpad - V), (0, 0))) if vpad > V else embedding


def gru_whole_greedy_decode_pallas(
    params: Dict[str, Any],
    cfg,
    cnn_feature: jax.Array,  # [B, E]
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Whole-decode greedy (reference rnn.py:44-58 semantics) in ONE
    Mosaic invocation.  Returns [B, T] int32 token ids.  Callers gate on
    whole_decode_fits + an unsharded vocab projection (see
    rnn_pallas.greedy_decode_pallas)."""
    from show_tell_tpu.ops.rnn_pallas import prepare_rnn_weights
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    dtype = params["embedding"].dtype
    stacked = prepare_rnn_weights(params["rnn"])
    stacked = jax.tree.map(lambda w: w.astype(dtype), stacked)
    vocab = prepare_vocab(params["linear"], block_v=block_v)
    emb = prepare_embedding(params["embedding"], vocab["w"].shape[1])
    H = cfg.hidden_dim
    feat = cnn_feature.astype(dtype)
    if feat.shape[1] < H:
        feat = jnp.pad(feat, ((0, 0), (0, H - feat.shape[1])))
    return _partitioned(cfg.max_caption_length, block_v, interpret)(
        feat, emb, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"],
        vocab["w"], vocab["b"],
    )
