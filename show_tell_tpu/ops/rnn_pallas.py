"""Pallas TPU kernel: fused multi-layer GRU decode step.

One kernel invocation advances the whole L-layer GRU stack one time step
(the reference's cuDNN fused-RNN equivalent, rnn.py:24).  The grid runs
over layers; Pallas's pipelined grid double-buffers each layer's weight
block from HBM into VMEM while the previous layer computes, and the
inter-layer activation is carried in a VMEM scratch buffer that persists
across grid steps — so the stack runs HBM-streaming-bound with both MXU
matmuls per layer fused with the VPU gate math.

Layer 0's input width E may be < H; its weights/inputs are zero-padded to
H once at preparation time (zeros contribute nothing to the matmul).

For greedy decode the stack step, vocab projection, and argmax fuse
further into ONE kernel (ops/fused_step_pallas.py) — the [B, V] logits
and the [B, H] top activation never touch HBM; the standalone stack
kernels here remain for the mp-sharded-projection path and beam search.
Only the embedding gather stays in XLA — fusing it too would need an
in-kernel dynamic row gather (embedding[argmax]), and this Mosaic
version supports neither int indexing on refs nor a per-row
dynamic-slice loop (compiler ICE).  The gather lowers well in XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_tell_tpu.ops.vocab_pallas import _pad_rows, _pick_block_b


def gru_cell_math(x, h, w_ih, w_hh, b_ih, b_hh, out_dtype):
    """One GRU cell in f32 gate math (torch gate order r,z,n; double
    biases; reset applied to the hidden-side affine), cast back to the
    carry dtype.  ONE source of truth for the parity-critical math —
    shared by the standalone stack kernel and the fully fused decode
    step (ops/fused_step_pallas.py).  Reference rnn.py:24 (cuDNN GRU)."""
    H = h.shape[-1]
    gx = jnp.dot(x, w_ih, preferred_element_type=jnp.float32) + b_ih
    gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
    r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gx[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gx[:, 2 * H :] + r * gh[:, 2 * H :])
    return ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(out_dtype)


def lstm_cell_math(x, h, c, w_ih, w_hh, b_ih, b_hh, h_dtype, c_dtype):
    """One LSTM cell in f32 gate math (torch gate order i,f,g,o; double
    biases), h/c cast back to the carry dtypes.  Shared like the GRU
    twin.  Reference LSTM/rnn_lstm.py (cuDNN LSTM)."""
    H = h.shape[-1]
    g = (
        jnp.dot(x, w_ih, preferred_element_type=jnp.float32)
        + b_ih
        + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
        + b_hh
    )
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H : 2 * H])
    gg = jnp.tanh(g[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(g[:, 3 * H :])
    c2 = f * c.astype(jnp.float32) + i * gg
    h2 = (o * jnp.tanh(c2)).astype(h_dtype)
    return h2, c2.astype(c_dtype)


def prepare_rnn_weights(layers: List[Dict[str, jax.Array]]) -> Dict[str, jax.Array]:
    """Stack per-layer GRU/LSTM params into [L, ...] tensors, padding
    layer 0's input width up to H.  Do this ONCE outside any scan."""
    H = layers[0]["w_hh"].shape[0]
    w_ih = []
    for layer in layers:
        w = layer["w_ih"]
        if w.shape[0] < H:
            w = jnp.pad(w, ((0, H - w.shape[0]), (0, 0)))
        w_ih.append(w)
    return {
        "w_ih": jnp.stack(w_ih),  # [L, H, GH]
        "w_hh": jnp.stack([l["w_hh"] for l in layers]),  # [L, H, GH]
        "b_ih": jnp.stack([l["b_ih"] for l in layers])[:, None, :],  # [L, 1, GH]
        "b_hh": jnp.stack([l["b_hh"] for l in layers])[:, None, :],
    }


# Backwards-compatible alias (original GRU-only name).
prepare_gru_weights = prepare_rnn_weights


def _gru_stack_kernel(x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref, h_out_ref, x_buf):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        x_buf[...] = x_ref[...]

    h2 = gru_cell_math(
        x_buf[...], h_in_ref[0], w_ih_ref[0], w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
        h_out_ref.dtype,
    )
    h_out_ref[0] = h2
    x_buf[...] = h2


def _lstm_stack_kernel(
    x_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref, h_in_ref, c_in_ref, h_out_ref, c_out_ref, x_buf
):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        x_buf[...] = x_ref[...]

    h2, c2 = lstm_cell_math(
        x_buf[...], h_in_ref[0], c_in_ref[0],
        w_ih_ref[0], w_hh_ref[0], b_ih_ref[0], b_hh_ref[0],
        h_out_ref.dtype, c_out_ref.dtype,
    )
    h_out_ref[0] = h2
    c_out_ref[0] = c2
    x_buf[...] = h2


def _lstm_stack_raw(x, w_ih, w_hh, b_ih, b_hh, hs, cs, *, interpret):
    L, B, H = hs.shape
    pad = _pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated 512-row envelope
        new_hs, new_cs = _lstm_stack_raw(
            jnp.pad(x, ((0, pad), (0, 0))), w_ih, w_hh, b_ih, b_hh,
            jnp.pad(hs, ((0, 0), (0, pad), (0, 0))), jnp.pad(cs, ((0, 0), (0, pad), (0, 0))),
            interpret=interpret,
        )
        return new_hs[:, :B], new_cs[:, :B]
    GH = 4 * H
    block_b = _pick_block_b(B)
    lyr = lambda bb, l: (l, bb, 0)
    wgt = lambda bb, l: (l, 0, 0)
    return pl.pallas_call(
        _lstm_stack_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, B, H), hs.dtype),
            jax.ShapeDtypeStruct((L, B, H), cs.dtype),
        ),
        grid=(B // block_b, L),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, l: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((block_b, H), hs.dtype)],
        interpret=interpret,
    )(x, w_ih, w_hh, b_ih, b_hh, hs, cs)


def _gru_stack_raw(x, w_ih, w_hh, b_ih, b_hh, hs, *, interpret):
    L, B, H = hs.shape
    pad = _pad_rows(B)
    if pad:  # keep every batch block inside the VMEM-validated 512-row envelope
        new_hs = _gru_stack_raw(
            jnp.pad(x, ((0, pad), (0, 0))), w_ih, w_hh, b_ih, b_hh,
            jnp.pad(hs, ((0, 0), (0, pad), (0, 0))), interpret=interpret,
        )
        return new_hs[:, :B]
    GH = 3 * H
    block_b = _pick_block_b(B)
    lyr = lambda bb, l: (l, bb, 0)
    wgt = lambda bb, l: (l, 0, 0)
    return pl.pallas_call(
        _gru_stack_kernel,
        out_shape=jax.ShapeDtypeStruct((L, B, H), hs.dtype),
        grid=(B // block_b, L),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, l: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GH), wgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, H), lyr, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, H), hs.dtype)],
        interpret=interpret,
    )(x, w_ih, w_hh, b_ih, b_hh, hs)


@functools.lru_cache(maxsize=None)
def _partitioned_stack(cell_type: str, interpret: bool):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    stack step runs per-shard on its local [*, B/dp, H] state; the
    (replicated) recurrence weights stay replicated — they are never mp-
    sharded (parallel/mesh.py shards only vocab-sized decoder params)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    if cell_type == "lstm":
        return batch_partitioned(
            functools.partial(_lstm_stack_raw, interpret=interpret),
            arg_batch_dims=(0, None, None, None, None, 1, 1),
            out_batch_dims=(1, 1),
            sharding_rule="b h, l h g, l h g, l u g, l u g, l b h, l b h -> l b h, l b h",
        )
    return batch_partitioned(
        functools.partial(_gru_stack_raw, interpret=interpret),
        arg_batch_dims=(0, None, None, None, None, 1),
        out_batch_dims=(1,),
        sharding_rule="b h, l h g, l h g, l u g, l u g, l b h -> l b h",
    )


def lstm_stack_step_pallas(
    stacked: Dict[str, jax.Array],
    x: jax.Array,  # [B, E] with E <= H
    hs: jax.Array,  # [L, B, H]
    cs: jax.Array,  # [L, B, H]
    interpret: bool = False,
):
    """Returns (top [B, H], (new_hs, new_cs)).

    VMEM note: the 4-gate weight blocks are double-buffered across the
    layer grid; at H=512 that is ~8MB in bf16 (fits) but ~16MB in f32
    (exceeds the 16MB VMEM budget together with h/c/x).  Callers should
    use bf16 for large H (the serving dtype); for f32 H>=512 use the XLA
    stack step instead."""
    H = hs.shape[2]
    E = x.shape[1]
    assert E <= H, (E, H)
    if E < H:
        x = jnp.pad(x, ((0, 0), (0, H - E)))
    x = x.astype(hs.dtype)
    new_hs, new_cs = _partitioned_stack("lstm", interpret)(
        x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"], hs, cs
    )
    return new_hs[-1], (new_hs, new_cs)


def gru_stack_step_pallas(
    stacked: Dict[str, jax.Array],
    x: jax.Array,  # [B, E] with E <= H
    hs: jax.Array,  # [L, B, H]
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (top [B, H], new_hs [L, B, H])."""
    H = hs.shape[2]
    E = x.shape[1]
    assert E <= H, (E, H)
    if E < H:
        x = jnp.pad(x, ((0, 0), (0, H - E)))
    x = x.astype(hs.dtype)
    new_hs = _partitioned_stack("gru", interpret)(
        x, stacked["w_ih"], stacked["w_hh"], stacked["b_ih"], stacked["b_hh"], hs
    )
    return new_hs[-1], new_hs


def greedy_decode_pallas(
    params: Dict[str, Any],
    cfg,
    cnn_feature: jax.Array,  # [B, E]
    interpret: bool = None,
    end_token: "int | None" = None,
    vocab_sharded: "bool | None" = None,
    whole_decode: "bool | None" = None,
) -> jax.Array:
    """Greedy decode (reference rnn.py:44-58 / rnn_lstm.py:35-55
    semantics) with the fully fused Pallas step: L-layer recurrence +
    vocab projection + argmax in ONE kernel per step (neither the [B, V]
    logits nor the [B, H] top activation round-trip HBM); only the
    embedding gather stays in XLA.

    end_token: run the shared early-exit `lax.while_loop` engine
    (decoder.greedy_early_exit_loop) around the SAME Pallas step — the
    kernels trace identically under while_loop, so `--early_exit`
    composes with `--use_pallas` instead of silently dropping it."""
    from show_tell_tpu.ops.vocab_pallas import prepare_vocab

    if interpret is None:  # auto: Mosaic needs a TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    B = cnn_feature.shape[0]
    dtype = params["embedding"].dtype
    # Shape + VMEM envelope — ops.fused_pooled_step_fits, the shared seam
    # for every fused-pooled-step dispatch (beam uses the same one): E > H
    # can't ride the stacked weight stream; on a real TPU the double-
    # buffered gate weight blocks must also fit alongside the vocab
    # stream (bf16 serving shapes pass; f32 parity shapes keep the XLA
    # scan — also the measured-parity dtype path).
    # (No batch-size gate here: under a dp mesh this function traces
    # with the GLOBAL batch while the kernel's partition rule runs
    # per-shard on the local batch — a global-B gate would disable
    # the kernel exactly in the dp=8 serving configuration.  Batch
    # blocking and VMEM safety for oversized local batches live in
    # fused_step_pallas._pick_block_b + its row padding.)
    from show_tell_tpu.ops import fused_pooled_step_fits

    if not fused_pooled_step_fits(
        cfg.cell_type, cfg.hidden_dim, params["embedding"].shape[1], dtype,
        interpret=interpret,
    ):
        from show_tell_tpu.models.decoder import greedy_decode

        return greedy_decode(params, cfg, cnn_feature, end_token=end_token)
    stacked = prepare_rnn_weights(params["rnn"])
    stacked = jax.tree.map(lambda w: w.astype(dtype), stacked)
    # mp-sharded vocab projection keeps the XLA path (GSPMD's native
    # vocab-axis collectives); otherwise the fused kernel skips the
    # [B, V] logits HBM round-trip.  vocab_sharded: statically-known
    # sharding from the caller — a jitted caller must pass it, because
    # inspecting traced params conservatively reports sharded (see
    # decode/beam._sparse_projection; evaluation/tester.py passes it).
    if vocab_sharded is None:
        from show_tell_tpu.ops import vocab_projection_is_sharded

        vocab_sharded = vocab_projection_is_sharded(params["linear"])
    vocab_kernel = not vocab_sharded
    # Whole-decode: ALL T steps in one Mosaic invocation (grid runs the
    # time axis; hidden states live in VMEM scratch for the whole decode
    # and the embedding feedback is folded into the argmax merge —
    # ops/whole_decode_pallas.py).  Fixed-T only (no dynamic trip count
    # inside a Mosaic grid, so early-exit keeps the while_loop engine),
    # GRU-only, unsharded vocab projection only.
    if whole_decode is None:
        from show_tell_tpu.ops import pallas_whole_decode_default

        whole_decode = pallas_whole_decode_default()
    if (
        whole_decode
        and end_token is None
        and cfg.cell_type == "gru"
        and vocab_kernel
    ):
        from show_tell_tpu.ops.whole_decode_pallas import (
            gru_whole_greedy_decode_pallas,
            whole_decode_fits,
        )

        if whole_decode_fits(
            cfg.hidden_dim, params["embedding"].shape[1], dtype, interpret=interpret
        ):
            return gru_whole_greedy_decode_pallas(params, cfg, cnn_feature, interpret=interpret)
    if vocab_kernel:
        vocab = prepare_vocab(params["linear"])  # padded ONCE, outside the scan
    hs0 = jnp.zeros((cfg.num_layers, B, cfg.hidden_dim), dtype)
    if cfg.cell_type == "lstm":
        state0 = (hs0, jnp.zeros_like(hs0))
    else:
        state0 = hs0

    def step(x, state):
        if vocab_kernel:
            # Fully fused: L-layer recurrence + projection + argmax in ONE
            # Mosaic invocation (ops/fused_step_pallas.py) — decode is
            # overhead-bound, so collapsing the per-step kernel count is
            # the measured win on top of the logits-HBM saving.
            from show_tell_tpu.ops.fused_step_pallas import (
                fused_gru_decode_step_pallas,
                fused_lstm_decode_step_pallas,
            )

            if cfg.cell_type == "lstm":
                return fused_lstm_decode_step_pallas(
                    stacked, vocab, x, state[0], state[1], interpret=interpret
                )
            return fused_gru_decode_step_pallas(stacked, vocab, x, state, interpret=interpret)
        # mp-sharded vocab projection: recurrence kernel + XLA projection.
        if cfg.cell_type == "lstm":
            top, state2 = lstm_stack_step_pallas(stacked, x, state[0], state[1], interpret=interpret)
        else:
            top, state2 = gru_stack_step_pallas(stacked, x, state, interpret=interpret)
        logits = jnp.dot(top, params["linear"]["w"], preferred_element_type=jnp.float32) + params["linear"]["b"]
        tok = jnp.argmax(logits, axis=-1)
        return tok, state2

    x0 = cnn_feature.astype(dtype)
    if end_token is not None:
        from show_tell_tpu.models.decoder import greedy_early_exit_loop

        return greedy_early_exit_loop(
            step, params["embedding"], x0, state0, B, cfg.max_caption_length, end_token
        )

    def body(carry, _):
        x, state = carry
        tok, state2 = step(x, state)
        return (params["embedding"][tok], state2), tok

    (_, _), toks = jax.lax.scan(body, (x0, state0), None, length=cfg.max_caption_length)
    return jnp.swapaxes(toks, 0, 1)
