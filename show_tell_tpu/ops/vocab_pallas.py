"""Pallas TPU kernel: fused vocab projection + argmax for greedy decode.

Every greedy decode step ends with ``argmax(top @ W + b)`` over the
H=512 x V=9956 output projection — the dominant decode matmul (SURVEY
§2.3's "vocab projection" slice of the cuDNN-fused hot loop,
/root/reference/rnn.py:24,44-58).  In XLA this materializes a [B, V]
f32 logits tensor in HBM (write) that argmax immediately reads back —
at B=512 that is ~40MB of avoidable HBM traffic per step, 25x per
decode, while the matmul itself only has to stream the 10MB weight
matrix once.

This kernel runs the projection in vocab-sized blocks and keeps a
running (max, argmax) pair in VMEM scratch across the block grid, so
the only HBM traffic is the weight stream plus a [B] int32 result:

    for j in vocab blocks:            (grid, weight blocks double-buffered)
        logits_j = top @ W[:, j] + b[j]          (MXU, f32 accum)
        best    <- first-max merge with block j  (VPU)
    tok = best_idx                                (written on last block)

Tie semantics match ``jnp.argmax`` exactly: within a block the FIRST
max index wins (iota + min), across blocks a strictly-greater max is
required to displace an earlier block's winner.

V is padded up to the block size with a -1e9 bias so padded columns are
never selected; callers pad W/b ONCE per decode via ``prepare_vocab``
(outside the scan), not per step.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VOCAB_BLOCK = 512


def _pick_block_b(B: int, cap: int = 512) -> int:
    """Batch block for every decode kernel: whole batch up to `cap`,
    else cap-row blocks (the raw fns pad B > cap up to a cap multiple —
    _pad_rows).  Splitting the batch re-streams every weight block once
    per batch block, which costs more than it saves — measured on the
    fused step at B=512 bf16 serving shapes: whole-batch 6.88ms vs
    7.30ms split-256 vs 9.14ms split-128 (XLA scan 7.40ms) — so each
    kernel family keeps whole-batch blocks up to its VMEM-validated cap
    and splits beyond it (correct, though at those sizes the XLA paths
    may be preferable; the serving knee is B=512/chip and under a dp
    mesh the raw fns see the per-shard batch, so real configurations
    stay on the whole-batch fast path).  Caps: 512 for the fused step
    and the stack kernels (double-buffered gate-weight blocks dominate
    their VMEM budget); 1024 for the narrow projection kernels here
    (working set ~4MB at 1024 rows — and beam's B*K=768 rows ran
    whole-batch in every measured round; padding 768 up to 1024 was a
    measured 0.96x -> 0.86x regression on the sparse beam kernel)."""
    return B if B <= cap else cap


def _pad_rows(B: int, cap: int = 512) -> int:
    """Rows to append so B > cap splits evenly into cap-row blocks.
    Applied INSIDE the raw (per-shard) functions: under GSPMD each shard
    sees its own local B, which need not be a cap multiple even when the
    global batch is one (e.g. global 1536 over dp=2 -> 768/shard).
    Padded rows are independent batch rows of zeros (finite gate math,
    no NaN hazard) and are sliced off the outputs."""
    return (-B) % cap if B > cap else 0


def merge_block_argmax(logits, j, block_v, is_first, best_val, best_idx):
    """First-max merge of one vocab block into the running (max, argmax)
    scratch pair; is_first overrides the (uninitialized) scratch read on
    the first vocab block of each batch block.  Tie semantics match
    jnp.argmax exactly: within a block the FIRST max index wins
    (iota + min), across blocks a strictly-greater max is required to
    displace an earlier block's winner.  Shared by the standalone
    projection+argmax kernel and the fully fused decode-step kernels
    (ops/fused_step_pallas.py) — ONE source of truth for the
    parity-critical tie rule."""
    local_max = jnp.max(logits, axis=1, keepdims=True)  # [Bb, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    local_arg = (
        jnp.min(jnp.where(logits == local_max, iota, jnp.int32(2**30)), axis=1, keepdims=True)
        + j * block_v
    )
    better = (local_max > best_val[...]) | is_first
    best_val[...] = jnp.where(better, local_max, best_val[...])
    best_idx[...] = jnp.where(better, local_arg, best_idx[...])


def prepare_vocab(linear: Dict[str, jax.Array], block_v: int = VOCAB_BLOCK) -> Dict[str, jax.Array]:
    """Pad the output projection to a multiple of block_v columns.
    Padded columns get bias -1e9: finite (no NaN hazards in bf16 math)
    yet always below any real logit, so argmax never selects them."""
    w, b = linear["w"], linear["b"]
    pad = (-w.shape[1]) % block_v
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
        b = jnp.concatenate([b, jnp.full((pad,), -1e9, b.dtype)])
    return {"w": w, "b": b[None, :]}  # b as [1, Vpad] (2-D for TPU layout)


def _kernel(top_ref, w_ref, b_ref, tok_ref, best_val, best_idx, *, n_blocks, block_v):
    j = pl.program_id(1)
    logits = (
        jnp.dot(top_ref[...], w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )  # [Bb, block_v]
    merge_block_argmax(logits, j, block_v, j == 0, best_val, best_idx)

    @pl.when(j == n_blocks - 1)
    def _():
        tok_ref[...] = best_idx[...]


PROJ_ROW_CAP = 1024  # see _pick_block_b: the narrow projection kernels' envelope


def _project_argmax_raw(w, b, top, *, block_v, interpret):
    B, H = top.shape
    pad = _pad_rows(B, PROJ_ROW_CAP)
    if pad:  # keep every batch block inside the VMEM-validated envelope
        tok = _project_argmax_raw(w, b, jnp.pad(top, ((0, pad), (0, 0))),
                                  block_v=block_v, interpret=interpret)
        return tok[:B]
    Vpad = w.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B, PROJ_ROW_CAP)

    tok = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks, block_v=block_v),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        grid=(B // block_b, n_blocks),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, j: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda bb, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda bb, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda bb, j: (bb, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(top, w, b)
    return tok[:, 0]


@functools.lru_cache(maxsize=None)
def _partitioned(block_v: int, interpret: bool):
    """Batch-parallel GSPMD rule (ops/partition.py): under a dp mesh the
    kernel runs per-shard on the local batch; w/b stay replicated.  A
    vocab(mp)-SHARDED projection must not route here — forcing w
    replicated would all-gather it every step; callers keep that case in
    XLA (see models/captioner.py policy)."""
    from show_tell_tpu.ops.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_project_argmax_raw, block_v=block_v, interpret=interpret),
        arg_batch_dims=(None, None, 0),
        out_batch_dims=(0,),
        sharding_rule="h v, u v, b h -> b",
    )


def project_argmax_pallas(
    prepared: Dict[str, jax.Array],  # from prepare_vocab: w [H, Vpad], b [1, Vpad]
    top: jax.Array,  # [B, H]
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Returns argmax(top @ w + b, axis=-1) as [B] int32 — without the
    [B, V] logits HBM round-trip."""
    return _partitioned(block_v, interpret)(prepared["w"], prepared["b"], top)


def topk_block_stage(
    logits, j, is_first, is_last, block_v, k, vals_ref, idx_ref, lse_ref, m_sc, s_sc
):
    """One vocab block's contribution to per-block top-k + online
    logsumexp.  Beam search only needs each row's k best continuations
    and the softmax normalizer; the global top-k over all blocks is the
    (cheap, [B, n_blocks*k]-wide) XLA reduction of the kernel's output —
    the [B, V] logits tensor itself never reaches HBM.  is_first/is_last
    are the first/last vocab block of THIS batch block (the standalone
    kernel uses j==0 / j==n_blocks-1; the fused beam step's vocab stages
    start after its recurrence stages).  Shared by the standalone
    projection+top-k kernel and the fused recurrence+projection beam
    kernels (ops/fused_beam_pallas.py) — ONE source of truth for the
    parity-critical top-k tie rule (first index wins, like
    jax.lax.top_k)."""
    bm = jnp.max(logits, axis=1, keepdims=True)
    bs = jnp.sum(jnp.exp(logits - bm), axis=1, keepdims=True)

    @pl.when(is_first)
    def _():
        m_sc[...] = bm
        s_sc[...] = bs

    @pl.when(jnp.logical_not(is_first))
    def _():
        m2 = jnp.maximum(m_sc[...], bm)
        s_sc[...] = s_sc[...] * jnp.exp(m_sc[...] - m2) + bs * jnp.exp(bm - m2)
        m_sc[...] = m2

    # k extraction passes (k static, <= beam width): max, first-argmax,
    # mask out — same tie semantics as jax.lax.top_k (first index wins).
    # Each (batch block bb, vocab block j) grid step owns block (j, bb)
    # of the [n_blocks, B, k] results (a [1, Bb, k] block is
    # Mosaic-legal; a [Bb, k] lane-slice of [B, n_blocks*k] is not —
    # lane blocks must be 128-divisible).
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    vals = logits
    for t in range(k):
        mx = jnp.max(vals, axis=1, keepdims=True)
        arg = jnp.min(jnp.where(vals == mx, iota, jnp.int32(2**30)), axis=1, keepdims=True)
        vals_ref[0, :, t : t + 1] = mx
        idx_ref[0, :, t : t + 1] = arg + j * block_v
        vals = jnp.where(iota == arg, jnp.float32(-3e38), vals)

    @pl.when(is_last)
    def _():
        lse_ref[...] = m_sc[...] + jnp.log(s_sc[...])


def _topk_kernel(top_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref, m_sc, s_sc, *, n_blocks, block_v, k):
    j = pl.program_id(1)
    logits = (
        jnp.dot(top_ref[...], w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...].astype(jnp.float32)
    )  # [Bb, block_v]
    topk_block_stage(
        logits, j, j == 0, j == n_blocks - 1, block_v, k,
        vals_ref, idx_ref, lse_ref, m_sc, s_sc,
    )


def _project_topk_raw(w, b, top, *, k, block_v, interpret):
    B, H = top.shape
    pad = _pad_rows(B, PROJ_ROW_CAP)
    if pad:  # keep every batch block inside the VMEM-validated envelope
        vals, idx, lse = _project_topk_raw(w, b, jnp.pad(top, ((0, pad), (0, 0))),
                                           k=k, block_v=block_v, interpret=interpret)
        return vals[:B], idx[:B], lse[:B]
    Vpad = w.shape[1]
    assert Vpad % block_v == 0, (Vpad, block_v)
    n_blocks = Vpad // block_v
    block_b = _pick_block_b(B, PROJ_ROW_CAP)

    vals, idx, lse = pl.pallas_call(
        functools.partial(_topk_kernel, n_blocks=n_blocks, block_v=block_v, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, B, k), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        grid=(B // block_b, n_blocks),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda bb, j: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda bb, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda bb, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, k), lambda bb, j: (j, bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, k), lambda bb, j: (j, bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda bb, j: (bb, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(top, w, b)
    # [n_blocks, B, k] -> [B, n_blocks*k] (tiny XLA transpose+reshape).
    vals = jnp.moveaxis(vals, 0, 1).reshape(B, n_blocks * k)
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, n_blocks * k)
    return vals, idx, lse


@functools.lru_cache(maxsize=None)
def _partitioned_topk(k: int, block_v: int, interpret: bool):
    from show_tell_tpu.ops.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_project_topk_raw, k=k, block_v=block_v, interpret=interpret),
        arg_batch_dims=(None, None, 0),
        out_batch_dims=(0, 0, 0),
        sharding_rule="h v, u v, b h -> b c, b c, b u",
    )


def project_topk_pallas(
    prepared: Dict[str, jax.Array],  # from prepare_vocab
    top: jax.Array,  # [B, H]
    k: int,
    block_v: int = VOCAB_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """log_softmax top-k without materializing [B, V] logits.

    Returns (logp [B, k], ids [B, k]): each row's k best continuations
    as log-probabilities + global vocab indices.  Mathematically equal
    to ``lax.top_k(log_softmax(top @ w + b), k)`` — the global top-k of
    a row is contained in the union of its per-block top-ks."""
    vals, idx, lse = _partitioned_topk(k, block_v, interpret)(prepared["w"], prepared["b"], top)
    best, flat = jax.lax.top_k(vals, k)  # [B, k] over n_blocks*k candidates
    ids = jnp.take_along_axis(idx, flat, axis=1)
    return best - lse, ids
