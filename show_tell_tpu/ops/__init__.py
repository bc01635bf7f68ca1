"""Pallas TPU kernels and the measured kernel-selection policy."""

import jax


def pallas_auto_default() -> bool:
    """The measured `--use_pallas -1` auto policy (tools/tpu_smoke.py
    --bench): the FULLY fused attention decode step (attention +
    embed-space context + recurrence + projection + argmax in one
    invocation, ops/fused_attn_pallas.py — 1.38x GRU / 1.34x LSTM over
    the previous composite kernels, 2.28x over XLA, T=200 B=256) and the
    fully fused pooled-GRU decode-step kernel (ops/fused_step_pallas.py,
    1.09x per step at T=200-amplified serving shapes — the always-on
    cuDNN-fused hot loop analogue, reference rnn.py:24) win on TPU, so
    auto is ON whenever the backend is a TPU.  Per-cell refinement
    happens at the call sites: the pooled-LSTM fused step measured ~1%
    slower (models/captioner.py keeps it on the XLA scan), and the
    sparse beam top-k kernel stays off (pallas_beam_default below).
    Multi-device meshes included: every kernel carries a batch-parallel
    GSPMD partitioning rule (ops/partition.py), so under dp (or dp x mp)
    sharding it runs per-shard — the round-2 `device_count == 1`
    restriction is gone.  f32 parity shapes exceed the pooled kernel's
    VMEM budget and transparently keep the XLA scan (guard in
    rnn_pallas.greedy_decode_pallas).  On CPU/GPU backends Mosaic is
    unavailable and the XLA paths are used."""
    return jax.default_backend() == "tpu"


def pallas_whole_decode_default() -> bool:
    """Auto policy for the whole-decode kernel — ALL T greedy steps in
    ONE Mosaic invocation (ops/whole_decode_pallas.py: time axis in the
    grid, hidden states VMEM-resident across steps, embedding feedback
    folded into the argmax merge).  OFF, by measurement (round 5
    on-chip A/B, tools/tpu_smoke.py --bench `gru_greedy_whole*` rows,
    outputs bit-equal to the per-step kernel): 0.99x at T=25 / 0.96x at
    T=200 at the B=512 serving shape, 0.82x at B=1.  Root cause: the
    hypothesis behind the kernel — that the 25 per-step Mosaic
    launches, XLA embed gathers, and scan carries were the measured
    ~40 us/step residue over the analytic floor — is wrong.  Under jit
    the per-step launches are XLA-internal dispatches (~cheap), while
    the in-kernel embedding feedback makes the whole EMBEDDING TABLE
    stream from HBM every step (5.1 MB, B-INDEPENDENT) in place of a
    [L, B, H] hidden round-trip that scales with B: a wash at B=512
    (5.2 MB) minus the extra one-hot MXU work, and a pure loss at
    small B — exactly the latency regime the kernel targeted.  The
    residue is Mosaic grid-step overhead (shared by both kernels), not
    launch cost.  The kernel stays available (`whole_decode=True`,
    bit-equal tested on-chip) and the smoke rows re-measure it each
    round; see docs/ARCHITECTURE.md "Measured limits"."""
    return False


def pallas_beam_default() -> bool:
    """Auto policy for the fused projection+top-k beam step
    (ops/vocab_pallas.project_topk_pallas): OFF, by measurement.
    On-chip paired A/B (tools/tpu_smoke.py --bench, smoke_bench.json):
    GRU beam-3 at B=256 runs 0.93x with the sparse kernel — its k
    sequential max/argmax/mask passes per vocab block cost more VPU
    time than the avoided [B*K, V] logits HBM round-trip saves.
    Re-confirmed under the T=200-amplified protocol (ARCHITECTURE.md
    "How decode kernels must be measured"): XLA 104.2ms vs sparse
    kernel 111.3ms median — a real 6.8%/step loss, not noise.  The
    kernel stays available (--use_pallas 1, sparse == dense tested);
    the attention beam's win comes from the context kernel (1.23x at
    B=128), which follows pallas_auto_default, not this flag."""
    return False


def pallas_beam_fused_default():
    """Auto policy for the fused recurrence+projection BEAM step
    (ops/fused_beam_pallas.py): 'dense' | 'topk' | None (off).

    Measured round 4 (T=200-amplified protocol, B=256 bf16 serving
    shapes, paired runs; rows in smoke_bench.json): the DENSE variant —
    recurrence fused into the projection, [B*K, V] logits out, XLA
    log_softmax+top_k unchanged — wins 1.06x at K=3 (100.8 -> 94.7 ms)
    and 1.04x at K=5 (210.8 -> 202.7 ms): one Mosaic invocation replaces
    stack-step + projection and the [B*K, H] top-activation HBM
    round-trip.  The TOPK variant loses (0.88x / 0.86x) for the same
    reason the standalone sparse kernel did (0.93x): k sequential
    max/argmax/mask passes per vocab block cost more VPU time than the
    avoided logits round-trip saves — fusing the recurrence in does not
    flip that sign.  It stays available (fused_step='topk', equality
    tested).  On non-TPU backends Mosaic is unavailable: off."""
    return "dense" if jax.default_backend() == "tpu" else None


def fused_pooled_step_fits(
    cell_type: str, hidden_dim: int, embed_dim: int, dtype, interpret: bool = False
) -> bool:
    """Shape + VMEM envelope shared by every dispatch into the pooled
    fused decode-step kernels (greedy ops/fused_step_pallas.py, beam
    ops/fused_beam_pallas.py) — the ONE place the envelope lives, so a
    new call site cannot forget half of it:

      * ``embed_dim <= hidden_dim``: the kernels pad the layer-0 input
        up to H (rnn_pallas.prepare_rnn_weights / _pad_input) — wider
        inputs cannot ride the [L, H, GH] stacked-weight stream;
      * double-buffered gate-weight blocks (w_ih + w_hh, 2 x 2 x H x
        GH) within a 12MB budget next to the vocab stream: bf16 serving
        shapes (H=512 GRU 6.3MB / LSTM 8.4MB) fit, f32 parity shapes
        (12.6 / 16.8MB) keep the XLA path — which is also the
        measured-parity dtype.

    interpret=True (CPU interpreter, tests): only the shape constraint
    applies — there is no VMEM to budget, and the interpreter is how the
    oversized-f32 kernel math itself gets tested."""
    import numpy as np

    if embed_dim > hidden_dim:
        return False
    if interpret:
        return True
    n_gates = 4 if cell_type == "lstm" else 3
    gates_bytes = 2 * 2 * hidden_dim * n_gates * hidden_dim * np.dtype(dtype).itemsize
    return gates_bytes <= 12 * 1024 * 1024


def fused_attn_step_fits(
    cell_type: str, hidden_dim: int, embed_dim: int, dtype, interpret: bool = False
) -> bool:
    """Shape + VMEM envelope shared by every dispatch into the fused
    attention decode-step kernel (ops/fused_attn_pallas.py; greedy and
    beam forms):

      * ``hidden_dim <= 2 * embed_dim``: the kernel's x_buf scratch is
        [block_b, 2E] (the cat(w_emb, ctx_e) input) and the recurrence
        stages write/read H of its columns;
      * streamed [H, GH] upper-layer blocks (double-buffered) plus the
        resident [2E, GH] layer-0 weights within 14MB: the bf16 flagship
        LSTM (12.6MB estimate) compiled and won 1.34x on-chip; f32
        shapes (18.9MB GRU / 25MB LSTM) keep the composite path.

    interpret=True: shape constraint only (see fused_pooled_step_fits)."""
    import numpy as np

    if hidden_dim > 2 * embed_dim:
        return False
    if interpret:
        return True
    n_gates = 4 if cell_type == "lstm" else 3
    gates_bytes = (
        (2 * 2 * hidden_dim + 2 * embed_dim) * n_gates * hidden_dim * np.dtype(dtype).itemsize
    )
    return gates_bytes <= 14 * 1024 * 1024


def vocab_projection_is_sharded(linear) -> bool:
    """True when the output projection is tensor-sharded (mp > 1 in
    parallel/mesh.py's vocab-axis rule).  The fused projection+argmax
    kernel must not run then — its partitioning rule replicates the
    weight, which would all-gather the [H, V] matrix every decode step;
    the XLA projection keeps GSPMD's native vocab-axis collectives.
    When the sharding cannot be determined — params traced through a
    user's own jit boundary — report True (use the XLA path): correct
    either way, and it avoids the silent every-step weight all-gather
    the kernel's replicating rule would cost if the weight IS sharded.
    Plain host ndarrays (no .sharding) are unsharded by construction."""
    w = linear["w"]
    if isinstance(w, jax.core.Tracer):
        return True
    try:
        return not w.sharding.is_fully_replicated
    except AttributeError:
        return False  # host ndarray: unsharded
