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
