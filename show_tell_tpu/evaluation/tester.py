"""The test_model flow — reference utils.py:105-247 rebuilt.

Per batch: teacher-forced loss, free-running decode (batched greedy, or
beam search), ids -> words with <end> truncation and <start> skipping,
per-batch evaluate() scores accumulated and averaged, progress prints
each 100 steps.  Afterwards: per-image target/candidate dicts pickled to
``Target_Words_Dict.pickle`` / ``Candidate_Words_Dict.pickle``
(utils.py:226-230) and a second per-image nltk corpus_bleu pass with
method4 smoothing (utils.py:232-246).

Two performance layers the reference's loop (one GPU, fully serial)
doesn't have, both output-identical by test: the loop is software-
pipelined (batch i+1's decode is dispatched before batch i's host
scoring, so the chip works under the pure-Python scoring), and under
multi-host the scoring itself round-robin-shards across processes with
the per-row score tables sum-combined over DCN.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from show_tell_tpu.data.transforms import preprocess_images
from show_tell_tpu.decode.beam import attn_beam_search_decode, beam_search_decode
from show_tell_tpu.decode.faithful_beam import faithful_beam_decode
from show_tell_tpu.evaluation import metrics
from show_tell_tpu.evaluation.metrics import evaluate
from show_tell_tpu.models.captioner import (
    CaptionerConfig,
    captioner_greedy_decode,
    captioner_loss,
    merge_params,
)
from show_tell_tpu.models.encoder import encoder_forward
from show_tell_tpu.ops import vocab_projection_is_sharded


# When False, each batch is scored before the next decode is dispatched
# (the reference's fully serial order).  Output-identical either way —
# exists so `bench.py --eval` can A/B the overlap on real hardware.
PIPELINE_SCORING = True

# When False, the eval loop's H2D staging (device_prefetch's
# one-batch-ahead placement) is disabled and each batch transfers when
# consumed — the reference's serial order.  Output-identical either way;
# exists so `bench.py --eval` can A/B the staging like PIPELINE_SCORING.
STAGE_H2D = True


def _combine_score_table(table: np.ndarray) -> np.ndarray:
    """Sum-combine a per-row score table across processes.  Each row is
    computed by exactly ONE process (round-robin shard) and left zero on
    the others, so the element-wise sum over all processes reconstructs
    the full table in its original order — means over it are bit-equal
    to a single process scoring everything.  Identity single-process;
    the simulated-worker e2e test patches this seam (a real allgather
    needs the real multi-process runtime, tests/test_multihost.py).

    The float64 rows cross the wire as uint32 BIT PATTERNS: with
    jax_enable_x64 off, process_allgather would silently truncate f64
    payloads to f32 (~1e-9 relative error — enough to break the
    bit-equality contract).  Gathering the bits is exact, and the sum
    over processes only ever adds +0.0 to each row."""
    if jax.process_count() == 1:
        return table
    from jax.experimental import multihost_utils

    bits = np.ascontiguousarray(table).view(np.uint32)  # f64 [n,k] -> u32 [n,2k]
    gathered = np.asarray(multihost_utils.process_allgather(bits))
    return gathered.view(np.float64).sum(axis=0)


def create_caption_word_format(tokenized, vocab, flag_blue: bool = False) -> List:
    """ids -> words; truncate at <end>, drop <start> (utils.py:105-123)."""
    caption_words = []
    start_idx = vocab.word_to_index[vocab.start_token()]
    for token in tokenized:
        curr_word = []
        for idx in token:
            idx = int(idx)
            if vocab.index_to_word[idx] == vocab.end_token():
                break
            if idx != start_idx:
                curr_word.append(vocab.index_to_word[idx])
        caption_words.append([curr_word] if flag_blue else curr_word)
    return caption_words


# make_test_step returns a fresh @jax.jit closure each call; the in-train
# eval (every 5 epochs, cli/run.py) calls test_model repeatedly with
# identical (cfg, flags), and each fresh closure would pay a full XLA
# recompile (~20-40s through the remote-compile tunnel). Memoize on the
# full argument key — CaptionerConfig is a hashable NamedTuple.
_TEST_STEP_CACHE: Dict[tuple, Any] = {}


def make_test_step(
    cfg: CaptionerConfig,
    beam_size: int = 0,
    augment: bool = True,
    use_pallas: Optional[bool] = None,
    compute_dtype=None,
    loss_only: bool = False,
    early_exit: bool = False,
    end_token: int = 2,
    vocab_sharded: bool = True,
    mesh=None,
):
    """Jitted (loss, decoded ids) for one batch; beam_size>0 uses the
    standard batched beam (non-attention decoders only, like the ref);
    use_pallas: None = measured auto policy (Pallas context kernel for
    attention decode on TPU), True/False force; loss_only skips the
    decode and returns the encoder features in the ids slot instead (the
    faithful-beam path decodes host-side from those feats — XLA CSEs
    this encoder_forward with the one inside captioner_loss, so the
    batch pays for ONE ResNet forward).

    early_exit (`--early_exit 1`, off by default): stop the decode loop
    — greedy and beam — as soon as every sequence/beam has emitted
    <end>, via the serving `lax.while_loop` paths.  Caption OUTPUT (and
    therefore every metric) is identical: positions after <end> become
    <pad> instead of the reference's dont-care argmax continuations, and
    `create_caption_word_format` truncates at <end> either way.  A
    trained model's mean caption is ~12 tokens, so full-val eval decode
    skips roughly half its 25 fixed steps.

    vocab_sharded: whether the output projection is mp(vocab)-sharded,
    decided by the CALLER on concrete params (test_model does) — inside
    the jitted step the params are Tracers and the sharding inspection
    would conservatively report sharded, silently disabling the fused
    vocab-projection / fused-step / sparse-beam kernels.  Defaults to
    True (the safe XLA projection) for direct callers.

    mesh: the eval mesh (parallel/mesh.make_mesh).  Batches arrive
    dp-sharded (device_prefetch) and params replicated/mp-sharded; the
    decoded ids are pinned to a REPLICATED out-sharding so GSPMD
    all-gathers the per-chip caption ids over ICI at the end of the
    step (SURVEY.md §5's eval gather) — every host then holds the full
    [B, T] ids and the host-side scoring is identical on 1 or N chips."""

    dtype = compute_dtype or jnp.float32
    cache_key = (
        cfg, beam_size, augment, use_pallas, dtype, loss_only, early_exit, end_token, vocab_sharded,
        mesh,
    )
    cached = _TEST_STEP_CACHE.get(cache_key)
    if cached is not None:
        return cached

    if mesh is not None:
        import functools

        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        jit = functools.partial(jax.jit, out_shardings=(rep, rep))
    else:
        jit = jax.jit

    @jit
    def run(trainable, frozen, bn_state, images_u8, captions, lengths, key):
        images = preprocess_images(images_u8, key, augment=augment, dtype=dtype)
        params = merge_params(trainable, frozen)
        loss, _ = captioner_loss(params, bn_state, cfg, images, captions, lengths, training=False)
        if loss_only:
            ids, _ = encoder_forward(params["encoder"], bn_state, cfg.encoder_config(), images, training=False)
        elif beam_size > 0:
            feats, _ = encoder_forward(params["encoder"], bn_state, cfg.encoder_config(), images, training=False)
            if cfg.is_attention:  # framework extension: ref is greedy-only here
                ids = attn_beam_search_decode(
                    params["decoder"], cfg.decoder_config(), feats, beam_size, cfg.start_token,
                    end_token=end_token, use_pallas=use_pallas, early_exit=early_exit,
                    vocab_sharded=vocab_sharded,
                )
            else:
                ids = beam_search_decode(
                    params["decoder"], cfg.decoder_config(), feats, beam_size,
                    end_token=end_token, use_pallas=use_pallas, early_exit=early_exit,
                    vocab_sharded=vocab_sharded,
                )
        else:
            # early_exit routes to the shared while_loop engine inside
            # the same dispatch — the --use_pallas policy (auto/forced)
            # applies identically either way.
            ids = captioner_greedy_decode(
                params, bn_state, cfg, images, use_pallas=use_pallas,
                end_token=end_token if early_exit else None,
                vocab_sharded=vocab_sharded,
            )
        return loss, ids

    _TEST_STEP_CACHE[cache_key] = run
    return run


def test_model(
    train_state,
    cfg: CaptionerConfig,
    data_loader,
    vocab,
    params: Dict[str, Any],
    device: str = "tpu",
    sub_batch_size: int = -1,
    beam_size: int = 0,
    faithful_beam: bool = False,
    seed: int = 1,
) -> Dict[str, float]:
    """Run evaluation; returns the final averaged score dict."""
    SCORE_KEYS = ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr", "ROUGE_L"]
    test_loss: List[float] = []
    accum: Dict[str, List[float]] = {k: [] for k in SCORE_KEYS}
    scored_rows: Dict[int, List[float]] = {}  # batch idx -> per-batch scores
    target_caption_full: Dict[str, list] = {}
    candidate_caption_full: Dict[str, list] = {}

    # ---- multi-host: shard the HOST-SIDE scoring by batch.  The decoded
    # ids are all-gathered on device (replicated out-sharding), so every
    # process holds every caption; but the expensive pure-Python scoring
    # (evaluate()'s n-gram counting / CIDEr tf-idf, and the final
    # per-image corpus-BLEU pass) would otherwise run IDENTICALLY on all
    # hosts.  Instead process p scores batches with idx % nproc == p (and
    # images i % nproc == p in the corpus pass); each row of the score
    # table is computed by exactly ONE process and the tables are
    # sum-combined over DCN (process_allgather) before averaging — the
    # values, their order, and therefore the final means are bit-equal to
    # the single-process run (pinned by tests/test_multihost.py).  Word
    # formatting and the caption dicts stay on every process: they are
    # cheap and the primary needs the full dicts for the pickles.
    nproc, proc_id = jax.process_count(), jax.process_index()

    if sub_batch_size == -1:
        sub_batch_size = len(data_loader)

    if params.get("compute_dtype") == "bfloat16":
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t
        )
        train_state = train_state._replace(
            trainable=cast(train_state.trainable),
            frozen=cast(train_state.frozen),
            bn_state=cast(train_state.bn_state),
        )

    # ---- eval mesh: the north-star val2014 workload must use ALL chips.
    # Mirrors the train loop's condition: dp defaults to every visible
    # device (reference utils.py:147-247 runs eval on the one GPU; here a
    # v5e-8 decodes 8 batch shards per step).  --mp additionally tensor-
    # shards the decoder's vocab-sized params (serve.Captioner's rule).
    # Full batches shard over dp; the drop_last=False tail batch runs
    # replicated (device_prefetch) — bit-identical scores either way.
    mp = int(params.get("mp", 1) or 1)
    n_dev = int(params.get("dp", 0) or 0) or len(jax.devices()) // mp
    eval_batch = getattr(data_loader, "batch_size", params.get("batch_size", 0))
    mesh = None
    if n_dev * mp > 1 and eval_batch and eval_batch % n_dev == 0:
        from show_tell_tpu.parallel.mesh import make_mesh, replicate, shard_train_state

        if mp > 1 and cfg.vocab_size % mp:
            raise ValueError(
                "--mp %d does not divide vocab_size %d; the eval loss path "
                "cannot pad the vocab (serve.Captioner can — decode-only)"
                % (mp, cfg.vocab_size)
            )
        mesh = make_mesh(dp=n_dev, mp=mp)
        train_state = shard_train_state(mesh, train_state, tensor_parallel=(mp > 1))
        print("Data-parallel eval over %d devices%s."
              % (n_dev * mp, " (mp=%d vocab-sharded)" % mp if mp > 1 else ""))
    elif mp > 1 or int(params.get("dp", 0)) > 1:
        # An explicit parallel request that cannot form a mesh must not
        # silently fall back to one device.
        raise ValueError(
            "eval mesh dp=%d x mp=%d cannot form: %d devices visible and the "
            "eval batch size %s must divide dp" % (n_dev, mp, len(jax.devices()), eval_batch)
        )
    elif len(jax.devices()) > 1:
        # Default dp=0 with a batch size the device count does not divide:
        # legal, but the whole eval runs on ONE chip — say so instead of
        # silently idling the other devices (the north-star workload).
        import sys as _sys

        print(
            "Eval batch size %s does not divide the %d visible devices; "
            "running single-device (pass --batch_size a multiple of the "
            "device count, or --dp, to shard the eval)."
            % (eval_batch, len(jax.devices())),
            file=_sys.stderr,
        )

    eval_augment = bool(params.get("eval_augment", 1))
    eval_dtype = jnp.bfloat16 if params.get("compute_dtype") == "bfloat16" else jnp.float32
    use_faithful = faithful_beam and beam_size > 0
    up_flag = int(params.get("use_pallas", -1))  # -1 auto / 0 off / 1 on
    step_fn = make_test_step(
        cfg,
        0 if faithful_beam else beam_size,
        # The reference augments (random flips) at test time (utils.py:96);
        # --eval_augment 0 pins eval deterministic (SURVEY.md §7).
        augment=eval_augment,
        use_pallas=None if up_flag == -1 else bool(up_flag),
        compute_dtype=eval_dtype,
        loss_only=use_faithful,
        # --faithful_beam decodes host-side step by step; early_exit only
        # shapes the jitted decode loops.
        early_exit=bool(params.get("early_exit", 0)) and not use_faithful,
        end_token=vocab.word_to_index[vocab.end_token()],
        # Decided here, on the CONCRETE params — inside the jitted step
        # the inspection would see Tracers and wrongly disable the
        # vocab/fused-step kernels (r3 continuation review finding).
        vocab_sharded=vocab_projection_is_sharded(
            train_state.trainable["decoder"]["linear"]
        ),
        mesh=mesh,
    )
    key = jax.random.PRNGKey(seed)

    start_time = time.time()
    print("Testing started.")
    print("Sub-batch size - ", sub_batch_size)
    # Batches are device_put (dp-sharded under a mesh) one step ahead so
    # the H2D transfer overlaps the previous batch's decode — the train
    # loop's prefetch pattern (data/device_prefetch.py).
    from show_tell_tpu.data.device_prefetch import device_prefetch

    # Scoring thread pool: evaluate()'s hot path is the NATIVE scorer
    # (fastmetrics.cpp) whose ctypes call releases the GIL, so on a
    # multi-core eval host the per-batch scoring parallelizes nearly
    # linearly (a v5e-8's 8-way decode outruns one scoring core ~4x).
    # Results are DRAINED IN BATCH ORDER (futures resolved idx-ascending
    # at every print boundary and at the end), so every accumulation,
    # print, and final score is bit-identical to the serial loop —
    # pinned by test (tests/test_eval_sharded.py).  0 = auto: one
    # worker per spare host core, capped at 8; serial below 2.
    score_threads = int(params.get("score_threads", 0) or 0)
    if score_threads <= 0:
        score_threads = min(8, (os.cpu_count() or 1) - 1)
    executor = None
    if score_threads > 1 and not use_faithful:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=score_threads)
    score_futures: Dict[int, Any] = {}

    def _resolve_scores(upto: Optional[int] = None) -> None:
        """Fold finished scoring futures into scored_rows/accum in idx
        order (deterministic float accumulation)."""
        for i in sorted(score_futures):
            if upto is not None and i > upto:
                break
            row = score_futures.pop(i).result()
            scored_rows[i] = row
            for k, v in zip(SCORE_KEYS, row):
                accum[k].append(v)

    def _score_one(target_words, predicted_words):
        eval_scores = evaluate(target_words, predicted_words)
        return [eval_scores[k] for k in SCORE_KEYS]

    def consume(idx, img_paths, captions, loss, ids):
        """Host-side scoring of one decoded batch (blocks on the device
        results).  Runs one batch BEHIND the dispatch loop so the chip
        decodes batch i+1 while the host scores batch i — the scoring is
        the eval bottleneck on a real TPU host, so the decode rides
        under it for free.  Accumulation order and every printed line
        are identical to the unpipelined loop (reference
        utils.py:168-224)."""
        test_loss.append(float(loss))

        predicted_words = create_caption_word_format(np.asarray(ids), vocab, False)
        target_words = create_caption_word_format(np.asarray(captions), vocab, True)

        for imgs, tgt, pdt in zip(img_paths, target_words, predicted_words):
            if imgs in target_caption_full:
                target_caption_full[imgs].extend(tgt)
                candidate_caption_full[imgs].append(pdt)
            else:
                target_caption_full[imgs] = list(tgt)
                candidate_caption_full[imgs] = [pdt]

        if idx % nproc == proc_id:  # nproc == 1: every batch
            if executor is not None:
                score_futures[idx] = executor.submit(_score_one, target_words, predicted_words)
            else:
                scored_rows[idx] = _score_one(target_words, predicted_words)
                for k, v in zip(SCORE_KEYS, scored_rows[idx]):
                    accum[k].append(v)

        # Single-process: running means over every batch so far, exactly
        # the reference print; multi-host: over this process' shard.
        if (idx + 1) % 100 == 0:
            _resolve_scores(upto=idx)
            _m = lambda k: float(np.mean(accum[k])) if accum[k] else 0.0
            print(
                "Step %d - %0.4f test loss, %0.2f time, %.3f BLEU1, %.3f BLEU2, %.3f BLEU3, %.3f BLEU4, %.3f CIDEr, %.3f ROUGE_L."
                % (
                    idx + 1,
                    float(loss),
                    time.time() - start_time,
                    _m("Bleu_1") * 100.0,
                    _m("Bleu_2") * 100.0,
                    _m("Bleu_3") * 100.0,
                    _m("Bleu_4") * 100.0,
                    _m("CIDEr") * 100.0,
                    _m("ROUGE_L") * 100.0,
                )
            )

    pending = None  # one in-flight batch: (idx, img_paths, captions, loss, ids)
    try:
        for idx, (img_paths, images, captions, lengths) in enumerate(
            device_prefetch(
                data_loader, mesh=mesh, replicated_indices=(2, 3), stage_ahead=STAGE_H2D
            )
        ):
            if idx == sub_batch_size:
                break
            key, sub = jax.random.split(key)
            loss, ids = step_fn(
                train_state.trainable, train_state.frozen, train_state.bn_state, images, captions, lengths, sub
            )
            if use_faithful:
                # loss_only step returned the encoder feats in the ids slot
                # (same flip draw as the loss; one ResNet forward per batch).
                # The beam decode itself runs on the HOST step by step, so
                # there is no device work to pipeline — consume in place.
                full = merge_params(train_state.trainable, train_state.frozen)
                ids = faithful_beam_decode(full["decoder"], cfg.decoder_config(), ids, beam_size)[None, :]
                consume(idx, img_paths, captions, loss, ids)
                continue
            if pending is not None:
                consume(*pending)
            pending = (idx, img_paths, captions, loss, ids)
            if not PIPELINE_SCORING:  # bench A/B: score in place (reference order)
                consume(*pending)
                pending = None
        if pending is not None:
            consume(*pending)
        _resolve_scores()
    finally:
        if executor is not None:
            executor.shutdown(wait=True)

    # Reassemble the full per-batch score table (multi-host: each row was
    # computed by exactly one process) and average it in batch order.
    table = np.zeros((len(test_loss), len(SCORE_KEYS)), np.float64)
    for i, row in scored_rows.items():
        table[i] = row
    table = _combine_score_table(table)
    final = {k: float(np.mean(table[:, j])) for j, k in enumerate(SCORE_KEYS)}
    final["test_loss"] = float(np.mean(test_loss))
    print(
        "%0.4f test loss, %0.2f time, %.3f BLEU1, %.3f BLEU2, %.3f BLEU3, %.3f BLEU4, %.3f CIDEr, %.3f ROUGE_L."
        % (
            final["test_loss"],
            time.time() - start_time,
            final["Bleu_1"] * 100.0,
            final["Bleu_2"] * 100.0,
            final["Bleu_3"] * 100.0,
            final["Bleu_4"] * 100.0,
            final["CIDEr"] * 100.0,
            final["ROUGE_L"] * 100.0,
        )
    )

    # Multi-host: every process holds identical captions (decoded ids are
    # all-gathered on device, loaders are deterministic), so each computes
    # the same scores; only the PRIMARY writes the metric pickles — N
    # processes racing the same files on a shared filesystem would tear
    # them (same rule as train checkpoints).
    from show_tell_tpu.parallel.multihost import is_primary

    if is_primary():
        with open(os.path.join(params["output_dir"], "Target_Words_Dict.pickle"), "wb") as f:
            pickle.dump(target_caption_full, f)
        with open(os.path.join(params["output_dir"], "Candidate_Words_Dict.pickle"), "wb") as f:
            pickle.dump(candidate_caption_full, f)

    # ------ per-image nltk corpus BLEU pass (utils.py:232-246) -------- #
    # The native scorer (fastmetrics.corpus_bleu4_sums, ~12x) and
    # nltk_bleu4_method4 (one-pass Python, ~7x) are both bit-equal to
    # the reference's 4 corpus_bleu(method4) calls per candidate
    # (fuzz-pinned in tests/test_metrics.py and tests/test_native.py).
    from show_tell_tpu.native import fastmetrics

    weights = [(1.0, 0, 0, 0), (0.5, 0.5, 0, 0), (0.34, 0.33, 0.33, 0), (0.25, 0.25, 0.25, 0.25)]
    # Dict insertion order is identical on every process (same loader
    # stream, same batches), so image i % nproc == proc_id shards the
    # corpus pass deterministically; the per-image score rows sum-combine
    # the same way as the per-batch table above.
    img_names = list(target_caption_full)
    corpus_rows = np.zeros((len(img_names), 4), np.float64)
    for i, img_nm in enumerate(img_names):
        if i % nproc != proc_id:
            continue
        cands = candidate_caption_full[img_nm]
        refs = target_caption_full[img_nm]
        sums = fastmetrics.corpus_bleu4_sums(refs, cands, weights)
        if sums is None:  # Python path: unavailable lib or exotic tokens
            sums = [0.0] * 4
            for cand in cands:
                vals = metrics.nltk_bleu4_method4(refs, cand, weights)
                for w in range(4):
                    sums[w] += vals[w]
        for w in range(4):
            corpus_rows[i, w] = sums[w] / len(cands)
    corpus_rows = _combine_score_table(corpus_rows)
    for w in range(4):
        final["Final_Bleu_%d" % (w + 1)] = float(np.mean(corpus_rows[:, w])) if len(img_names) else 0.0
    print(
        "%0.4f test loss, %0.2f time, %.3f Final BLEU1, %.3f Final BLEU2, %.3f Final BLEU3, %.3f Final BLEU4"
        % (
            final["test_loss"],
            time.time() - start_time,
            final["Final_Bleu_1"] * 100.0,
            final["Final_Bleu_2"] * 100.0,
            final["Final_Bleu_3"] * 100.0,
            final["Final_Bleu_4"] * 100.0,
        )
    )
    print("Testing completed.")
    return final
