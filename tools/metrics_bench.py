"""Host-side metrics throughput: our evaluate() vs the reference's own
vendored scorer module (/root/reference/evaluation/evaluation_metrics.py
:662-717), imported live and timed on identical corpora.

The eval loop calls evaluate() once per batch (reference utils.py:201);
on the full 40,504-image COCO val set that is ~1,266 B=32 batches of
pure host Python, so scorer throughput is real eval wall-time.  Our
implementation shares one tokenize+count pass across BLEU/CIDEr/ROUGE
(evaluation/metrics.py) where the reference re-tokenizes per scorer.

Usage: python tools/metrics_bench.py [n_batches] [batch_size]
Prints one JSON line: batches/s for both, speedup, and the numeric
agreement check on the timed corpora.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from show_tell_tpu.evaluation.metrics import evaluate  # noqa: E402

REF_METRICS_PATH = "/root/reference/evaluation/evaluation_metrics.py"


def _load_reference_metrics():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_eval_metrics", REF_METRICS_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _coco_like_corpus(rng, batch_size):
    """One eval batch shaped like COCO val: batch_size images, 5 refs of
    ~10 tokens each, one ~10-token hypothesis sharing vocabulary with
    the refs (captions overlap heavily in practice — that drives the
    n-gram count work)."""
    pool = np.array(
        "a the man woman dog cat rides sits wave park red blue bus train "
        "street kitchen on in at two three plays runs grass field big "
        "small group people standing holding plate table food water".split(),
        dtype=object,
    )
    target, predicted = [], []
    for _ in range(batch_size):
        refs = [list(rng.choice(pool, size=rng.randint(8, 13))) for _ in range(5)]
        hyp = list(rng.choice(pool, size=rng.randint(8, 13)))
        if rng.rand() < 0.5:  # half the hyps copy a ref prefix (high overlap)
            src = refs[rng.randint(5)]
            hyp = src[: rng.randint(6, len(src) + 1)]
        target.append(refs)
        predicted.append(hyp)
    # reference evaluate() takes target as list-of-list-of-token-lists per
    # image and predicted as token lists — same shapes test_model feeds.
    return target, predicted


def main(n_batches: int = 50, batch_size: int = 32):
    if not os.path.exists(REF_METRICS_PATH):
        print(json.dumps({"error": "reference checkout not available", "path": REF_METRICS_PATH}))
        return
    ref = _load_reference_metrics()
    rng = np.random.RandomState(0)
    batches = [_coco_like_corpus(rng, batch_size) for _ in range(n_batches)]

    # agreement check on the timed corpora (the live differential fuzz in
    # tests/test_metrics.py is the real gate; this pins THESE inputs)
    t0, p0 = batches[0]
    ours0, ref0 = evaluate(t0, p0), ref.evaluate(t0, p0)
    # shared keys only: with meteor-1.5.jar present our evaluate() adds a
    # METEOR key the reference's never emits (commented out at its :682)
    max_delta = max(abs(ours0[k] - ref0[k]) for k in ours0 if k in ref0)

    for fn in (evaluate, ref.evaluate):  # warm both (allocs, caches)
        fn(*batches[0])

    t0 = time.perf_counter()
    for t, p in batches:
        evaluate(t, p)
    ours_rate = n_batches / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    for t, p in batches:
        ref.evaluate(t, p)
    ref_rate = n_batches / (time.perf_counter() - t0)

    full_val_batches = 40504 / batch_size  # COCO val2014 (SURVEY.md §6)
    print(
        json.dumps(
            {
                "metric": "evaluate_batches_per_sec",
                "value": round(ours_rate, 2),
                "unit": "B=%d batches/s (host)" % batch_size,
                "vs_baseline": round(ours_rate / ref_rate, 3),
                "reference_batches_per_sec": round(ref_rate, 2),
                "max_score_delta": max_delta,
                "full_coco_val_scoring_minutes_ours": round(full_val_batches / ours_rate / 60, 2),
                "full_coco_val_scoring_minutes_reference": round(full_val_batches / ref_rate / 60, 2),
            }
        )
    )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a.isdigit()]
    main(int(args[0]) if args else 50, int(args[1]) if len(args) > 1 else 32)
