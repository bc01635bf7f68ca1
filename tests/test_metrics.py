"""Golden-value metric tests (SURVEY.md §4b).

Golden numbers were generated once from the reference's vendored
coco-caption scorers (evaluation/evaluation_metrics.py) and hard-coded;
40 randomized cross-checks produced exact (1e-12) agreement at
generation time.
"""

import numpy as np
import pytest

from show_tell_tpu.evaluation.metrics import (
    bleu_corpus,
    cider_corpus,
    evaluate,
    meteor_available,
    rouge_l_corpus,
)

CASE1_TARGET = [
    [["a", "man", "rides", "a", "wave"]],
    [["two", "dogs", "play", "in", "the", "park"], ["a", "dog", "runs", "in", "grass"]],
]
CASE1_PRED = [
    ["a", "man", "rides", "a", "wave"],
    ["a", "dog", "plays", "in", "the", "park"],
]

CASE2_TARGET = [[["the", "red", "bus", "drives", "down", "the", "street"]]]
CASE2_PRED = [["a", "red", "bus", "on", "the", "street"]]


def test_evaluate_golden_case1():
    got = evaluate(CASE1_TARGET, CASE1_PRED)
    want = {
        "Bleu_1": 0.9090909089,
        "Bleu_2": 0.840874965,
        "Bleu_3": 0.7392788225,
        "Bleu_4": 0.6340466276,
        "CIDEr": 2.3241130042,
        "ROUGE_L": 0.5545454545,
    }
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_evaluate_golden_case2():
    got = evaluate(CASE2_TARGET, CASE2_PRED)
    want = {
        "Bleu_1": 0.5643211497,
        "Bleu_2": 0.437121283,
        "Bleu_3": 3.4323e-06,
        "Bleu_4": 1.03e-08,
        "CIDEr": 0.0,
        "ROUGE_L": 0.6069651741,
    }
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_faithful_vs_corrected_cider_rouge():
    """faithful=True returns the LAST image's CIDEr/ROUGE (reference
    wrapper bug, evaluation_metrics.py:707-715); faithful=False the mean."""
    gts = {i: [" ".join(t) for t in CASE1_TARGET[i]] for i in range(2)}
    res = {i: [" ".join(CASE1_PRED[i])] for i in range(2)}
    c_mean, c_per = cider_corpus(gts, res)
    faithful = evaluate(CASE1_TARGET, CASE1_PRED, faithful=True)
    corrected = evaluate(CASE1_TARGET, CASE1_PRED, faithful=False)
    assert abs(faithful["CIDEr"] - c_per[-1]) < 1e-12
    assert abs(corrected["CIDEr"] - c_mean) < 1e-12
    # BLEU is identical in both modes.
    assert faithful["Bleu_4"] == corrected["Bleu_4"]


def test_bleu_perfect_match():
    gts = {0: ["a man rides a wave"]}
    res = {0: ["a man rides a wave"]}
    scores, per_img = bleu_corpus(gts, res)
    assert all(abs(s - 1.0) < 1e-6 for s in scores)


def test_bleu_brevity_penalty():
    gts = {0: ["a man rides a big wave today"]}
    res = {0: ["a man rides"]}  # 3 vs 7 words -> BP = exp(1 - 7/3)
    scores, _ = bleu_corpus(gts, res)
    assert abs(scores[0] - 1.0 * np.exp(1 - 7 / 3)) < 1e-6


def test_bleu_closest_reflen():
    # testlen 4; reflens {3, 6}: 'closest' picks 3 -> ratio > 1, no BP;
    # 'average' picks 4.5 -> BP = exp(1 - 4.5/4) applies.
    gts = {0: ["a big dog", "a very big brown dog runs"]}
    res = {0: ["a big dog runs"]}
    closest, _ = bleu_corpus(gts, res, option="closest")
    assert abs(closest[0] - 1.0) < 1e-6
    average, _ = bleu_corpus(gts, res, option="average")
    assert abs(average[0] - np.exp(1 - 4.5 / 4)) < 1e-6


def test_cider_identical_is_10():
    # Single image, hyp == only ref: idf = log(1) ... = 0 -> score 0/0
    # guarded to 0; use 2 images to get nonzero idf.
    gts = {0: ["a man rides a wave"], 1: ["a dog in the park"]}
    res = {0: ["a man rides a wave"], 1: ["a dog in the park"]}
    mean, per = cider_corpus(gts, res)
    assert per[0] == pytest.approx(10.0)
    assert per[1] == pytest.approx(10.0)


def test_rouge_l():
    gts = {0: ["a man rides a wave"]}
    res = {0: ["a man rides a wave"]}
    mean, _ = rouge_l_corpus(gts, res)
    assert mean == pytest.approx(1.0)
    gts = {0: ["a b c d"]}
    res = {0: ["x y z w"]}
    mean, _ = rouge_l_corpus(gts, res)
    assert mean == 0.0


def test_meteor_disabled_by_default():
    assert not meteor_available()
    got = evaluate(CASE2_TARGET, CASE2_PRED)
    assert "METEOR" not in got


# ------- live differential fuzz vs the reference scorer module -------- #

REF_METRICS_PATH = "/root/reference/evaluation/evaluation_metrics.py"


def _load_reference_metrics():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_eval_metrics", REF_METRICS_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_corpus(rng, pool):
    """One (target, predicted) pair: 1-8 images, 1-5 refs each, hyp
    lengths 0-12 (empty hyps included), hyps sometimes copying a ref
    prefix so n-gram overlap actually occurs."""
    n_imgs = rng.randint(1, 9)
    target, predicted = [], []
    for _ in range(n_imgs):
        refs = [
            list(rng.choice(pool, size=rng.randint(1, 13)))
            for _ in range(rng.randint(1, 6))
        ]
        if rng.rand() < 0.4:  # hyp = prefix of a ref (high overlap)
            src = refs[rng.randint(len(refs))]
            hyp = src[: rng.randint(0, len(src) + 1)]
        else:
            hyp = list(rng.choice(pool, size=rng.randint(0, 13)))
        target.append(refs)
        predicted.append(hyp)
    return target, predicted


@pytest.mark.skipif(not __import__("os").path.exists(REF_METRICS_PATH), reason="reference checkout not available")
def test_evaluate_differential_vs_live_reference():
    """Fuzz evaluate() against the ACTUAL reference scorer module
    (evaluation_metrics.py:662-717, numpy-only, imported live): BLEU-1..4,
    CIDEr and ROUGE_L — including the wrapper's last-image CIDEr/ROUGE
    shadowing bug — must agree to 1e-12 on random corpora with varying
    ref counts, empty hypotheses, and unicode tokens."""
    ref = _load_reference_metrics()
    pool = np.array(
        ["a", "the", "man", "dog", "rides", "wave", "park", "red", "bus",
         "street", "on", "in", "two", "plays", "runs", "grass", "big",
         "café", "naïve", "東京", "niño", "über"],
        dtype=object,
    )
    rng = np.random.RandomState(7)
    keys = ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr", "ROUGE_L"]
    for trial in range(25):
        target, predicted = _random_corpus(rng, pool)
        got = evaluate(target, predicted, faithful=True)
        want = ref.evaluate(target, predicted)
        for k in keys:
            assert abs(got[k] - float(want[k])) < 1e-12, (trial, k, got[k], want[k])


def test_nltk_bleu4_method4_bit_equal_to_nltk():
    """Fuzz-pin nltk_bleu4_method4 against the INSTALLED nltk: for every
    weight tuple the one-pass value must be bit-identical (==, no
    tolerance) to corpus_bleu([refs], [hyp], w, method4) — the call the
    reference's final per-image eval pass makes (utils.py:232-246).
    Covers hyp lengths 0/1 (smoothing disabled), no-unigram-match early
    exit, zero higher-order matches (method4 smoothing with incvnt
    escalation), empty references, and brevity-penalty ties."""
    import random

    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu

    from show_tell_tpu.evaluation.metrics import nltk_bleu4_method4

    sf = SmoothingFunction()
    weights = [(1.0, 0, 0, 0), (0.5, 0.5, 0, 0), (0.34, 0.33, 0.33, 0), (0.25, 0.25, 0.25, 0.25)]
    rng = random.Random(0)
    vocab = ["a", "b", "c", "dog", "cat", "runs", "the", "on", "mat", "red"]
    for trial in range(400):
        hl = rng.choice([0, 1, 2, 3, 4, 5, 8, 12, 20])
        hyp = [rng.choice(vocab) for _ in range(hl)]
        refs = [[rng.choice(vocab) for _ in range(rng.randint(0, 15))] for _ in range(rng.randint(1, 5))]
        got = nltk_bleu4_method4(refs, hyp, weights)
        for w in range(4):
            want = corpus_bleu([refs], [hyp], weights=weights[w], smoothing_function=sf.method4)
            assert float(want) == got[w], (trial, w, hyp, refs, float(want), got[w])
