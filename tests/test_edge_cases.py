"""Edge cases across the stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from show_tell_tpu.evaluation.metrics import bleu_corpus, cider_corpus, evaluate, rouge_l_corpus
from show_tell_tpu.models.decoder import DecoderConfig, greedy_decode, init_decoder_params
from show_tell_tpu.decode.beam import beam_search_decode


def test_metrics_empty_hypothesis():
    """Empty prediction string must not crash any scorer (tiny/small
    guards in the BLEU math; LCS with an empty side)."""
    target = [[["a", "man", "rides"]]]
    predicted = [[]]
    scores = evaluate(target, predicted)
    assert scores["Bleu_1"] < 1e-6
    assert scores["CIDEr"] == 0.0


def test_metrics_single_word():
    scores = evaluate([[["dog"]]], [["dog"]])
    assert scores["Bleu_1"] > 0.99
    assert scores["ROUGE_L"] == pytest.approx(1.0)


def test_rouge_empty_hyp_guard():
    # candidate with one token vs refs; zero overlap -> 0.0, no div error.
    mean, _ = rouge_l_corpus({0: ["a b c"]}, {0: ["z"]})
    assert mean == 0.0


def test_decode_batch_one():
    cfg = DecoderConfig("gru", 8, 12, 20, 2, max_caption_length=6)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    feat = jnp.asarray(np.random.RandomState(0).randn(1, 8).astype(np.float32))
    ids = greedy_decode(params, cfg, feat)
    assert ids.shape == (1, 6)
    beam = beam_search_decode(params, cfg, feat, 3)
    assert beam.shape == (1, 6)


def test_beam_wider_than_needed():
    """beam_size close to vocab still works (top_k over K*V)."""
    cfg = DecoderConfig("gru", 8, 12, 10, 1, max_caption_length=4)
    params = init_decoder_params(jax.random.PRNGKey(1), cfg)
    feat = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    ids = beam_search_decode(params, cfg, feat, 8)
    assert ids.shape == (2, 4)
    assert (np.asarray(ids) < 10).all()


def test_create_batch_truncates_long_captions():
    from show_tell_tpu.data.dataset import create_batch

    img = np.zeros((4, 4, 3), np.uint8)
    samples = [("p", img, list(range(1, 40)))]
    _, _, captions, lengths = create_batch(samples, pad_length=10)
    assert captions.shape == (1, 10)
    assert lengths[0] == 10
    assert list(captions[0]) == list(range(1, 11))


def test_generic_beam_multiple_hypotheses():
    from show_tell_tpu.decode.generic import beam_search

    V, END = 4, 3

    def gen(state, _v):
        p = np.array([0.5, 0.05, 0.01, 0.44])
        return p, state

    hyps = beam_search(lambda x: 0, gen, None, start_id=0, end_id=END, beam_width=3, num_hypotheses=3, max_length=6)
    # Reference semantics (beam_search.py:96): retired hypotheses only,
    # ranked by raw cumulative -log p — shortest retirement wins here.
    assert hyps == [[0, END], [0, 0, END], [0, 0, 0, END]]


def test_coco_get_ann_ids_list():
    import json

    from show_tell_tpu.data.coco import CocoCaptions

    ds = {
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 10, "image_id": 1, "caption": "x"},
            {"id": 11, "image_id": 2, "caption": "y"},
            {"id": 12, "image_id": 1, "caption": "z"},
        ],
    }
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(ds, f)
        path = f.name
    try:
        coco = CocoCaptions(path)
        assert coco.getAnnIds([1, 2]) == [10, 12, 11]
        assert coco.getAnnIds() == [10, 11, 12]
        assert coco.loadImgs([1, 2])[1]["file_name"] == "b.jpg"
    finally:
        os.unlink(path)


def test_masked_ce_all_lengths_one():
    from show_tell_tpu.models.decoder import masked_cross_entropy

    logits = jnp.zeros((2, 5, 7))
    targets = jnp.zeros((2, 5), jnp.int32)
    lengths = jnp.ones((2,), jnp.int32)
    loss = float(masked_cross_entropy(logits, targets, lengths))
    assert loss == pytest.approx(np.log(7), rel=1e-5)
