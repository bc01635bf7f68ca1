"""Sharded evaluation: test_model on a dp (and dp x mp) mesh must score
bit-equal to single-device — the north-star val2014 eval workload
(reference utils.py:147-247) actually using every chip (SURVEY.md §5's
"all_gather of per-chip caption ids at eval").
"""

import numpy as np
import pytest

import jax

from show_tell_tpu.models.captioner import CaptionerConfig
from show_tell_tpu.train.optim import make_optimizer
from show_tell_tpu.train.train_step import create_train_state

VOCAB = 40  # even: divides mp=2


class _Vocab:
    def __init__(self, size=VOCAB):
        self.index_to_word = ["<pad>", "<start>", "<end>", "<unk>"] + [
            "w%d" % i for i in range(4, size)
        ]
        self.word_to_index = {w: i for i, w in enumerate(self.index_to_word)}

    def start_token(self):
        return "<start>"

    def end_token(self):
        return "<end>"

    def __len__(self):
        return len(self.index_to_word)


class _Loader:
    """Minimal eval loader: 2 full batches of 8 plus a 3-row tail (the
    drop_last=False partial batch that must run replicated on the mesh)."""

    batch_size = 8

    def __init__(self, seed=0, tail=3):
        rng = np.random.RandomState(seed)
        self.batches = []
        n = 0
        for rows in (8, 8, tail):
            if rows == 0:
                continue
            imgs = rng.randint(0, 255, (rows, 64, 64, 3), dtype=np.uint8)
            lengths = np.sort(rng.randint(4, 10, rows))[::-1].astype(np.int32).copy()
            caps = np.zeros((rows, 12), np.int32)
            for b in range(rows):
                caps[b, : lengths[b]] = rng.randint(4, VOCAB, lengths[b])
            paths = tuple("img_%d.jpg" % (n + i) for i in range(rows))
            n += rows
            self.batches.append((paths, imgs, caps, lengths))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _cfg(variant="gru"):
    kw = dict(nos_filters=512, attn_dim=16) if variant.startswith("attn") else {}
    return CaptionerConfig(
        variant=variant,
        resnet_version=18,
        embed_dim=16,
        hidden_dim=32,
        vocab_size=VOCAB,
        num_layers=2,
        max_caption_length=8,
        **kw,
    )


def _run_eval(tmp_path, variant, dp, mp=1, beam_size=0, tail=3, seed_model=0, score_threads=None):
    from show_tell_tpu.evaluation.tester import test_model

    cfg = _cfg(variant)
    ts = create_train_state(jax.random.PRNGKey(seed_model), cfg, make_optimizer("SGD", 0.01, 0.9))
    out = str(tmp_path / ("out_dp%d_mp%d_%s_b%d" % (dp, mp, variant, beam_size)))
    import os

    os.makedirs(out, exist_ok=True)
    params = {"output_dir": out, "dp": dp, "mp": mp, "use_pallas": 0}
    if score_threads is not None:
        params["score_threads"] = score_threads
    return test_model(
        ts, cfg, _Loader(tail=tail), _Vocab(), params, beam_size=beam_size, seed=7
    )


@pytest.mark.parametrize("variant", ["gru", "attn"])
def test_eval_dp8_bit_equal(tmp_path, variant):
    """dp=8 sharded eval == single-device eval: metric keys bit-equal
    (ids are gathered on device), loss equal to float tolerance."""
    ref = _run_eval(tmp_path, variant, dp=1)
    dp8 = _run_eval(tmp_path, variant, dp=8)
    for k in ref:
        if k == "test_loss":
            np.testing.assert_allclose(dp8[k], ref[k], rtol=1e-5)
        else:
            assert dp8[k] == ref[k], (k, dp8[k], ref[k])


def test_eval_dp4_mp2_bit_equal(tmp_path):
    """dp=4 x mp=2 hybrid: vocab-sharded projection (the serve rule) under
    the eval mesh, scores bit-equal to single-device."""
    ref = _run_eval(tmp_path, "gru", dp=1)
    tp = _run_eval(tmp_path, "gru", dp=4, mp=2)
    for k in ref:
        if k == "test_loss":
            np.testing.assert_allclose(tp[k], ref[k], rtol=1e-5)
        else:
            assert tp[k] == ref[k], (k, tp[k], ref[k])


def test_eval_beam_dp8_bit_equal(tmp_path):
    """Beam-search eval decodes identically under the dp mesh."""
    ref = _run_eval(tmp_path, "gru", dp=1, beam_size=2)
    dp8 = _run_eval(tmp_path, "gru", dp=8, beam_size=2)
    for k in ref:
        if k == "test_loss":
            np.testing.assert_allclose(dp8[k], ref[k], rtol=1e-5)
        else:
            assert dp8[k] == ref[k], (k, dp8[k], ref[k])


def test_eval_serial_scoring_identical(tmp_path):
    """PIPELINE_SCORING=False (bench A/B: each batch scored before the
    next decode dispatch, the reference's serial order) returns the exact
    score dict of the pipelined loop."""
    from show_tell_tpu.evaluation import tester

    ref = _run_eval(tmp_path, "gru", dp=1)
    tester.PIPELINE_SCORING = False
    try:
        serial = _run_eval(tmp_path, "gru", dp=1, seed_model=0)
    finally:
        tester.PIPELINE_SCORING = True
    assert serial == ref


def test_eval_mesh_rejects_impossible_request(tmp_path):
    """An explicit --dp/--mp that cannot form a mesh must raise, not fall
    back to one device silently."""
    with pytest.raises(ValueError):
        _run_eval(tmp_path, "gru", dp=3)  # batch 8 does not divide dp=3


def test_eval_mp_must_divide_vocab(tmp_path):
    from show_tell_tpu.evaluation.tester import test_model

    cfg = _cfg("gru")._replace(vocab_size=41)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer("SGD", 0.01, 0.9))
    params = {"output_dir": str(tmp_path), "dp": 4, "mp": 2}
    with pytest.raises(ValueError, match="vocab_size"):
        test_model(ts, cfg, _Loader(), _Vocab(41), params)


def test_eval_score_thread_pool_bit_equal(tmp_path):
    """--score_threads 4 (host scoring parallelized across a thread
    pool; futures drained in batch order) returns the exact score dict
    of the serial loop — including the per-batch table means and the
    Final_Bleu rows, which depend on float accumulation order."""
    ref = _run_eval(tmp_path, "gru", dp=1, score_threads=1)
    pooled = _run_eval(tmp_path, "gru", dp=1, score_threads=4, seed_model=0)
    assert set(ref) == set(pooled)
    for k in ref:
        if k == "test_loss":
            np.testing.assert_allclose(pooled[k], ref[k], rtol=1e-5)
        else:
            assert pooled[k] == ref[k], (k, pooled[k], ref[k])
