"""Serving API + device prefetch tests."""

import os

import numpy as np
import pytest

import jax

from fixtures import build_mini_coco
from show_tell_tpu.cli.run import run
from show_tell_tpu.serve import Captioner


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    data_root = os.path.join(root, "data")
    out_dir = os.path.join(root, "out")
    build_mini_coco(data_root)
    os.makedirs(out_dir, exist_ok=True)
    run(
        "gru",
        [
            "--data_dir", data_root, "--output_dir", out_dir,
            "--train_ann_path", "annotations/captions_train2014.json",
            "--test_ann_path", "annotations/captions_train2014.json",
            "--train_img_dir", "train2014", "--test_img_dir", "train2014",
            "--vocab_threshold", "1", "--embedding_length", "16",
            "--num_hidden_units", "24", "--num_layers", "1", "--batch_size", "4",
            "--num_epochs", "1", "--resnet_version", "18",
            "--optimizer_type", "Adam", "--is_training", "1", "--is_testing", "0",
        ],
    )
    return data_root, out_dir


def test_captioner_from_our_checkpoint(trained):
    data_root, out_dir = trained
    cap = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"),
        os.path.join(out_dir, "vocab.pkl"),
        variant="gru",
        resnet_version=18,
        embed_dim=16,
        hidden_dim=24,
        num_layers=1,
        compute_dtype="float32",
    )
    images = np.random.RandomState(0).randint(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    caps = cap.caption(images)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    # greedy/beam agree on the decoded prefix for beam_size=1 semantics
    caps_beam = cap.caption(images, beam_size=2)
    assert len(caps_beam) == 2

    ids = cap.caption_ids(images)
    assert ids.shape == (2, 25)


def test_captioner_files(trained):
    data_root, out_dir = trained
    img_dir = os.path.join(data_root, "train2014")
    paths = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:3]]
    cap = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"),
        os.path.join(out_dir, "vocab.pkl"),
        variant="gru",
        resnet_version=18,
        embed_dim=16,
        hidden_dim=24,
        num_layers=1,
        compute_dtype="float32",
    )
    caps = cap.caption_files(paths)
    assert len(caps) == 3


def test_device_prefetch():
    from show_tell_tpu.data.device_prefetch import device_prefetch

    batches = [
        (("p%d" % i,), np.full((2, 4, 4, 3), i, np.uint8), np.full((2, 5), i, np.int32), np.full((2,), 5, np.int32))
        for i in range(4)
    ]
    out = list(device_prefetch(batches))
    assert len(out) == 4
    for i, b in enumerate(out):
        assert b[0] == ("p%d" % i,)
        assert isinstance(b[1], jax.Array)
        assert int(np.asarray(b[1])[0, 0, 0, 0]) == i
    assert list(device_prefetch([])) == []


def test_captioner_dp_serving_matches_single_device(trained):
    """dp=8 sharded serving must produce the same captions."""
    data_root, out_dir = trained
    assert len(jax.devices()) >= 8
    kw = dict(
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32",
    )
    ckpt = os.path.join(out_dir, "model_1.ckpt")
    vocab = os.path.join(out_dir, "vocab.pkl")
    single = Captioner.from_checkpoint(ckpt, vocab, **kw)
    images = np.random.RandomState(1).randint(0, 255, (8, 224, 224, 3), dtype=np.uint8)
    ref = single.caption(images)

    dp_cap = Captioner(
        {"encoder": single.params["encoder"], "decoder": single.params["decoder"]},
        single.bn_state, single.cfg, single.vocab, compute_dtype="float32", dp=8,
    )
    got = dp_cap.caption(images)
    assert got == ref
