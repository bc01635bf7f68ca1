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


def test_captioner_staged_input_matches_host(trained):
    """caption_ids accepts a pre-staged device batch (the overlap
    pipeline stages on the loader thread so H2D overlaps compute) and
    produces identical ids to the host-numpy path — unsharded and
    under a dp mesh (stage() shards)."""
    data_root, out_dir = trained
    kw = dict(variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
              num_layers=1, compute_dtype="float32")
    images = np.random.RandomState(1).randint(0, 255, (8, 224, 224, 3), dtype=np.uint8)

    cap = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"), os.path.join(out_dir, "vocab.pkl"), **kw)
    staged = cap.stage(images)
    assert isinstance(staged, jax.Array)
    np.testing.assert_array_equal(cap.caption_ids(staged), cap.caption_ids(images))

    cap_dp = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"), os.path.join(out_dir, "vocab.pkl"),
        dp=8, **kw)
    np.testing.assert_array_equal(
        cap_dp.caption_ids(cap_dp.stage(images)), cap.caption_ids(images))


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
    # stage_ahead=False (the bench.py --eval H2D-staging A/B): identical
    # batches in identical order, just placed when consumed
    serial = list(device_prefetch(batches, stage_ahead=False))
    assert len(serial) == 4
    for a, b in zip(out, serial):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert list(device_prefetch([], stage_ahead=False)) == []


def test_device_prefetch_local_rows_divide_globally(monkeypatch):
    """Multi-host: a local-rows element holds batch/nproc rows but shards
    over the GLOBAL dp axis, so divisibility must be checked on GLOBAL
    rows — local 4 x nproc 2 over dp=8 is a valid train batch (1 row per
    device), while a genuinely indivisible global count still raises."""
    import pytest as _pytest

    import show_tell_tpu.data.device_prefetch as dpf
    from show_tell_tpu.parallel import mesh as mesh_mod
    from show_tell_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    calls = []
    monkeypatch.setattr(
        mesh_mod, "put_sharded",
        lambda x, sh, local_rows=False: calls.append((x.shape, local_rows)) or x,
    )
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    batch = (("p",), np.zeros((4, 4, 4, 3), np.uint8),
             np.zeros((8, 5), np.int32), np.full((8,), 5, np.int32))
    out = list(dpf.device_prefetch([batch], mesh=mesh, local_indices=(1,),
                                   replicated_indices=(2, 3)))
    assert len(out) == 1
    assert calls[0] == ((4, 4, 4, 3), True)  # sharded, not rejected

    bad = (("p",), np.zeros((3, 4, 4, 3), np.uint8),
           np.zeros((8, 5), np.int32), np.full((8,), 5, np.int32))
    with _pytest.raises(ValueError, match="local rows"):
        list(dpf.device_prefetch([bad], mesh=mesh, local_indices=(1,),
                                 replicated_indices=(2, 3)))


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


def test_captioner_dp_mp_serving_matches_single_device(trained):
    """dp=4 x mp=2 (vocab-sharded projection + embedding) serving must
    produce the same captions as single-device — the TP serving path."""
    data_root, out_dir = trained
    assert len(jax.devices()) >= 8
    kw = dict(
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32",
    )
    ckpt = os.path.join(out_dir, "model_1.ckpt")
    vocab = os.path.join(out_dir, "vocab.pkl")
    single = Captioner.from_checkpoint(ckpt, vocab, **kw)
    images = np.random.RandomState(2).randint(0, 255, (8, 224, 224, 3), dtype=np.uint8)
    ref = single.caption(images)

    tp_cap = Captioner.from_checkpoint(ckpt, vocab, dp=4, mp=2, **kw)
    # vocab-sized tensors actually sharded over mp
    lin_sh = tp_cap.params["decoder"]["linear"]["w"].sharding
    assert lin_sh.spec == jax.sharding.PartitionSpec(None, "mp"), lin_sh
    emb_sh = tp_cap.params["decoder"]["embedding"].sharding
    assert emb_sh.spec == jax.sharding.PartitionSpec("mp", None), emb_sh
    got = tp_cap.caption(images)
    assert got == ref
    # beam search over the sharded logits too
    assert tp_cap.caption(images, beam_size=2) == single.caption(images, beam_size=2)


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_captioner_attn_sharded_serving_matches_single_device(trained, dp, mp):
    """Attention-variant serving over dp=8 and dp=4 x mp=2 meshes must
    produce single-device captions — the attention param tree (attn
    projections, init_h/init_c) sharded end-to-end, incl. the Pallas
    context kernel's GSPMD rule when auto-on (SURVEY §4e; VERDICT r2
    item 3)."""
    from show_tell_tpu.models.captioner import CaptionerConfig, init_captioner
    from show_tell_tpu.vocab.vocabulary import load_vocab

    data_root, out_dir = trained
    assert len(jax.devices()) >= 8
    vocab = load_vocab(os.path.join(out_dir, "vocab.pkl"))
    cfg = CaptionerConfig(
        variant="attn_lstm", resnet_version=18, embed_dim=16, hidden_dim=24,
        vocab_size=len(vocab), num_layers=1, nos_filters=512, attn_dim=16,
    )
    params, bn_state = init_captioner(jax.random.PRNGKey(3), cfg)
    images = np.random.RandomState(4).randint(0, 255, (8, 224, 224, 3), dtype=np.uint8)

    single = Captioner(params, bn_state, cfg, vocab, compute_dtype="float32")
    ref = single.caption(images)
    sharded = Captioner(params, bn_state, cfg, vocab, compute_dtype="float32", dp=dp, mp=mp)
    if mp > 1:  # vocab-sized tensors actually sharded over mp
        lin_sh = sharded.params["decoder"]["linear"]["w"].sharding
        assert lin_sh.spec == jax.sharding.PartitionSpec(None, "mp"), lin_sh
    assert sharded.caption(images) == ref
    # attention beam search over the mesh too
    assert sharded.caption(images, beam_size=2) == single.caption(images, beam_size=2)


def test_captioner_from_torch_checkpoint(tmp_path):
    """Captioner loads a reference-format torch checkpoint directly."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_resnet_oracle import TorchResNet
    from show_tell_tpu.vocab.vocabulary import DatasetVocabulary, save_vocab

    V, E, H, L = 30, 20, 24, 2
    vocab = DatasetVocabulary()
    for w in ["<pad>", "<start>", "<end>", "<unk>"] + ["w%d" % i for i in range(V - 4)]:
        vocab.add_new_word(w)
    vocab_path = str(tmp_path / "vocab.pkl")
    save_vocab(vocab, vocab_path)

    torch.manual_seed(0)
    backbone = TorchResNet(18)
    lin = torch.nn.Linear(512, E)
    bn = torch.nn.BatchNorm1d(E, momentum=0.01)
    idx_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
    enc_sd = {}
    for k, v in backbone.state_dict().items():
        if k.startswith("fc."):
            continue
        root = k.split(".")[0]
        enc_sd["model." + idx_map[root] + k[len(root):]] = v
    for k, v in lin.state_dict().items():
        enc_sd["linear_secondlast_layer." + k] = v
    for k, v in bn.state_dict().items():
        enc_sd["last_layer." + k] = v
    emb = torch.nn.Embedding(V, E)
    unit = torch.nn.GRU(E, H, L, batch_first=True)
    out_lin = torch.nn.Linear(H, V)
    dec_sd = {"embeddings.weight": emb.weight}
    for k, v in unit.state_dict().items():
        dec_sd["unit." + k] = v
    dec_sd["linear.weight"], dec_sd["linear.bias"] = out_lin.weight, out_lin.bias
    ckpt_path = str(tmp_path / "model_9.ckpt")
    torch.save(
        {"encoder_state_dict": enc_sd, "decoder_state_dict": dec_sd,
         "optimizer_state_dict": {}, "epoch": 9, "step": 1}, ckpt_path,
    )

    cap = Captioner.from_checkpoint(
        ckpt_path, vocab_path, variant="gru", resnet_version=18,
        embed_dim=E, hidden_dim=H, num_layers=L, compute_dtype="float32",
    )
    images = np.random.RandomState(0).randint(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    caps = cap.caption(images)
    assert len(caps) == 2


def test_loader_multiworker_deterministic(tmp_path):
    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data import get_data_loader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    p1 = mini_params(str(tmp_path / "data"), str(tmp_path / "out"), num_workers=4)
    vocab = get_vocabulary("MSCOCO", p1)
    l_multi = list(get_data_loader(vocab, p1, "test"))
    p2 = mini_params(str(tmp_path / "data"), str(tmp_path / "out"), num_workers=0)
    l_single = list(get_data_loader(vocab, p2, "test"))
    assert len(l_multi) == len(l_single)
    for a, b in zip(l_multi, l_single):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


def test_coco_empty_annotations(tmp_path):
    import json

    from show_tell_tpu.data.coco import CocoCaptions

    path = tmp_path / "empty.json"
    with open(path, "w") as f:
        json.dump({"images": [], "annotations": []}, f)
    coco = CocoCaptions(str(path))
    assert coco.anns == {} and coco.getAnnIds() == []


def test_captioner_early_exit_same_captions(trained):
    """early_exit serving returns identical caption strings (decode stops
    once the whole batch emitted <end>; formatting truncates there)."""
    data_root, out_dir = trained
    kw = dict(
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32",
    )
    ckpt = os.path.join(out_dir, "model_1.ckpt")
    vocab = os.path.join(out_dir, "vocab.pkl")
    base = Captioner.from_checkpoint(ckpt, vocab, **kw)
    fast = Captioner.from_checkpoint(ckpt, vocab, early_exit=True, **kw)
    images = np.random.RandomState(3).randint(0, 255, (4, 224, 224, 3), dtype=np.uint8)
    assert fast.caption(images) == base.caption(images)
    # beam early_exit: bit-identical ids (the skipped tail is a no-op)
    np.testing.assert_array_equal(
        fast.caption_ids(images, beam_size=2), base.caption_ids(images, beam_size=2)
    )


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_captioner_early_exit_sharded_matches_single_device(trained, dp, mp):
    """early_exit under dp / dp x mp meshes: the while_loop predicate
    reduces over the sharded batch (GSPMD inserts the all-reduce) and
    over mp-sharded logits; output must match the single-device
    full-length scan (caption strings for greedy, whose skipped tail is
    pad-filled; bit-identical ids for beam, whose skipped tail is a
    provable no-op).  Params are END-biased so the loop genuinely
    retires early — the skipped-tail path is what's pinned."""
    data_root, out_dir = trained
    assert len(jax.devices()) >= 8
    kw = dict(
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32",
    )
    ckpt = os.path.join(out_dir, "model_1.ckpt")
    vocab = os.path.join(out_dir, "vocab.pkl")
    single = Captioner.from_checkpoint(ckpt, vocab, **kw)
    end_idx = single.vocab.word_to_index[single.vocab.end_token()]
    dec = dict(single.params["decoder"])
    dec["linear"] = dict(dec["linear"])
    dec["linear"]["b"] = dec["linear"]["b"].at[end_idx].add(4.0)
    params = {"encoder": single.params["encoder"], "decoder": dec}

    ref = Captioner(params, single.bn_state, single.cfg, single.vocab, compute_dtype="float32")
    fast = Captioner(
        params, single.bn_state, single.cfg, single.vocab,
        compute_dtype="float32", dp=dp, mp=mp, early_exit=True,
    )
    images = np.random.RandomState(5).randint(0, 255, (8, 224, 224, 3), dtype=np.uint8)
    assert fast.caption(images) == ref.caption(images)
    np.testing.assert_array_equal(
        fast.caption_ids(images, beam_size=3), ref.caption_ids(images, beam_size=3)
    )


def test_caption_paths_empty_list_yields_nothing():
    """The public pipeline API on zero inputs: both overlap modes yield
    an empty iteration instead of crashing (review r3)."""
    from show_tell_tpu.serve import caption_paths

    assert list(caption_paths(None, [], 4, overlap=True)) == []
    assert list(caption_paths(None, [], 4, overlap=False)) == []


def test_serve_image_cache_roundtrip_staleness_corruption(tmp_path):
    """ServeImageCache: put/get roundtrip; mtime change invalidates the
    key (replaced file re-decodes); corrupt or wrong-shape .npy entries
    are rejected as misses instead of being served as pixels; no .tmp
    files survive a successful put."""
    import time as _time

    from show_tell_tpu.data.serve_cache import ServeImageCache

    img_path = str(tmp_path / "a.jpg")
    with open(img_path, "wb") as f:
        f.write(b"notreallyjpeg")
    cache_dir = str(tmp_path / "cache")
    cache = ServeImageCache(cache_dir, 8)
    assert cache.get(img_path) is None and cache.misses == 1

    pix = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    cache.put(img_path, pix)
    got = cache.get(img_path)
    np.testing.assert_array_equal(got, pix)
    assert cache.hits == 1
    assert not [f for f in os.listdir(cache_dir) if f.endswith(".tmp")]

    # replaced file (different mtime) -> different key -> miss
    _time.sleep(0.01)
    with open(img_path, "wb") as f:
        f.write(b"replaced-bytes")
    assert cache.get(img_path) is None

    # corrupt entry: truncated npy is a miss, wrong-shape npy is a miss
    key_file = [f for f in os.listdir(cache_dir) if f.endswith(".npy")][0]
    with open(os.path.join(cache_dir, key_file), "wb") as f:
        f.write(b"\x93NUMPY-garbage")
    fresh = ServeImageCache(cache_dir, 8)
    with open(img_path, "wb") as f:  # restore original bytes/key? new key is fine:
        f.write(b"notreallyjpeg")
    wrong = np.zeros((4, 4, 3), np.uint8)
    fresh.put(img_path, wrong)  # wrong shape for image_size=8
    assert fresh.get(img_path) is None  # rejected by the shape check
    assert fresh.misses >= 1

    # missing source file -> no key, no crash
    assert cache.get(str(tmp_path / "nope.jpg")) is None
    cache.put(str(tmp_path / "nope.jpg"), pix)  # silently skipped


def test_serve_cli(trained, capsys):
    """python -m show_tell_tpu.serve: directory input, batch padding for
    the last partial batch, tab and JSON output modes, --fast_jpeg."""
    import json

    from show_tell_tpu.serve import main as serve_main

    data_root, out_dir = trained
    img_dir = os.path.join(data_root, "train2014")
    n_imgs = len(os.listdir(img_dir))
    common = [
        "--ckpt", os.path.join(out_dir, "model_1.ckpt"),
        "--vocab", os.path.join(out_dir, "vocab.pkl"),
        "--variant", "gru", "--resnet_version", "18",
        "--embedding_length", "16", "--num_hidden_units", "24",
        "--num_layers", "1", "--compute_dtype", "float32",
        "--batch_size", "4",  # n_imgs=8 -> exact; also test partial below
    ]
    assert serve_main([img_dir] + common) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == n_imgs
    paths = [l.split("\t")[0] for l in lines]
    assert paths == sorted(paths)

    # Partial batch (3 files into batch_size 4) + JSON + fast_jpeg.
    three = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:3]]
    assert serve_main(three + common + ["--json", "--fast_jpeg", "1"]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert [o["image"] for o in out] == three
    assert all(isinstance(o["caption"], str) for o in out)


def test_captioner_dp_batch_divisibility_error(trained):
    data_root, out_dir = trained
    cap = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"),
        os.path.join(out_dir, "vocab.pkl"),
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32", dp=2,
    )
    images = np.zeros((3, 224, 224, 3), dtype=np.uint8)  # 3 % dp(2) != 0
    with pytest.raises(ValueError, match="dp=2"):
        cap.caption_ids(images)


def test_serve_cli_dp_rounds_batch(trained, capsys):
    """--dp rounds --batch_size up to a dp multiple and still captions
    every input exactly once (dp-sharded decode on the virtual mesh)."""
    from show_tell_tpu.serve import main as serve_main

    data_root, out_dir = trained
    img_dir = os.path.join(data_root, "train2014")
    three = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:3]]
    rc = serve_main(three + [
        "--ckpt", os.path.join(out_dir, "model_1.ckpt"),
        "--vocab", os.path.join(out_dir, "vocab.pkl"),
        "--variant", "gru", "--resnet_version", "18",
        "--embedding_length", "16", "--num_hidden_units", "24",
        "--num_layers", "1", "--compute_dtype", "float32",
        "--batch_size", "3", "--dp", "2",  # 3 -> rounded up to 4
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert [l.split("\t")[0] for l in lines] == three


def test_serve_cli_attention_dims(tmp_path, capsys):
    """The serve CLI can express attention checkpoints' --nos_cnn_filters
    and --attn_dim (checkpoints trained at non-default dims were
    API-only before): an attn checkpoint with attn_dim=16 on ResNet-18
    (nos=512) serves through the CLI."""

    import jax

    from show_tell_tpu.models.captioner import CaptionerConfig
    from show_tell_tpu.serve import main as serve_main
    from show_tell_tpu.train.checkpoint import create_checkpoint
    from show_tell_tpu.train.optim import make_optimizer
    from show_tell_tpu.train.train_step import create_train_state
    from show_tell_tpu.vocab.vocabulary import DatasetVocabulary, save_vocab

    vocab = DatasetVocabulary()
    for w in ["<pad>", "<start>", "<end>", "<unk>", "a", "dog", "runs"]:
        vocab.add_new_word(w)
    out = str(tmp_path)
    save_vocab(vocab, os.path.join(out, "vocab.pkl"))

    cfg = CaptionerConfig("attn", 18, 12, 16, len(vocab), 1, nos_filters=512, attn_dim=16)
    ts = create_train_state(jax.random.PRNGKey(0), cfg, make_optimizer("SGD", 0.01, 0.9))
    create_checkpoint(ts, 1, 0, [1.0], {"output_dir": out})

    from PIL import Image as PILImage

    img = str(tmp_path / "img.jpg")
    PILImage.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img)

    rc = serve_main([
        img,
        "--ckpt", os.path.join(out, "model_1.ckpt"),
        "--vocab", os.path.join(out, "vocab.pkl"),
        "--variant", "attn", "--resnet_version", "18",
        "--embedding_length", "12", "--num_hidden_units", "16",
        "--num_layers", "1", "--compute_dtype", "float32",
        "--nos_cnn_filters", "512", "--attn_dim", "16",
        "--batch_size", "1",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 1 and lines[0].split("\t")[0] == img


def test_serve_beam_uses_vocab_end_token(trained):
    """Beam retirement must key on the LOADED vocab's <end> id, not the
    builder's default 2 (r3-continuation review): with a remapped vocab
    whose <end> sits elsewhere, the beam must retire on that id and pad
    after it — and early_exit must terminate on it."""
    data_root, out_dir = trained
    kw = dict(variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
              num_layers=1, compute_dtype="float32")
    base = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"), os.path.join(out_dir, "vocab.pkl"), **kw)

    # a "foreign" vocab: same words, <end> moved to id 5 (swap with the
    # word currently at 5); bias the projection so id 5 is argmax-ish.
    import copy

    vocab = copy.deepcopy(base.vocab)
    end_word, other = vocab.end_token(), vocab.index_to_word[5]
    vocab.word_to_index[end_word], vocab.word_to_index[other] = 5, 2
    vocab.index_to_word[5], vocab.index_to_word[2] = end_word, other

    import jax.numpy as jnp

    params = copy.deepcopy(jax.tree.map(np.asarray, base.params))
    params["decoder"]["linear"]["b"][5] += 50.0  # every step argmaxes to 5
    params = jax.tree.map(jnp.asarray, params)
    cap = Captioner(params, base.bn_state, base.cfg, vocab,
                    compute_dtype="float32", early_exit=True)
    images = np.random.RandomState(3).randint(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    ids = cap.caption_ids(images, beam_size=2)
    # first emitted token is the new <end>: beams retire there, pad after
    assert (ids[:, 0] == 5).all(), ids[:, :4]
    assert (ids[:, 1:] == 0).all(), ids[:, :4]
    assert cap.caption(images, beam_size=2) == ["", ""]


def test_serve_start_token_from_vocab(trained):
    """from_checkpoint derives start_token from the LOADED vocab (same
    review rationale as end_idx): a foreign/legacy vocab need not put
    <start> at the builder's id 1, and the attention families embed it
    at step 0."""
    import copy

    from show_tell_tpu.vocab.vocabulary import load_vocab, save_vocab

    data_root, out_dir = trained
    vocab = load_vocab(os.path.join(out_dir, "vocab.pkl"))
    start_word, other = vocab.start_token(), vocab.index_to_word[4]
    remapped = copy.deepcopy(vocab)
    remapped.word_to_index[start_word], remapped.word_to_index[other] = 4, 1
    remapped.index_to_word[4], remapped.index_to_word[1] = start_word, other
    remapped_path = os.path.join(out_dir, "vocab_remapped_start.pkl")
    save_vocab(remapped, remapped_path)

    cap = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"), remapped_path,
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32")
    assert cap.cfg.start_token == 4
    # an explicit override still wins
    cap2 = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"), remapped_path,
        variant="gru", resnet_version=18, embed_dim=16, hidden_dim=24,
        num_layers=1, compute_dtype="float32", start_token=1)
    assert cap2.cfg.start_token == 1


def test_load_any_checkpoint_corrupt_surfaces_both_errors(tmp_path):
    """A file that loads as NEITHER format must raise an error naming
    both failures — a torn pickle of OUR format must not hide behind an
    unrelated torch deserialization message."""
    from show_tell_tpu.models.captioner import CaptionerConfig

    bad = tmp_path / "corrupt.ckpt"
    bad.write_bytes(b"\x80\x04 definitely not a checkpoint")
    cfg = CaptionerConfig(variant="gru", resnet_version=18, embed_dim=16,
                          hidden_dim=24, vocab_size=40, num_layers=1)
    with pytest.raises(ValueError, match="neither"):
        Captioner._load_any_checkpoint(str(bad), cfg)


def test_serve_cli_missing_image_path(capsys):
    """A typo'd image path fails fast on stderr (exit 2) BEFORE the
    checkpoint loads — not with a raw traceback from the prefetch thread
    mid-stream."""
    from show_tell_tpu.serve import main

    rc = main(["--ckpt", "/nonexistent.ckpt", "--vocab", "/nonexistent.pkl",
               "/no/such/image.jpg"])
    assert rc == 2
    assert "does not exist" in capsys.readouterr().err


def _gru_cap(trained, **kw):
    data_root, out_dir = trained
    return Captioner.from_checkpoint(
        os.path.join(out_dir, "model_1.ckpt"),
        os.path.join(out_dir, "vocab.pkl"),
        variant="gru", resnet_version=18, embed_dim=16,
        hidden_dim=24, num_layers=1, compute_dtype="float32", **kw,
    )


def test_captioner_s2d_same_captions(trained):
    """Captioner(s2d=True): the host-emitted space-to-depth input path
    (native emitter / host relayout + preprocess_images_s2d + the conv1
    refold, bench.py --s2d) decodes the SAME caption ids as the stock
    [224,224,3] path — same pixels through an exactly-equivalent conv,
    so only ≤2e-4 summation-order shifts reach the argmax."""
    from show_tell_tpu.data.transforms import host_space_to_depth

    stock = _gru_cap(trained)
    s2d = _gru_cap(trained, s2d=True)
    images = np.random.RandomState(3).randint(0, 255, (4, 224, 224, 3), dtype=np.uint8)
    ids_stock = stock.caption_ids(images)
    ids_s2d = s2d.caption_ids(host_space_to_depth(images))
    np.testing.assert_array_equal(ids_s2d, ids_stock)
    # beam decode rides the same encoder features
    np.testing.assert_array_equal(
        s2d.caption_ids(host_space_to_depth(images), beam_size=2),
        stock.caption_ids(images, beam_size=2),
    )


def test_captioner_s2d_load_files_and_cache(trained):
    """load_files emits the s2d layout (native decode or PIL+relayout);
    the serve image cache stays RGB so one cache dir serves stock AND
    s2d Captioners, with identical captions out of both."""
    import tempfile

    from show_tell_tpu.serve import caption_paths

    data_root, out_dir = trained
    img_dir = os.path.join(data_root, "train2014")
    paths = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:3]]

    stock = _gru_cap(trained)
    s2d = _gru_cap(trained, s2d=True)
    assert s2d.load_files(paths).shape == (3, 112, 112, 12)
    assert s2d.load_files(paths, rgb=True).shape == (3, 224, 224, 3)
    np.testing.assert_array_equal(s2d.load_files(paths, rgb=True), stock.load_files(paths))

    from show_tell_tpu.data.serve_cache import ServeImageCache
    from show_tell_tpu.serve import IMAGE_SIZE

    with tempfile.TemporaryDirectory() as cache_dir:
        # prime the cache through the STOCK captioner, read it back s2d
        cache = ServeImageCache(cache_dir, IMAGE_SIZE)
        out_stock = list(caption_paths(stock, paths, batch_size=4, cache=cache))
        out_s2d = list(caption_paths(s2d, paths, batch_size=4, cache=cache))
        assert out_s2d == out_stock
    # PIL fallback path: s2d output == host relayout of the same PIL
    # pixels (cross-decoder pixel equality is NOT asserted — libjpeg
    # and PIL decode a few LSB apart, docs/DATA.md).
    import show_tell_tpu.native.fastimage as fi

    from show_tell_tpu.data.transforms import host_space_to_depth

    orig = fi.is_available
    fi.is_available = lambda: False
    try:
        pil_s2d = s2d.load_files(paths)
        pil_rgb = s2d.load_files(paths, rgb=True)
    finally:
        fi.is_available = orig
    assert pil_s2d.shape == (3, 112, 112, 12)
    np.testing.assert_array_equal(pil_s2d, host_space_to_depth(pil_rgb))


def test_serve_cli_s2d(trained, capsys):
    """--s2d through the deployment CLI produces the same captions as
    the stock run."""
    from show_tell_tpu.serve import main as serve_main

    data_root, out_dir = trained
    img_dir = os.path.join(data_root, "train2014")
    three = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:3]]
    common = [
        "--ckpt", os.path.join(out_dir, "model_1.ckpt"),
        "--vocab", os.path.join(out_dir, "vocab.pkl"),
        "--variant", "gru", "--resnet_version", "18",
        "--embedding_length", "16", "--num_hidden_units", "24",
        "--num_layers", "1", "--compute_dtype", "float32",
        "--batch_size", "4",
    ]
    assert serve_main(three + common) == 0
    stock_out = capsys.readouterr().out
    assert serve_main(three + common + ["--s2d", "1"]) == 0
    assert capsys.readouterr().out == stock_out
