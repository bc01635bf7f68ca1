"""Data pipeline tests: COCO parser, dataset, batching, loader, transforms."""

import os

import numpy as np
import pytest

from show_tell_tpu.data import CocoCaptions, MSCOCO, create_batch, get_data_loader
from show_tell_tpu.vocab import get_vocabulary

from fixtures import build_mini_coco, mini_params, CAPTIONS, IMAGE_IDS


@pytest.fixture
def mini(tmp_path):
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)
    return params, vocab


def test_coco_parser_indexes(mini):
    params, _ = mini
    coco = CocoCaptions(params["ann_path_train"])
    assert list(coco.anns.keys()) == [c[0] for c in CAPTIONS]  # file order
    assert set(coco.imgs.keys()) == set(IMAGE_IDS)
    assert coco.loadImgs(100)[0]["file_name"].endswith("%012d.jpg" % 100)
    assert coco.getAnnIds(100) == [1, 2]


def test_dataset_one_sample_per_annotation(mini):
    params, vocab = mini
    ds = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab)
    assert len(ds) == len(CAPTIONS)
    path, image, caption = ds[0]
    assert image.shape == (224, 224, 3) and image.dtype == np.uint8
    assert caption[0] == vocab("<start>")
    assert caption[-1] == vocab("<end>")
    # 'a man riding a wave on top of a surfboard .' -> 11 tokens + 2 specials
    assert len(caption) == 13


def test_create_batch_sorts_and_pads(mini):
    params, vocab = mini
    ds = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab)
    samples = [ds[i] for i in range(4)]
    paths, images, captions, lengths = create_batch(samples, pad_length=24)
    assert images.shape == (4, 224, 224, 3)
    assert captions.shape == (4, 24)
    assert list(lengths) == sorted(lengths, reverse=True)
    for i in range(4):
        assert (captions[i, lengths[i]:] == 0).all()
        assert captions[i, lengths[i] - 1] == vocab("<end>")


def test_loader_train_drops_last_and_shuffles(mini):
    params, vocab = mini
    loader = get_data_loader(vocab, params, "train")
    batches = list(loader)
    assert len(batches) == len(CAPTIONS) // params["batch_size"]
    paths, images, captions, lengths = batches[0]
    assert images.shape[0] == params["batch_size"]
    assert captions.dtype == np.int32 and lengths.dtype == np.int32


def test_loader_test_keeps_all(mini):
    params, vocab = mini
    loader = get_data_loader(vocab, params, "test")
    n = sum(b[1].shape[0] for b in loader)
    assert n == len(CAPTIONS)


def test_loader_deterministic_with_seed(mini):
    params, vocab = mini
    l1 = get_data_loader(vocab, params, "train")
    l2 = get_data_loader(vocab, params, "train")
    b1 = [b[0] for b in l1]
    b2 = [b[0] for b in l2]
    assert b1 == b2


def test_preprocess_images():
    import jax

    from show_tell_tpu.data.transforms import preprocess_images, IMAGENET_MEAN, IMAGENET_STD

    imgs = np.random.randint(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    out = preprocess_images(imgs, key, augment=False)
    expected = (imgs.astype(np.float32) / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

    # Augmented output must be one of the 4 flip combinations per sample.
    out_aug = np.asarray(preprocess_images(imgs, key, augment=True))
    for b in range(2):
        candidates = [
            expected[b],
            expected[b, :, ::-1],
            expected[b, ::-1, :],
            expected[b, ::-1, ::-1],
        ]
        assert any(np.allclose(out_aug[b], c, atol=1e-5) for c in candidates)


def test_loader_early_break_stops_producer(mini):
    """A consumer that abandons the epoch early must not leave the
    producer blocked on a full queue, and the decode pool is shared
    across epochs instead of rebuilt per __iter__."""
    from show_tell_tpu.data.dataset import MSCOCO as DS, DataLoader

    params, vocab = mini
    ds = DS(params["ann_path_test"], params["data_path_test"], vocab, train=False)
    loader = DataLoader(ds, batch_size=1, prefetch=1)  # 16 batches, tiny queue

    for batch in loader:
        break  # consumer goes away; producer is mid-stream

    t = loader._producer
    t.join(5.0)
    assert t is not None and not t.is_alive()

    # Same loader iterates again cleanly, reusing one pool.
    pool = loader._pool
    assert pool is not None
    assert sum(b[1].shape[0] for b in loader) == len(ds)
    assert loader._pool is pool
    loader._producer.join(5.0)
    assert not loader._producer.is_alive()

    loader.close()
    assert loader._pool is None


def test_loader_propagates_producer_exception(tmp_path):
    """A load failure mid-epoch must raise in the consumer, not silently
    truncate the epoch (the producer used to convert any exception into
    end-of-epoch via its sentinel)."""
    import os

    import pytest

    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)
    ds = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab)
    # Remove an image consumed by the second batch.
    victim, _ = ds.sample_meta(6)
    os.remove(os.path.join(params["data_path_train"], victim))

    loader = DataLoader(ds, batch_size=4, shuffle=False)
    with pytest.raises(FileNotFoundError):
        for _ in loader:
            pass
    loader.close()


@pytest.mark.parametrize("native", [True, False])
def test_image_cache_decode_once_then_serve_from_cache(tmp_path, native):
    """--image_cache: batches are identical with and without the cache;
    after one full pass the JPEGs can be DELETED and every later epoch
    still yields the same pixels (decode-once semantics)."""
    import os
    import shutil

    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)

    kw = dict(use_native_decode=native)
    ds_plain = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab, **kw)
    ds_cache = MSCOCO(
        params["ann_path_train"], params["data_path_train"], vocab,
        image_cache=str(tmp_path / "cache"), **kw,
    )
    lp = DataLoader(ds_plain, batch_size=4, shuffle=False)
    lc = DataLoader(ds_cache, batch_size=4, shuffle=False)
    plain = list(lp)
    first = list(lc)
    for (pp, ip, cp, sp), (pc, ic, cc, sc) in zip(plain, first):
        assert pp == pc
        np.testing.assert_array_equal(ip, ic)
        np.testing.assert_array_equal(cp, cc)
    assert ds_cache.image_cache.hit_fraction() == 1.0

    # Epoch 2 with the JPEGs gone: served entirely from the cache.
    shutil.rmtree(params["data_path_train"])
    second = list(lc)
    for (_, i1, _, _), (_, i2, _, _) in zip(first, second):
        np.testing.assert_array_equal(i1, i2)
    lp.close(), lc.close()


def test_image_cache_rejects_mismatched_dataset(tmp_path):
    from show_tell_tpu.data.image_cache import ImageCache

    ImageCache(str(tmp_path / "c"), ["a.jpg", "b.jpg"], 224)
    with pytest.raises(ValueError, match="different dataset"):
        ImageCache(str(tmp_path / "c"), ["a.jpg", "c.jpg"], 224)
    with pytest.raises(ValueError, match="different dataset"):
        ImageCache(str(tmp_path / "c"), ["a.jpg", "b.jpg"], 128)


def test_prefill_cache_tool(tmp_path):
    """tools/prefill_cache.py fills the cache so a loader with the same
    cache dir serves every image without touching the JPEGs."""
    import shutil
    import subprocess
    import sys as _sys

    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)

    import os

    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "prefill_cache.py")
    out = subprocess.run(
        [_sys.executable, tool, "--ann_path", params["ann_path_train"],
         "--img_dir", params["data_path_train"],
         "--image_cache", str(tmp_path / "cache"), "--fast_jpeg"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "prefilled" in out.stdout

    ds = MSCOCO(
        params["ann_path_train"], params["data_path_train"], vocab,
        image_cache=str(tmp_path / "cache"), fast_jpeg=True,  # cache identity includes decode mode
    )
    assert ds.image_cache.hit_fraction() == 1.0
    shutil.rmtree(params["data_path_train"])  # no JPEG access needed
    loader = DataLoader(ds, batch_size=4, shuffle=False)
    n = sum(b[1].shape[0] for b in loader)
    assert n == len(ds)
    loader.close()


def test_image_cache_mode_and_safety(tmp_path):
    """Cache identity includes the decode mode; cached rows are
    read-only (mutation raises instead of corrupting the file); unknown
    names are a miss, not a crash."""
    from show_tell_tpu.data.image_cache import ImageCache

    c = ImageCache(str(tmp_path / "c"), ["a.jpg"], 8, fast_jpeg=True)
    with pytest.raises(ValueError, match="decode mode"):
        ImageCache(str(tmp_path / "c"), ["a.jpg"], 8, fast_jpeg=False)

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    c.put("a.jpg", img)
    got = c.get("a.jpg")
    np.testing.assert_array_equal(got, img)
    with pytest.raises(ValueError):
        got[0, 0, 0] = 99
    assert c.get("not-indexed.jpg") is None
    c.put("not-indexed.jpg", img)  # no-op, no crash


def test_flickr_tsv_parsing_robustness(tmp_path):
    """parse_flickr_tsv: no csv quote interpretation (leading-quote
    captions can't swallow rows), Flickr30k `name.jpg#k` caption-index
    suffixes are stripped, and FlickrCaptions shares the CocoCaptions
    surface."""
    from show_tell_tpu.data.coco import CocoCaptions, FlickrCaptions

    tsv = tmp_path / "captions.tsv"
    tsv.write_text(
        'a.jpg#0\t"A man waves\n'
        "a.jpg#1\tsecond caption for a\n"
        "b.jpg\tplain row\n"
        "\n"  # blank line ignored
        "c.jpg\tcaption\twith an embedded tab\n"
    )
    idx = FlickrCaptions(str(tsv))
    assert isinstance(idx, CocoCaptions)
    names = [img["file_name"] for img in idx.imgs.values()]
    assert names == ["a.jpg", "b.jpg", "c.jpg"]
    caps = [a["caption"] for a in idx.anns.values()]
    assert caps == ['"A man waves', "second caption for a", "plain row", "caption\twith an embedded tab"]
    assert idx.loadImgs(idx.anns[1]["image_id"])[0]["file_name"] == "a.jpg"
    assert idx.getAnnIds(0) == [0, 1]


def test_image_cache_reinit_never_truncates_filled_rows(tmp_path):
    """Cross-process init safety: a second ImageCache on the same dir
    must open the backing files without truncation (O_CREAT|O_EXCL), so
    rows the first process filled stay valid; and a short data file left
    by a creator that died mid-init is extended, not an error."""
    import numpy as np

    from show_tell_tpu.data.image_cache import ImageCache

    names = ["a.jpg", "b.jpg"]
    c1 = ImageCache(str(tmp_path / "c"), names, 8)
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    c1.put("a.jpg", img)

    c2 = ImageCache(str(tmp_path / "c"), names, 8)  # "concurrent" initializer
    np.testing.assert_array_equal(np.asarray(c2.get("a.jpg")), img)
    assert c2.get("b.jpg") is None  # unfilled row still invalid

    # Creator died between create and ftruncate: valid.dat is short.
    import os

    with open(tmp_path / "c" / "valid.dat", "r+b") as f:
        f.truncate(0)
    c3 = ImageCache(str(tmp_path / "c"), names, 8)  # extends, no crash
    assert c3.get("b.jpg") is None


def test_collate_and_word_format_match_live_reference():
    """create_batch (sort order incl. tie stability, zero padding,
    lengths) and create_caption_word_format (<end> truncation, <start>
    skipping, flag_blue nesting) differentially against the reference's
    ACTUAL utils.py imported live (utils.py:61-77,105-123)."""
    torch = pytest.importorskip("torch")
    from fixtures import load_reference_utils_module

    from show_tell_tpu.evaluation.tester import (
        create_caption_word_format as ours_words,
    )

    ref = load_reference_utils_module()
    if ref is None:
        pytest.skip("reference utils.py not importable here")

    rng = np.random.RandomState(31)
    lens = [5, 3, 7, 3, 4, 3]  # repeated 3s pin sort-tie stability
    samples_ref, samples_ours = [], []
    for i, n in enumerate(lens):
        ids = rng.randint(0, 9, n).tolist()
        img = rng.randint(0, 255, (4, 4, 3), dtype=np.uint8)
        path = "img_%d.jpg" % i
        samples_ref.append((path, torch.from_numpy(img.transpose(2, 0, 1)).float(), torch.Tensor(ids)))
        samples_ours.append((path, img, list(ids)))

    r_paths, _, r_caps, r_lens = ref.create_batch(samples_ref)
    o_paths, _, o_caps, o_lens = create_batch(samples_ours, pad_length=max(lens))
    assert list(o_paths) == list(r_paths)
    assert list(o_lens) == list(r_lens)
    np.testing.assert_array_equal(o_caps, r_caps.numpy())

    # ids -> words on a tiny vocab, incl. <start>/<end>/flag_blue paths.
    class _Vocab:
        index_to_word = {0: "<pad>", 1: "<start>", 2: "<end>", 3: "<unk>",
                         4: "a", 5: "dog", 6: "runs", 7: "fast", 8: "park"}
        word_to_index = {w: i for i, w in index_to_word.items()}

        def start_token(self):
            return "<start>"

        def end_token(self):
            return "<end>"

    v = _Vocab()
    tokenized = np.array([[1, 4, 5, 6, 2, 0, 0], [4, 5, 2, 7, 8, 1, 0],
                          [1, 2, 0, 0, 0, 0, 0], [4, 7, 8, 5, 6, 4, 7]])
    for flag in (False, True):
        assert ours_words(tokenized, v, flag) == ref.create_caption_word_format(tokenized, v, flag)


def test_sweep_tool(tmp_path, monkeypatch):
    """tools/sweep.py runs the report's experiment grid through the real
    CLI: 2 configs on the mini fixture, per-run Log_Output-style dirs,
    checkpoints, and a sweep_summary.json with scores.  Runs in-process
    (the tool imports jax via the CLI; a subprocess would re-init the
    pre-imported axon backend instead of this suite's CPU config)."""
    import importlib.util
    import json
    import sys

    data_root = str(tmp_path / "data")
    build_mini_coco(data_root)
    sweep_out = str(tmp_path / "sweep")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "sweep.py")
    spec = importlib.util.spec_from_file_location("sweep_tool", tool)
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)
    monkeypatch.setattr(sys, "argv", [
        "sweep.py",
        "--sweep_output", sweep_out, "--lrs", "0.01", "--embeds", "12",
        "--optimizers", "SGD,Adam",
        # passthrough -> every run
        "--data_dir", data_root,
        "--train_ann_path", "annotations/captions_train2014.json",
        "--test_ann_path", "annotations/captions_train2014.json",
        "--train_img_dir", "train2014", "--test_img_dir", "train2014",
        "--vocab_threshold", "1", "--num_hidden_units", "16",
        "--num_layers", "1", "--batch_size", "4", "--num_epochs", "1",
        "--resnet_version", "18",
        "--is_training", "1", "--is_testing", "1", "--load_model_test", "model_1",
    ])
    sweep.main()
    with open(os.path.join(sweep_out, "sweep_summary.json")) as f:
        summary = json.load(f)
    assert [r["run"] for r in summary] == ["GRU_COCO_lr_0_01_Embed12_SGD", "GRU_COCO_lr_0_01_Embed12_Adam"]
    for r in summary:
        assert np.isfinite(r["scores"]["Bleu_1"]) and np.isfinite(r["scores"]["test_loss"])
        assert os.path.isfile(os.path.join(sweep_out, r["run"], "model_1.ckpt"))


def test_csv_unquote_contract():
    """_csv_unquote: pandas-compatible for well-formed quoted cells,
    raw passthrough for everything pandas would choke on or treat as
    unquoted (mid-text quotes are literal under QUOTE_MINIMAL)."""
    from show_tell_tpu.data.coco import _csv_unquote

    assert _csv_unquote('"a quoted cell"') == "a quoted cell"
    assert _csv_unquote('"says ""hi"" loudly"') == 'says "hi" loudly'
    assert _csv_unquote('""') == ""
    assert _csv_unquote('plain text') == "plain text"
    assert _csv_unquote('mid "quote" text') == 'mid "quote" text'
    assert _csv_unquote('"unbalanced start') == '"unbalanced start'
    assert _csv_unquote('"inner " lone quote"') == '"inner " lone quote"'
    assert _csv_unquote('"') == '"'


@pytest.mark.parametrize("native", [True, False])
def test_process_sharded_loader_reassembles_global_batch(tmp_path, native):
    """Multi-host loader mode (DataLoader process_shard=(pid, nproc)):
    every process walks the same shuffled stream, decodes only its slice
    of each batch, and the concatenated local images + global
    captions/lengths/paths must bit-equal the unsharded loader's batch
    (incl. create_batch's exact stable descending-length sort)."""
    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.native import fastimage as native_fastimage
    from show_tell_tpu.vocab import get_vocabulary

    if native and not native_fastimage.is_available():
        pytest.skip("native decoder not built")
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)

    def make_loader(shard):
        ds = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab)
        ds.use_native_decode = native
        return DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7,
                          process_shard=shard)

    ref_batches = list(make_loader(None))
    shard_batches = [list(make_loader((pid, 2))) for pid in (0, 1)]
    assert len(ref_batches) == len(shard_batches[0]) == len(shard_batches[1])
    for (paths, images, captions, lengths), b0, b1 in zip(ref_batches, *shard_batches):
        for b in (b0, b1):  # metadata is global and identical everywhere
            assert b[0] == paths
            np.testing.assert_array_equal(b[2], captions)
            np.testing.assert_array_equal(b[3], lengths)
        np.testing.assert_array_equal(np.concatenate([b0[1], b1[1]], axis=0), images)
        assert b0[1].shape[0] == b1[1].shape[0] == images.shape[0] // 2


def test_process_sharded_loader_requires_drop_last(tmp_path):
    """process_shard without drop_last must be rejected at construction:
    a ragged final batch would give each host a different local row
    count while put_sharded(local_rows=True) reconstructs global_shape
    as local*nproc — silent cross-host shape disagreement."""
    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)
    ds = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab)
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader(ds, batch_size=4, drop_last=False, process_shard=(0, 2))
