"""Native fastimage (C++ JPEG decode + resize) tests."""

import io
import os

import numpy as np
import pytest

from PIL import Image

from show_tell_tpu.native import decode_resize, decode_resize_batch, is_available

pytestmark = pytest.mark.skipif(not is_available(), reason="libfastimage build unavailable")


def _jpeg(seed=0, size=(320, 240), quality=92):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (24, 32, 3)).astype(np.uint8)
    img = Image.fromarray(base).resize(size, Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _pil_ref(jpeg, size=224):
    img = Image.open(io.BytesIO(jpeg)).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def test_decode_resize_matches_pil_within_1lsb():
    jpeg = _jpeg()
    got = decode_resize(jpeg, 224, 224)
    ref = _pil_ref(jpeg)
    assert got.shape == (224, 224, 3)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()


def test_decode_resize_upscale():
    jpeg = _jpeg(size=(60, 40))
    got = decode_resize(jpeg, 224, 224)
    ref = _pil_ref(jpeg)
    diff = np.abs(got.astype(int) - ref.astype(int))
    # Upscale path (no antialias window): still within a couple LSB.
    assert diff.mean() < 1.0 and diff.max() <= 3


def test_grayscale_jpeg_converts_to_rgb():
    img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (100, 80)).astype(np.uint8), "L")
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    got = decode_resize(buf.getvalue(), 64, 64)
    assert got.shape == (64, 64, 3)
    # All three channels equal for grayscale input.
    assert np.array_equal(got[..., 0], got[..., 1])


def test_corrupt_jpeg_raises():
    with pytest.raises(ValueError):
        decode_resize(b"not a jpeg at all", 64, 64)


def test_batch_decode():
    jpegs = [_jpeg(s) for s in range(5)] + [b"garbage"]
    out, statuses = decode_resize_batch(jpegs, 128, 128, n_threads=2)
    assert out.shape == (6, 128, 128, 3)
    assert statuses[:5] == [0] * 5
    assert statuses[5] != 0
    single = decode_resize(jpegs[2], 128, 128)
    np.testing.assert_array_equal(out[2], single)


def test_dataset_native_vs_pil_pixels(tmp_path):
    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)
    ds_native = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab, use_native_decode=True)
    ds_pil = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab, use_native_decode=False)
    _, img_n, _ = ds_native[0]
    _, img_p, _ = ds_pil[0]
    assert np.abs(img_n.astype(int) - img_p.astype(int)).max() <= 1


def test_loader_native_batch_path_matches_per_sample(tmp_path):
    """DataLoader's batched native decode (one threaded C++ call per
    batch) yields the same batches as the per-sample path, including the
    PIL fallback for a corrupt file."""
    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)

    ds_native = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab, use_native_decode=True)
    ds_pil = MSCOCO(params["ann_path_train"], params["data_path_train"], vocab, use_native_decode=False)

    # Corrupt one image on disk: the native batch path must fall back to
    # PIL for that sample... but PIL can't read it either, so instead use
    # a PNG (non-JPEG): native decode rejects it, PIL handles it.
    meta_path, _ = ds_native.sample_meta(0)
    from PIL import Image
    full = os.path.join(params["data_path_train"], meta_path)
    arr = np.asarray(Image.open(full).convert("RGB"))
    png_bytes_path = full  # overwrite in place with PNG content
    Image.fromarray(arr).save(png_bytes_path, format="PNG")

    ln = DataLoader(ds_native, batch_size=4, shuffle=False)
    lp = DataLoader(ds_pil, batch_size=4, shuffle=False)
    for (pn, imn, capn, lenn), (pp, imp, capp, lenp) in zip(ln, lp):
        assert pn == pp
        np.testing.assert_array_equal(capn, capp)
        np.testing.assert_array_equal(lenn, lenp)
        assert np.abs(imn.astype(int) - imp.astype(int)).max() <= 1
    ln.close(), lp.close()


def test_fast_scale_close_to_full_resolution():
    """--fast_jpeg path: DCT-domain scaled decode + resize stays within a
    few LSB of the full-resolution decode on a COCO-sized image, and
    selects full resolution when the source is no bigger than the target
    (no upscale-from-reduced)."""
    rng = np.random.RandomState(0)
    x, y = np.meshgrid(np.linspace(0, 255, 640), np.linspace(0, 255, 480))
    arr = np.stack([x, y, (x + y) / 2], -1)
    arr = (arr + rng.randint(0, 40, (480, 640, 3))).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    jpeg = buf.getvalue()

    full = decode_resize(jpeg, 224, 224)
    fast = decode_resize(jpeg, 224, 224, fast_scale=True)
    diff = np.abs(full.astype(int) - fast.astype(int))
    assert diff.mean() < 2.0 and diff.max() <= 12, (diff.mean(), diff.max())

    # Small source: the scaled decode must not reduce below the target.
    small_buf = io.BytesIO()
    Image.fromarray(arr[:200, :160]).save(small_buf, format="JPEG", quality=90)
    np.testing.assert_array_equal(
        decode_resize(small_buf.getvalue(), 224, 224, fast_scale=True),
        decode_resize(small_buf.getvalue(), 224, 224),
    )


def test_fast_scale_batch_matches_single():
    jpegs = [_jpeg(s, size=(640, 480)) for s in range(4)]
    out, statuses = decode_resize_batch(jpegs, 224, 224, n_threads=2, fast_scale=True)
    assert statuses == [0] * 4
    for k in range(4):
        np.testing.assert_array_equal(out[k], decode_resize(jpegs[k], 224, 224, fast_scale=True))


def test_loader_fast_jpeg_close_to_parity(tmp_path):
    """End-to-end loader with fast_jpeg=True: identical captions/lengths,
    images within a few LSB of the parity decode (native and PIL-draft
    fallback paths both covered via use_native_decode)."""
    from fixtures import build_mini_coco, mini_params
    from show_tell_tpu.data.dataset import MSCOCO, DataLoader
    from show_tell_tpu.vocab import get_vocabulary

    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)

    for native in (True, False):
        ds_fast = MSCOCO(
            params["ann_path_train"], params["data_path_train"], vocab,
            use_native_decode=native, fast_jpeg=True,
        )
        ds_ref = MSCOCO(
            params["ann_path_train"], params["data_path_train"], vocab, use_native_decode=native
        )
        lf = DataLoader(ds_fast, batch_size=4, shuffle=False)
        lr = DataLoader(ds_ref, batch_size=4, shuffle=False)
        for (pf, imf, capf, lenf), (pr, imr, capr, lenr) in zip(lf, lr):
            assert pf == pr
            np.testing.assert_array_equal(capf, capr)
            np.testing.assert_array_equal(lenf, lenr)
            assert np.abs(imf.astype(int) - imr.astype(int)).mean() < 3.0
        lf.close(), lr.close()


# ---------------------------------------------------------- fastmetrics ----


class TestFastMetrics:
    """Native caption scorer (fastmetrics.cpp): every score must be
    BIT-IDENTICAL (==, no tolerance) to the pure-Python path — which is
    itself pinned to the reference's vendored scorers (test_metrics.py).
    """

    @pytest.fixture(autouse=True)
    def _need_lib(self):
        from show_tell_tpu.native import fastmetrics

        if not fastmetrics.is_available():
            pytest.skip("libfastmetrics build unavailable")

    @staticmethod
    def _py_eval(target, predicted, faithful=True):
        os.environ["ST_FASTMETRICS"] = "0"
        try:
            from show_tell_tpu.evaluation import metrics

            return metrics.evaluate(target, predicted, faithful=faithful)
        finally:
            os.environ["ST_FASTMETRICS"] = "1"

    def test_bit_exact_vs_python_fuzz(self):
        import random

        from show_tell_tpu.evaluation import metrics
        from show_tell_tpu.native import fastmetrics

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(400)] + ["café", "東京", "naïve", "it's", "a-b"]
        engaged = 0
        for trial in range(60):
            n = rng.randint(1, 48)
            target = [
                [[rng.choice(vocab) for _ in range(rng.randint(0, 14))] for _ in range(rng.randint(1, 5))]
                for _ in range(n)
            ]
            pred = [[rng.choice(vocab) for _ in range(rng.randint(0, 16))] for _ in range(n)]
            engaged += fastmetrics.score_batch(target, pred) is not None
            for faithful in (True, False):
                got = metrics.evaluate(target, pred, faithful=faithful)
                want = self._py_eval(target, pred, faithful)
                assert set(got) == set(want)
                for k in want:
                    assert got[k] == want[k], (trial, faithful, k, got[k], want[k])
        assert engaged == 60  # the native path actually ran

    def test_weird_tokens_fall_back_and_match(self):
        """Tokens that break the reference's join/split round-trip must
        take the Python path (score_batch returns None) and still score
        identically through evaluate()."""
        from show_tell_tpu.evaluation import metrics
        from show_tell_tpu.native import fastmetrics

        cases = [
            ([[["a b", "c"]]], [["a"]]),  # space inside a token
            ([[["a", ""]]], [["b"]]),  # empty token
            ([[["a\tb"]]], [["a"]]),  # tab inside a token
            ([[["a"]]], [["x\xa0y"]]),  # nbsp inside the hypothesis
        ]
        for target, pred in cases:
            assert fastmetrics.score_batch(target, pred) is None
            assert metrics.evaluate(target, pred) == self._py_eval(target, pred)

    def test_empty_and_tiny_captions_native(self):
        """Empty hypotheses/references stay on the NATIVE path (real
        untrained-model output) — including ROUGE's split(" ") quirk
        where two empty captions LCS-match as single empty tokens."""
        from show_tell_tpu.evaluation import metrics
        from show_tell_tpu.native import fastmetrics

        target = [[[], ["a", "b"]], [["x"]], [["a"]]]
        pred = [[], ["x"], ["a"]]
        assert fastmetrics.score_batch(target, pred) is not None
        for faithful in (True, False):
            got = metrics.evaluate(target, pred, faithful=faithful)
            want = self._py_eval(target, pred, faithful)
            for k in want:
                assert got[k] == want[k], (faithful, k)

    def test_corpus_bleu4_sums_bit_exact(self):
        """Native per-image corpus-BLEU pass == summing the (nltk-pinned)
        Python nltk_bleu4_method4 per candidate, bit-identically —
        including the CPython fsum port for the weighted log sums."""
        import random

        from show_tell_tpu.evaluation.metrics import nltk_bleu4_method4
        from show_tell_tpu.native import fastmetrics

        weights = [(1.0, 0, 0, 0), (0.5, 0.5, 0, 0), (0.34, 0.33, 0.33, 0), (0.25, 0.25, 0.25, 0.25)]
        rng = random.Random(13)
        vocab = ["a", "b", "c", "dog", "cat", "runs", "the", "on", "mat", "東京"]
        for trial in range(300):
            refs = [[rng.choice(vocab) for _ in range(rng.randint(0, 15))] for _ in range(rng.randint(1, 5))]
            cands = [[rng.choice(vocab) for _ in range(rng.randint(0, 16))] for _ in range(rng.randint(1, 6))]
            got = fastmetrics.corpus_bleu4_sums(refs, cands, weights)
            assert got is not None
            sums = [0.0] * 4
            for c in cands:
                v = nltk_bleu4_method4(refs, c, weights)
                for w in range(4):
                    sums[w] += v[w]
            for w in range(4):
                assert got[w] == sums[w], (trial, w, got[w], sums[w])
        # exotic tokens fall back
        assert fastmetrics.corpus_bleu4_sums([["a b"]], [["a"]], weights) is None
        assert fastmetrics.corpus_bleu4_sums([["a", ""]], [["a"]], weights) is None


def test_native_s2d_output_mode():
    """fastimage's s2d output mode (VERDICT r4 item 4): the batched
    decode with s2d=1 equals the stock decode followed by the numpy
    relayout byte-for-byte, and the standalone relayout entry agrees."""
    import io

    import numpy as np
    from PIL import Image

    from show_tell_tpu.data.transforms import host_space_to_depth
    from show_tell_tpu.native import fastimage

    if not fastimage.is_available():
        import pytest

        pytest.skip("libfastimage unavailable")
    rng = np.random.RandomState(5)
    bufs = []
    for i in range(3):
        arr = rng.randint(0, 255, (120 + 8 * i, 160, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="JPEG", quality=90)
        bufs.append(b.getvalue())
    rgb, st = fastimage.decode_resize_batch(bufs, 64, 64)
    s2d, st2 = fastimage.decode_resize_batch(bufs, 64, 64, s2d=True)
    assert st == [0, 0, 0] and st2 == [0, 0, 0]
    assert s2d.shape == (3, 32, 32, 12)
    np.testing.assert_array_equal(s2d, host_space_to_depth(rgb))
    np.testing.assert_array_equal(fastimage.s2d_relayout(rgb[0]), s2d[0])
