"""Vocabulary + tokenizer tests (reference vocab_builder.py semantics)."""

import os
import pickle

import pytest

from show_tell_tpu.vocab import DatasetVocabulary, get_vocabulary, word_tokenize
from show_tell_tpu.vocab.tokenize import _TREEBANK, _sent_split
from show_tell_tpu.vocab.vocabulary import load_vocab, save_vocab

from fixtures import build_mini_coco, mini_params


def test_specials_get_ids_0_to_3(tmp_path):
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)
    assert vocab.word_to_index["<pad>"] == 0
    assert vocab.word_to_index["<start>"] == 1
    assert vocab.word_to_index["<end>"] == 2
    assert vocab.word_to_index["<unk>"] == 3
    assert vocab.start_token() == "<start>"
    assert vocab.end_token() == "<end>"


def test_unk_fallback_and_len(tmp_path):
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    vocab = get_vocabulary("MSCOCO", params)
    assert vocab("man") == vocab.word_to_index["man"]
    assert vocab("zzz-not-in-vocab") == 3
    assert len(vocab) == vocab.index


def test_threshold_filters_words(tmp_path):
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"), vocab_threshold=2)
    vocab = get_vocabulary("MSCOCO", params)
    # 'a' appears many times; 'sunset' only once.
    assert "a" in vocab.word_to_index
    assert "sunset" not in vocab.word_to_index


def test_vocab_cache_roundtrip(tmp_path):
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"))
    v1 = get_vocabulary("MSCOCO", params)
    v2 = get_vocabulary("MSCOCO", params)  # loads the pickle
    assert v1.word_to_index == v2.word_to_index
    assert v1.index_to_word == v2.index_to_word


def test_insertion_order_is_deterministic(tmp_path):
    build_mini_coco(str(tmp_path / "data"))
    p1 = mini_params(str(tmp_path / "data"), str(tmp_path / "out1"))
    p2 = mini_params(str(tmp_path / "data"), str(tmp_path / "out2"))
    v1 = get_vocabulary("MSCOCO", p1)
    v2 = get_vocabulary("MSCOCO", p2)
    assert v1.word_to_index == v2.word_to_index


def test_reference_pickle_compat(tmp_path):
    """A pickle whose class lives in module 'vocab_builder' (what the
    reference writes) must load via the compat remapping."""
    import sys
    import types

    mod = types.ModuleType("vocab_builder")

    class RefVocab:
        pass

    RefVocab.__module__ = "vocab_builder"
    RefVocab.__name__ = "DatasetVocabulary"
    RefVocab.__qualname__ = "DatasetVocabulary"
    mod.DatasetVocabulary = RefVocab
    sys.modules["vocab_builder"] = mod
    try:
        ref = RefVocab()
        ref.word_to_index = {"<pad>": 0, "<start>": 1, "<end>": 2, "<unk>": 3, "hello": 4}
        ref.index_to_word = {v: k for k, v in ref.word_to_index.items()}
        ref.index = 5
        path = tmp_path / "vocab.pkl"
        with open(path, "wb") as f:
            pickle.dump(ref, f)
    finally:
        del sys.modules["vocab_builder"]

    loaded = load_vocab(str(path))  # module no longer importable -> remap
    assert isinstance(loaded, DatasetVocabulary)
    assert loaded("hello") == 4
    assert loaded("nope") == 3
    assert len(loaded) == 5


def test_our_pickle_roundtrip(tmp_path):
    vocab = DatasetVocabulary()
    for w in ["<pad>", "<start>", "<end>", "<unk>", "hello"]:
        vocab.add_new_word(w)
    path = tmp_path / "vocab.pkl"
    save_vocab(vocab, str(path))
    loaded = load_vocab(str(path))
    assert loaded.word_to_index == vocab.word_to_index


def test_tokenizer_basic():
    assert word_tokenize("a man riding a wave on top of a surfboard.".lower()) == [
        "a", "man", "riding", "a", "wave", "on", "top", "of", "a", "surfboard", ".",
    ]


def test_tokenizer_contractions_and_quotes():
    assert word_tokenize("don't stop") == ["do", "n't", "stop"]
    assert word_tokenize('a "quoted" word') == ["a", "``", "quoted", "''", "word"]


def test_fallback_matches_treebank_on_single_sentence():
    s = "two dogs are playing with a red ball."
    toks = [t for sent in _sent_split(s) for t in _TREEBANK.tokenize(sent)]
    assert toks == word_tokenize(s)


def test_sent_split():
    assert _sent_split("a man. a dog.") == ["a man.", "a dog."]
    assert _sent_split("mr. smith waves.") == ["mr. smith waves."]


def test_flickr_vocabulary(tmp_path):
    """Flickr TSV path (reference vocab_builder.py:82-88)."""
    ann_dir = tmp_path / "data" / "annotations"
    ann_dir.mkdir(parents=True)
    rows = [
        ("1.jpg", "A man rides a wave."),
        ("2.jpg", "a man and a dog play"),
        ("3.jpg", "the dog runs on grass"),
    ]
    with open(ann_dir / "captions.tsv", "w") as f:
        for img, cap in rows:
            f.write("%s\t%s\n" % (img, cap))
    params = {
        "data_dir": str(tmp_path / "data"),
        "train_ann_path": "annotations/captions.tsv",
        "vocab_path": str(tmp_path / "vocab.pkl"),
        "vocab_threshold": 1,
    }
    vocab = get_vocabulary("Flickr", params)
    assert vocab("man") > 3 and vocab("dog") > 3
    assert vocab.word_to_index["<pad>"] == 0


def test_invalid_dataset_raises(tmp_path):
    params = {
        "data_dir": str(tmp_path),
        "train_ann_path": "x.json",
        "vocab_path": str(tmp_path / "vocab.pkl"),
        "vocab_threshold": 1,
    }
    with pytest.raises(ValueError):
        get_vocabulary("ImageNet", params)


def test_tokenizer_fallback_path(monkeypatch):
    """Force the punkt-free fallback and check it matches the nltk path
    on caption-like text."""
    import show_tell_tpu.vocab.tokenize as tok

    sentences = [
        "a man riding a wave on top of a surfboard.",
        "two dogs play. one dog rests.",
        "don't stop; it's 3.5-ft tall...",
    ]
    expected = [tok.word_tokenize(s) for s in sentences]  # current (nltk or fallback)
    monkeypatch.setattr(tok, "_NLTK_WORD_TOKENIZE", False)
    got = [tok.word_tokenize(s) for s in sentences]
    # Single-sentence captions must agree exactly; the multi-sentence one
    # may differ only in sentence-final period splitting.
    assert got[0] == expected[0]
    assert got[2] == expected[2]
    assert [t for t in got[1] if t not in {"."}] == [t for t in expected[1] if t not in {"."}]


def test_flickr_vocab_consistent_with_dataset_index(tmp_path):
    """The vocabulary builder and FlickrCaptions share parse_flickr_tsv,
    so every word the dataset will feed (including from quoted/suffixed
    rows) is exactly what the vocab counted."""
    from show_tell_tpu.data.coco import FlickrCaptions
    from show_tell_tpu.vocab.tokenize import word_tokenize

    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    tsv = ann_dir / "captions.tsv"
    tsv.write_text(
        'a.jpg#0\t"A man waves hello\n'
        "a.jpg#1\ta dog runs fast\n"
        "b.jpg\ta dog sits\n"
    )
    params = {
        "data_dir": str(tmp_path),
        "train_ann_path": "annotations/captions.tsv",
        "vocab_path": str(tmp_path / "vocab.pkl"),
        "vocab_threshold": 1,
    }
    vocab = get_vocabulary("Flickr", params)

    idx = FlickrCaptions(str(tsv))
    dataset_words = set()
    for ann in idx.anns.values():
        dataset_words.update(word_tokenize(str(ann["caption"]).lower()))
    unk = vocab.word_to_index["<unk>"]
    for w in dataset_words:
        assert vocab(w) != unk, w  # threshold 1: every dataset word known


# ------- live differential vs the reference's own vocab_builder ------- #

REF_VOCAB_BUILDER = "/root/reference/vocab_builder.py"


def _load_reference_vocab_builder(monkeypatch):
    """Import the ACTUAL reference vocab_builder.py.  Its hard deps that
    this sandbox lacks are faked at the boundary: pycocotools' COCO is
    replaced by a minimal anns-index (same insertion order — pycocotools
    createIndex iterates dataset['annotations'] in list order, exactly
    what the fake does), and nltk.tokenize.word_tokenize (needs absent
    punkt data) is patched to OUR tokenizer so both builders consume an
    identical token stream — the differential then pins the builder
    semantics themselves: specials ids 0-3, Counter first-seen insertion
    order, >= threshold filter, pickle format.  Loaded under the module
    name "vocab_builder" so its pickles carry the same class path a real
    reference run writes."""
    import importlib.util
    import sys as _sys
    import types

    import nltk

    from show_tell_tpu.vocab.tokenize import word_tokenize as ours

    class _FakeCOCO:
        def __init__(self, ann_path):
            import json as _json

            with open(ann_path) as f:
                data = _json.load(f)
            self.anns = {a["id"]: a for a in data["annotations"]}

    fake_pkg = types.ModuleType("pycocotools")
    fake_coco = types.ModuleType("pycocotools.coco")
    fake_coco.COCO = _FakeCOCO
    fake_pkg.coco = fake_coco
    monkeypatch.setitem(_sys.modules, "pycocotools", fake_pkg)
    monkeypatch.setitem(_sys.modules, "pycocotools.coco", fake_coco)
    ours("probe.")  # resolve our tokenizer's one-time nltk probe BEFORE
    # the patch below makes nltk.tokenize.word_tokenize point back at us
    # (otherwise a fresh process recurses: ours -> probe -> ours -> ...)
    monkeypatch.setattr(nltk.tokenize, "word_tokenize", ours)

    cwd = os.getcwd()
    spec = importlib.util.spec_from_file_location("vocab_builder", REF_VOCAB_BUILDER)
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(_sys.modules, "vocab_builder", mod)
    try:
        spec.loader.exec_module(mod)  # module-level os.chdir(/root/reference)
    finally:
        os.chdir(cwd)
    return mod


@pytest.mark.skipif(not os.path.exists(REF_VOCAB_BUILDER), reason="reference checkout not available")
@pytest.mark.parametrize("threshold", [1, 2])
def test_vocab_differential_vs_live_reference(tmp_path, monkeypatch, threshold):
    """Our get_vocabulary must produce bit-identical word<->id maps to
    the reference's get_vocabulary run live on the same annotations and
    token stream (vocab_builder.py:46-102), at both the all-words and a
    filtering threshold."""
    ref_mod = _load_reference_vocab_builder(monkeypatch)
    build_mini_coco(str(tmp_path / "data"))
    params = mini_params(str(tmp_path / "data"), str(tmp_path / "out"), vocab_threshold=threshold)

    ref_params = dict(params, vocab_path=str(tmp_path / "ref_vocab.pkl"))
    ref_vocab = ref_mod.get_vocabulary("MSCOCO", ref_params)

    ours_params = dict(params, vocab_path=str(tmp_path / "our_vocab.pkl"))
    our_vocab = get_vocabulary("MSCOCO", ours_params)

    assert our_vocab.word_to_index == ref_vocab.word_to_index
    assert our_vocab.index_to_word == ref_vocab.index_to_word
    assert our_vocab.index == ref_vocab.index
    assert len(our_vocab) == len(ref_vocab)

    # A pickle the reference code itself wrote must load through our
    # compat unpickler (class path "vocab_builder.DatasetVocabulary").
    loaded = load_vocab(ref_params["vocab_path"])
    assert loaded.word_to_index == our_vocab.word_to_index
    assert type(loaded).__module__.startswith("show_tell_tpu")

    # ...and the ROUND-TRIP: the reference's own get_vocabulary must
    # unpickle the vocab WE saved bit-identically (vocab_builder.py:58-61
    # takes the load branch because the file exists).  save_vocab writes
    # the stream under the reference's class path, so no shim is needed
    # on the reference side.
    ref_loaded = ref_mod.get_vocabulary("MSCOCO", dict(params, vocab_path=ours_params["vocab_path"]))
    assert isinstance(ref_loaded, ref_mod.DatasetVocabulary)
    assert ref_loaded.word_to_index == our_vocab.word_to_index
    assert ref_loaded.index_to_word == our_vocab.index_to_word
    assert ref_loaded.index == our_vocab.index


def test_save_vocab_reference_class_path_without_reference(tmp_path):
    """save_vocab writes the reference's class path even when no
    vocab_builder module exists (the stub is transient: sys.modules is
    untouched afterwards), and load_vocab round-trips the file."""
    import sys

    from show_tell_tpu.vocab.vocabulary import DatasetVocabulary, save_vocab

    assert "vocab_builder" not in sys.modules
    v = DatasetVocabulary()
    for w in ["<pad>", "<start>", "<end>", "<unk>", "cat"]:
        v.add_new_word(w)
    path = str(tmp_path / "v.pkl")
    save_vocab(v, path)
    assert "vocab_builder" not in sys.modules  # stub cleaned up
    raw = open(path, "rb").read()
    assert b"vocab_builder" in raw and b"DatasetVocabulary" in raw
    loaded = load_vocab(path)
    assert loaded.word_to_index == v.word_to_index
    assert loaded.index_to_word == v.index_to_word
    assert loaded.index == v.index == 5


@pytest.mark.skipif(not os.path.exists(REF_VOCAB_BUILDER), reason="reference checkout not available")
def test_flickr_vocab_differential_vs_live_reference(tmp_path, monkeypatch):
    """The Flickr branch (vocab_builder.py:82-88 reads the TSV with
    pd.read_table): bit-identical word<->id maps on a TSV with a
    well-formed csv-quoted caption (pandas unescapes ``""`` -> ``"``;
    our _csv_unquote must match, else insertion ORDER shifts every
    later id).  An UNbalanced quote crashes the reference's pandas
    parse outright — our parser keeps such rows raw (pinned by
    test_flickr_vocab_consistent_with_dataset_index), so only the
    parseable case is differential."""
    ref_mod = _load_reference_vocab_builder(monkeypatch)
    tsv = tmp_path / "captions.tsv"
    tsv.write_text(
        'a.jpg#0\t"A man says ""hi"" loudly"\n'
        "a.jpg#1\ta man waves\n"
        "b.jpg\ta dog sits, happily!\n"
    )
    base = {"data_dir": str(tmp_path), "train_ann_path": "captions.tsv", "vocab_threshold": 1}
    ref_vocab = ref_mod.get_vocabulary("Flickr", dict(base, vocab_path=str(tmp_path / "r.pkl")))
    our_vocab = get_vocabulary("Flickr", dict(base, vocab_path=str(tmp_path / "o.pkl")))
    assert our_vocab.word_to_index == ref_vocab.word_to_index
    assert our_vocab.index_to_word == ref_vocab.index_to_word
