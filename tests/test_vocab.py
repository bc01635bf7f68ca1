"""Vocabulary + tokenizer tests (reference vocab_builder.py semantics)."""

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
