"""Vocabulary: word<->index maps with reference-exact construction.

Mirrors reference vocab_builder.py:11-102 semantics:
  * specials ``<pad> <start> <end> <unk>`` get ids 0-3 (vocab_builder.py:68-69);
  * every train caption is lowercased and nltk-tokenized
    (vocab_builder.py:79-88);
  * words with count >= ``vocab_threshold`` are added in caption-iteration
    (Counter insertion) order (vocab_builder.py:94-96), which pins ids
    bit-exactly given the same annotation file;
  * result is pickled to ``params['vocab_path']`` and reloaded when present
    (vocab_builder.py:58-61, 98-100).

Pickle compatibility is BOTH ways (vocab_builder.py:58-61, 98-100):
  * a ``vocab.pkl`` produced by the *reference* stores a
    ``vocab_builder.DatasetVocabulary`` instance; ``load_vocab`` remaps
    that module path onto this class so reference files load unchanged;
  * ``save_vocab`` writes the pickle under that SAME module path
    (``vocab_builder.DatasetVocabulary``), so the reference's own
    ``get_vocabulary`` unpickles a vocab saved here bit-identically —
    a reference user can hand their training dirs to this framework and
    back without rebuilding vocabularies.  Loading such a file in *this*
    package must go through ``load_vocab`` (plain ``pickle.load`` would
    try to import ``vocab_builder``).
"""

from __future__ import annotations

import os
import pickle
import sys
import types
from collections import Counter
from typing import Any, Dict

from show_tell_tpu.vocab.tokenize import word_tokenize


class DatasetVocabulary(object):
    """Callable word->index map (reference vocab_builder.py:11-44)."""

    def __init__(self):
        self.word_to_index: Dict[str, int] = {}
        self.index_to_word: Dict[int, str] = {}
        self.index = 0

    def add_new_word(self, word: str) -> None:
        if word not in self.word_to_index:
            self.word_to_index[word] = self.index
            self.index_to_word[self.index] = word
            self.index += 1

    def __call__(self, word: str) -> int:
        if word not in self.word_to_index:
            return self.word_to_index["<unk>"]
        return self.word_to_index[word]

    def __len__(self) -> int:
        return len(self.word_to_index)

    def start_token(self) -> str:
        return "<start>"

    def end_token(self) -> str:
        return "<end>"


class _CompatUnpickler(pickle.Unpickler):
    """Remaps reference module paths onto this package when unpickling."""

    _REMAP = {
        ("vocab_builder", "DatasetVocabulary"): DatasetVocabulary,
    }

    def find_class(self, module: str, name: str):
        cls = self._REMAP.get((module, name))
        if cls is not None:
            return cls
        return super().find_class(module, name)


def load_vocab(path: str) -> DatasetVocabulary:
    with open(path, "rb") as f:
        obj = _CompatUnpickler(f).load()
    vocab = DatasetVocabulary()
    vocab.__dict__.update(obj.__dict__)
    return vocab


class _ReferenceShim(object):
    """Placeholder class pickled under the reference's module path; its
    instances carry only the vocabulary __dict__ state (the reference
    class pickles the same way — plain attribute BUILD)."""


_ReferenceShim.__module__ = "vocab_builder"
_ReferenceShim.__name__ = _ReferenceShim.__qualname__ = "DatasetVocabulary"


def save_vocab(vocab: DatasetVocabulary, path: str) -> None:
    """Atomic write (tmp + rename): under multi-host every process may
    build and save the identical vocab concurrently into a shared
    output dir; a plain open(path, 'wb') could hand another process a
    torn pickle mid-write.

    The stream stores the object under the REFERENCE's class path
    (``vocab_builder.DatasetVocabulary``) so the reference's own
    ``get_vocabulary`` (vocab_builder.py:58-61) unpickles it directly —
    the round-trip counterpart of ``load_vocab``'s remap.  When the real
    reference module is already imported its class is used (pickle
    verifies module attribute identity); otherwise a stub module is
    registered for the duration of the dump."""
    prior = sys.modules.get("vocab_builder")
    mod = prior
    transient = mod is None or not hasattr(mod, "DatasetVocabulary")
    if transient:
        mod = types.ModuleType("vocab_builder")
        mod.DatasetVocabulary = _ReferenceShim
        sys.modules["vocab_builder"] = mod
    try:
        cls = mod.DatasetVocabulary
        obj = cls.__new__(cls)
        obj.__dict__.update(
            {
                "word_to_index": dict(vocab.word_to_index),
                "index_to_word": dict(vocab.index_to_word),
                "index": int(vocab.index),
            }
        )
        tmp = "%s.tmp.%d" % (path, os.getpid())
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)
    finally:
        if transient:
            if prior is None:
                del sys.modules["vocab_builder"]
            else:
                sys.modules["vocab_builder"] = prior


def get_vocabulary(dataset: str, params: Dict[str, Any]) -> DatasetVocabulary:
    """Build (or load cached) vocabulary; reference vocab_builder.py:46-102."""
    if os.path.isfile(params["vocab_path"]):
        print("Loading vocabulary from the existing file.")
        return load_vocab(params["vocab_path"])

    print("Vocabulary does not exist. Creating vocab...")
    vocab_dataset = DatasetVocabulary()
    for word in ["pad", "start", "end", "unk"]:
        vocab_dataset.add_new_word("<" + word + ">")

    annotation_path = os.path.join(params["data_dir"], params["train_ann_path"])
    caption_tokens: Counter = Counter()

    if dataset == "MSCOCO":
        print("Building vocabulary for the MSCOCO dataset.")
        from show_tell_tpu.data.coco import CocoCaptions

        coco = CocoCaptions(annotation_path)
        # Iterate annotations in file order (what pycocotools' anns dict
        # iteration gives, vocab_builder.py:79-80) so Counter insertion
        # order — and therefore word ids — match the reference bit-exactly.
        for ann_id in coco.anns.keys():
            caption_tokens.update(word_tokenize(str(coco.anns[ann_id]["caption"]).lower()))
    elif dataset == "Flickr":
        print("Building vocabulary for the Flickr dataset.")
        # Reference vocab_builder.py:84-88 reads a headerless TSV with
        # columns (image, caption) via pandas.  We split on the first tab
        # (no csv/pandas quote interpretation — a caption starting with a
        # double-quote must not swallow later rows) so the vocabulary
        # stays consistent with the FlickrCaptions dataset index; the
        # deviation is unobservable in the reference, whose Flickr path
        # is unreachable (data_source hardcoded, main.py:29).
        from show_tell_tpu.data.coco import parse_flickr_tsv

        for _, caption in parse_flickr_tsv(annotation_path):
            caption_tokens.update(word_tokenize(str(caption).lower()))
    else:
        raise ValueError("Please specify a valid dataset. %s is invalid." % (dataset,))

    for vw, vw_count in caption_tokens.items():
        if vw_count >= params["vocab_threshold"]:
            vocab_dataset.add_new_word(vw)

    os.makedirs(os.path.dirname(params["vocab_path"]) or ".", exist_ok=True)
    save_vocab(vocab_dataset, params["vocab_path"])
    return vocab_dataset
