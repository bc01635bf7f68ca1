"""Caption tokenization, bit-compatible with the reference's nltk pipeline.

The reference tokenizes every caption with ``nltk.tokenize.word_tokenize``
on the lowercased text (reference vocab_builder.py:79-88, utils.py:50).
``word_tokenize`` = punkt sentence split + NLTK's improved Treebank word
tokenizer per sentence.

The Treebank word tokenizer (``NLTKWordTokenizer``) is pure regex and needs
no downloaded data, so we always use the real thing for word splitting —
that is what makes ids bit-exact.  The punkt sentence model is a *trained*
artifact that may be absent (it only matters for multi-sentence captions,
where it lets the tokenizer split a sentence-final period).  When punkt is
unavailable we fall back to a lightweight rule-based splitter tuned for
caption text; for the single-sentence captions that dominate COCO the two
paths are identical.
"""

from __future__ import annotations

import re
from typing import List

from nltk.tokenize.destructive import NLTKWordTokenizer

_TREEBANK = NLTKWordTokenizer()

# Resolved lazily: None = not yet probed, False = unavailable.
_NLTK_WORD_TOKENIZE = None

# Common lowercase abbreviations that should not end a sentence in the
# fallback splitter (captions are lowercased before tokenization).
_ABBREVS = {
    "mr.", "mrs.", "ms.", "dr.", "st.", "no.", "vs.", "etc.", "approx.",
    "jr.", "sr.", "prof.", "inc.", "ltd.", "co.", "e.g.", "i.e.",
}

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+")


def _probe_nltk():
    global _NLTK_WORD_TOKENIZE
    if _NLTK_WORD_TOKENIZE is None:
        try:
            import nltk

            nltk.tokenize.word_tokenize("probe.")
            _NLTK_WORD_TOKENIZE = nltk.tokenize.word_tokenize
        except LookupError:
            _NLTK_WORD_TOKENIZE = False
    return _NLTK_WORD_TOKENIZE


def _sent_split(text: str) -> List[str]:
    """Rule-based stand-in for punkt on caption-like text."""
    pieces = _SENT_BOUNDARY.split(text)
    sents: List[str] = []
    for piece in pieces:
        if sents:
            prev = sents[-1]
            last_word = prev.rsplit(None, 1)[-1] if prev.strip() else ""
            # Re-join if the "boundary" was an abbreviation or single letter
            # (e.g. "u. s."), which punkt would not split on.
            if last_word in _ABBREVS or re.fullmatch(r"\w\.", last_word):
                sents[-1] = prev + " " + piece
                continue
        sents.append(piece)
    return [s for s in sents if s.strip()]


def word_tokenize(text: str) -> List[str]:
    """Drop-in for ``nltk.tokenize.word_tokenize`` with an offline fallback."""
    nltk_wt = _probe_nltk()
    if nltk_wt:
        return nltk_wt(text)
    return [tok for sent in _sent_split(text) for tok in _TREEBANK.tokenize(sent)]
