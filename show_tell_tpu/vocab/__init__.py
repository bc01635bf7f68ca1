from show_tell_tpu.vocab.tokenize import word_tokenize
from show_tell_tpu.vocab.vocabulary import DatasetVocabulary, get_vocabulary

__all__ = ["word_tokenize", "DatasetVocabulary", "get_vocabulary"]
