from word2bits_tpu.data.vocab import Vocab
from word2bits_tpu.data.corpus import encode_corpus, count_words, tokenize_bytes
from word2bits_tpu.data.pipeline import build_epoch_arrays, EpochArrays

__all__ = [
    "Vocab",
    "encode_corpus",
    "count_words",
    "tokenize_bytes",
    "build_epoch_arrays",
    "EpochArrays",
]
