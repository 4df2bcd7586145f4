from word2bits_tpu.models.init import init_params
from word2bits_tpu.models.cbow import (
    CBOWHyper,
    cbow_forward_scores,
    cbow_minibatch_update,
    make_train_chunk,
)

__all__ = [
    "init_params",
    "CBOWHyper",
    "cbow_forward_scores",
    "cbow_minibatch_update",
    "make_train_chunk",
]
