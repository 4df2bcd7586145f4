from word2bits_tpu.models.init import init_params
from word2bits_tpu.models.cbow import (
    Batch,
    CBOWHyper,
    ChunkScalars,
    cbow_forward_scores,
    cbow_minibatch_update,
    make_train_chunk,
)
from word2bits_tpu.models.cbow_slab import (
    SlabInputs,
    make_slab_train_chunk,
    slab_step,
)
from word2bits_tpu.models.cbow_fused import (
    deinterleave,
    fused_slab_step,
    interleave,
    make_fused_train_chunk,
)
from word2bits_tpu.models.skipgram import (
    make_skipgram_train_chunk,
    skipgram_slab_step,
)

__all__ = [
    "init_params",
    "Batch", "CBOWHyper", "ChunkScalars",
    "cbow_forward_scores", "cbow_minibatch_update", "make_train_chunk",
    "SlabInputs", "make_slab_train_chunk", "slab_step",
    "deinterleave", "fused_slab_step", "interleave", "make_fused_train_chunk",
    "make_skipgram_train_chunk", "skipgram_slab_step",
]
