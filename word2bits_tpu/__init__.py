"""word2bits_tpu — a TPU-native quantized word-embedding engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Word2Bits
(arXiv 1803.05651; reference C++ at /root/reference): CBOW with negative
sampling where parameters are quantized to 2^bitlevel discrete values in the
forward pass over a full-precision backing store (straight-through
estimation).  The reference's Hogwild per-thread SGD loop
(reference src/word2bits.cpp:363-516) becomes a batched synchronous training
step under jit/shard_map; the 10^8-entry unigram table becomes an on-device
alias sampler; the analogy evaluator becomes one batched matmul.
"""

from word2bits_tpu.config import Word2BitsConfig, config_from_argv
from word2bits_tpu.ops.quantize import quantize, quantize_ste

__version__ = "0.1.0"

__all__ = [
    "Word2BitsConfig",
    "config_from_argv",
    "quantize",
    "quantize_ste",
    "train",
    "evaluate_analogies",
]


def __getattr__(name):
    # heavy imports on demand so `import word2bits_tpu` stays light
    if name == "train":
        from word2bits_tpu.train import train
        return train
    if name == "evaluate_analogies":
        from word2bits_tpu.eval.analogy import evaluate_analogies
        return evaluate_analogies
    raise AttributeError(name)
