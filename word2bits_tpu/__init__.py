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

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.ops.quantize import quantize, quantize_ste

__version__ = "0.1.0"

__all__ = [
    "Word2BitsConfig",
    "quantize",
    "quantize_ste",
]
