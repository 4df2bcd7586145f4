from word2bits_tpu.utils.lcg import lcg_uniform_block, lcg_next, lcg_values_scalar

__all__ = ["lcg_uniform_block", "lcg_next", "lcg_values_scalar"]
