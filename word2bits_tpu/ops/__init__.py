from word2bits_tpu.ops.quantize import quantize, quantize_ste
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut

__all__ = ["quantize", "quantize_ste", "sigmoid_exact", "sigmoid_lut"]
