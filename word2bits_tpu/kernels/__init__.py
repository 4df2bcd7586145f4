from word2bits_tpu.kernels.quantize_pallas import quantize_pallas
from word2bits_tpu.kernels.score_pallas import quantized_scores_pallas

__all__ = ["quantize_pallas", "quantized_scores_pallas"]
