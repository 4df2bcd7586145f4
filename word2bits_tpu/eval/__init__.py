from word2bits_tpu.eval.analogy import (
    AnalogyResult,
    evaluate_analogies,
    format_report,
    load_questions,
)

__all__ = ["AnalogyResult", "evaluate_analogies", "format_report", "load_questions"]
