from word2bits_tpu.sampling.unigram import AliasTable, build_alias_table, draw_negatives

__all__ = ["AliasTable", "build_alias_table", "draw_negatives"]
