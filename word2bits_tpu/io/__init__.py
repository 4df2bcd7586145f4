from word2bits_tpu.io.vectors import (
    read_vectors,
    write_vectors,
    output_vectors,
)

__all__ = ["read_vectors", "write_vectors", "output_vectors"]
