from .bits import bit_reverse_indices, log2_strict, reverse_bits  # noqa: F401
