"""Vectorized/TPU kernels: match-table search, bit-packing, decode."""
