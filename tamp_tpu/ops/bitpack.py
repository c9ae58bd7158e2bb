"""Parallel bit-packing: (value, nbits) token streams -> packed MSB-first bytes.

Replaces the serial bit-writer for bulk encoding (reference equivalent:
tamp/compressor.py:36-87).  The algorithm is scatter-free on the host:

1. exclusive prefix-sum of ``nbits`` gives each field's bit offset;
2. each field is left-aligned into a 64-bit lane starting at its byte
   offset (fields are <= 33 bits, a 7-bit intra-byte shift keeps them
   within 40 bits, so 8 bytes always suffice);
3. the eight byte-lanes are accumulated with ``np.bincount`` — bits are
   disjoint across fields, so addition equals bitwise OR and float64
   accumulation is exact (byte values < 2**53).

A jnp variant with a segment-sum scatter is provided for on-device packing.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_bits_np", "pack_bits_jnp", "bit_offsets"]


def bit_offsets(nbits: np.ndarray) -> tuple[np.ndarray, int]:
    """Exclusive prefix sum of bit widths and the total bit count."""
    nbits = np.asarray(nbits, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbits)))
    return offsets[:-1], int(offsets[-1])


def pack_bits_np(values: np.ndarray, nbits: np.ndarray) -> tuple[bytes, int]:
    """Pack fields MSB-first; returns (bytes, total_bits).

    The final byte is zero-padded on the right, matching the Tamp stream
    convention.  ``values`` must already be masked to ``nbits`` bits.
    """
    values = np.asarray(values, dtype=np.uint64)
    nbits64 = np.asarray(nbits, dtype=np.int64)
    if values.size == 0:
        return b"", 0
    offsets, total_bits = bit_offsets(nbits64)
    nbytes = (total_bits + 7) // 8

    start_byte = offsets >> 3
    lead = (offsets & 7).astype(np.uint64)
    # Left-align each field inside its 8-byte window.
    chunk = values << (np.uint64(64) - lead - nbits64.astype(np.uint64))

    out = np.zeros(nbytes + 8, dtype=np.float64)
    for k in range(8):
        lane = ((chunk >> np.uint64(56 - 8 * k)) & np.uint64(0xFF)).astype(np.float64)
        # bincount is a dense scatter-add; disjoint bits make it an OR.
        out[: nbytes + 8] += np.bincount(start_byte + k, weights=lane, minlength=nbytes + 8)
    packed = out[:nbytes].astype(np.uint64).astype(np.uint8)
    return packed.tobytes(), total_bits


def pack_bits_jnp(values, nbits, max_bytes: int):
    """JAX variant: returns (uint8 array of length max_bytes, total_bits).

    Works under jit (32-bit mode) with a static output size; the caller
    slices to ``(total_bits + 7) // 8`` bytes on the host.  Fields must be
    <= 24 bits — wider tokens (extended match: huffman+size then offset) are
    emitted as two fields by the encoders, so ``lead + nbits <= 31`` and each
    field fits a 4-byte uint32 window.
    """
    import jax.numpy as jnp

    values = values.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    # Bit offsets can exceed 2**31 only past ~256 MiB per shard; shards are
    # far smaller, so int32 cumsum is safe on-device.
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nbits)])
    total_bits = offsets[-1]
    starts = offsets[:-1]

    start_byte = starts >> 3
    lead = (starts & 7).astype(jnp.uint32)
    chunk = values << (jnp.uint32(32) - lead - nbits.astype(jnp.uint32))

    out = jnp.zeros(max_bytes + 4, dtype=jnp.uint32)
    for k in range(4):
        lane = (chunk >> jnp.uint32(24 - 8 * k)) & jnp.uint32(0xFF)
        out = out.at[start_byte + k].add(lane, mode="drop")
    return out[:max_bytes].astype(jnp.uint8), total_bits
