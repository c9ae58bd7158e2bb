"""Sequential commit: turn per-position match tables into a token stream.

The greedy LZSS parse is a loop-carried walk (each token's length decides the
next position), but given precomputed match tables it is O(N) with trivial
per-token work — all the O(N*window) search cost was paid in the parallel
phase.  This Python implementation is the behavioral spec; the native C++
engine (tamp_tpu._native) runs the same walk at memory speed.

Exactness notes (all mirrored from the reference encoder semantics,
tamp/compressor.py:281-447):

- Steady state (>= 16 bytes remaining) uses the precomputed tables; the last
  <16 positions replay the reference's shrinking-look-ahead flush drain with
  an exact search over a materialized ring.
- The full-search cap is min(16, max_pattern) and the lazy-probe cap is
  min(15, max_pattern) (the probe target drops the first look-ahead byte),
  which is why the parallel phase produces tables at both caps.  The probe
  table at index t is the search for target data[t+1:] against the ring
  *before* the literal at t is written — the reference probes first and only
  then writes the literal.
- Lazy matching emits a literal and caches the probe result when the next
  position matches longer and the literal write cannot clobber the cached
  match's source bytes.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    HUFFMAN_CODES,
    HUFFMAN_LENGTHS,
    compute_min_pattern_size,
)
from ..exceptions import ExcessBitsError

__all__ = ["commit_v1", "ring_model_snapshot", "ring_find_longest"]


def ring_model_snapshot(C: np.ndarray, t: int, window_bits: int) -> bytearray:
    """Materialize the v1-model ring buffer at input position ``t``.

    ``C = dictionary || data``; slot ``x`` holds the most recent write, i.e.
    ``C[W + t - tau + x]`` for ``x < tau`` and ``C[t - tau + x]`` otherwise.
    """
    W = 1 << window_bits
    tau = t % W
    ring = bytearray(W)
    ring[:tau] = C[W + t - tau : W + t].tobytes()
    ring[tau:] = C[t : t + W - tau].tobytes()
    return ring


def ring_find_longest(ring, target, min_pattern: int, cap: int):
    """Reference growing-prefix search over a linear ring buffer."""
    limit = min(len(target), cap)
    if limit < min_pattern:
        return 0, 0
    buf = bytes(ring)
    size = min_pattern
    idx = buf.find(bytes(target[:size]))
    if idx < 0:
        return 0, size - 1
    while size < limit:
        nxt = buf.find(bytes(target[: size + 1]), idx)
        if nxt < 0:
            break
        idx = nxt
        size += 1
    return idx, size


def commit_v1(
    data: np.ndarray,
    tables,
    model_C: np.ndarray,
    window_bits: int,
    literal_bits: int,
    lazy_matching: bool = False,
):
    """Greedy v1 token walk; returns (values, nbits) uint32/uint8 arrays.

    Token fields are <= 24 bits: literal = flag|byte, match = huffman|offset.
    """
    W = 1 << window_bits
    minp = compute_min_pattern_size(window_bits, literal_bits)
    maxpat = minp + 13
    full_cap = min(16, maxpat)
    if full_cap == 16:
        flen, fidx = tables.len16, tables.idx16
    else:
        flen, fidx = tables.len15, tables.idx15
    plen, pidx = tables.probe_len, tables.probe_idx
    if lazy_matching and plen is None:
        raise ValueError("lazy commit requires probe tables (compute_probe=True)")

    N = int(data.shape[0])
    lit_flag = 1 << literal_bits
    lit_bits = literal_bits + 1
    lit_limit = 256 if literal_bits == 8 else lit_flag

    values: list[int] = []
    nbits: list[int] = []
    emit = values.append
    emit_n = nbits.append

    ring = None
    tau_ring = 0
    t = 0
    cached = None

    while t < N:
        rem = N - t
        steady = rem >= 16

        if not steady and ring is None:
            ring = ring_model_snapshot(model_C, t, window_bits)
            tau_ring = t % W

        if lazy_matching and cached is not None:
            idx, size = cached
            cached = None
        elif steady:
            size = int(flen[t])
            idx = int(fidx[t])
        else:
            idx, size = ring_find_longest(ring, data[t : t + rem], minp, min(rem, maxpat))

        pending = rem if rem < 16 else 16
        if lazy_matching and minp <= size <= 8 and pending > size + 2:
            if steady:
                psize = int(plen[t])
                pix = int(pidx[t])
            else:
                pix, psize = ring_find_longest(
                    ring, data[t + 1 : t + rem], minp, min(rem - 1, maxpat)
                )
            tau = t % W
            if psize > size and not (pix <= tau < pix + psize):
                b = int(data[t])
                if b >= lit_limit:
                    raise ExcessBitsError
                emit(lit_flag | b)
                emit_n(lit_bits)
                if ring is not None:
                    ring[tau_ring] = b
                    tau_ring = (tau_ring + 1) % W
                cached = (pix, psize)
                t += 1
                continue

        if size >= minp:
            sym = size - minp
            emit((HUFFMAN_CODES[sym] << window_bits) | idx)
            emit_n(HUFFMAN_LENGTHS[sym] + window_bits)
            if ring is not None:
                for k in range(size):
                    ring[tau_ring] = data[t + k]
                    tau_ring = (tau_ring + 1) % W
            t += size
        else:
            b = int(data[t])
            if b >= lit_limit:
                raise ExcessBitsError
            emit(lit_flag | b)
            emit_n(lit_bits)
            if ring is not None:
                ring[tau_ring] = b
                tau_ring = (tau_ring + 1) % W
            t += 1

    return (
        np.asarray(values, dtype=np.uint32),
        np.asarray(nbits, dtype=np.uint8),
    )
