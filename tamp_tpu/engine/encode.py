"""One-shot vectorized encode pipelines.

``encode_v1`` produces v1-format streams byte-identical to the reference
encoder at equal settings: parallel match-table search -> greedy commit ->
parallel bit-pack.  The extended-format pipeline lives in
:mod:`.encode_extended`.
"""

from __future__ import annotations

import numpy as np

from ..constants import compute_min_pattern_size  # noqa: F401  (API surface)
from ..dictionary import dictionary_array
from ..ops.bitpack import pack_bits_np
from .commit import commit_v1
from .search_np import match_tables

__all__ = ["encode_v1", "encode_extended_optimal", "build_header", "model_history"]


def build_header(
    window: int, literal: int, custom_dictionary: bool, extended: bool, dictionary_reset: bool
) -> list[tuple[int, int]]:
    """Header byte(s) as (value, nbits) fields."""
    header = (
        ((window - 8) << 5)
        | ((literal - 5) << 3)
        | ((1 if custom_dictionary else 0) << 2)
        | ((1 if extended else 0) << 1)
        | (1 if dictionary_reset else 0)
    )
    fields = [(header, 8)]
    if dictionary_reset:
        fields.append((0, 8))  # header byte 2, reserved
    return fields


def model_history(data: np.ndarray, window: int, literal: int, extended: bool, dictionary):
    """``C = initial_window || data`` — the v1 window-write history model."""
    if dictionary is not None:
        dict_arr = np.frombuffer(bytes(dictionary), dtype=np.uint8)
        if dict_arr.shape[0] != (1 << window):
            raise ValueError("Dictionary-window size mismatch.")
    else:
        # v1 compatibility quirk: non-extended streams always seed with
        # literal=8 (spec: specification.rst "Dictionary Initialization").
        dict_arr = dictionary_array(1 << window, literal=literal if extended else 8)
    return dict_arr, np.concatenate([dict_arr, data])


def _emit_v1_plan(data, sizes, flen, fidx, window: int, literal: int):
    """Expand a token-size plan into (values, nbits) — vectorized.

    ``sizes``: per-token byte counts (1 = literal).  Matches reuse the
    search table's offset at the token's position (any prefix of the
    longest match is a match at the same ring slot)."""
    from ..constants import HUFFMAN_CODES, HUFFMAN_LENGTHS
    from ..exceptions import ExcessBitsError

    minp = compute_min_pattern_size(window, literal)
    T = sizes.shape[0]
    starts = np.zeros(T, np.int64)
    np.cumsum(sizes[:-1], out=starts[1:] if T else starts[:0])
    lit = sizes == 1
    lit_limit = 256 if literal == 8 else (1 << literal)
    dstart = data[starts] if T else np.zeros(0, np.uint8)
    if np.any(lit & (dstart >= lit_limit)):
        raise ExcessBitsError
    sym = np.clip(sizes.astype(np.int32) - minp, 0, 13)
    HC = np.asarray(HUFFMAN_CODES[:14], np.uint32)
    HL = np.asarray(HUFFMAN_LENGTHS[:14], np.uint32)
    idx = fidx[starts].astype(np.uint32) if T else np.zeros(0, np.uint32)
    values = np.where(
        lit, (1 << literal) | dstart.astype(np.uint32),
        (HC[sym] << window) | idx).astype(np.uint32)
    nbits = np.where(lit, literal + 1, HL[sym] + window).astype(np.uint8)
    return values, nbits


def encode_extended_optimal(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    dictionary=None,
) -> bytes:
    """Optimal extended-format encode over the divergence-free token family.

    Minimum-bit DP over literals, basic matches, and extended matches capped
    at the ring end (no RLE, no write truncation) — without those two the
    window stays the tokenization-independent v1 model, so exact tables
    remain valid under any parse.  Output carries the extended header and
    decodes in every Tamp implementation; typically smaller than the
    reference's greedy+lazy extended output on match-rich data (very long
    byte runs are the exception — RLE there beats capped extended matches).
    """
    from .. import _native

    if not _native.available():
        raise RuntimeError(
            f"optimal parse needs the native engine: {_native.load_error()}")
    from ..constants import HUFFMAN_CODES, HUFFMAN_LENGTHS
    from ..exceptions import ExcessBitsError

    data = np.frombuffer(bytes(data), dtype=np.uint8)
    W = 1 << window
    dict_bytes = None
    if dictionary is not None:
        dict_bytes = bytes(dictionary)
        if len(dict_bytes) != W:
            raise ValueError("Dictionary-window size mismatch.")
    minp = compute_min_pattern_size(window, literal)
    cap = minp + 131
    flen, fidx = _native.native_v1_tables(
        data, window, literal, cap, dictionary=dict_bytes, ext_dict=True)
    sizes = _native.native_opt_ext_plan(data, flen, fidx, window, literal)

    T = sizes.shape[0]
    starts = np.zeros(T, np.int64)
    if T:
        np.cumsum(sizes[:-1], out=starts[1:])
    lit = sizes == 1
    ext = sizes >= minp + 12
    basic = ~lit & ~ext
    lit_limit = 256 if literal == 8 else (1 << literal)
    dstart = data[starts] if T else np.zeros(0, np.uint8)
    if np.any(lit & (dstart >= lit_limit)):
        raise ExcessBitsError
    HC = np.asarray(HUFFMAN_CODES, np.uint32)
    HL = np.asarray(HUFFMAN_LENGTHS, np.uint32)
    idx = fidx[starts].astype(np.uint32) if T else np.zeros(0, np.uint32)
    sym_b = np.clip(sizes.astype(np.int32) - minp, 0, 13)
    v_ext = np.clip(sizes.astype(np.int32) - minp - 12, 0, 119)
    sym2 = v_ext >> 3
    trail = (v_ext & 7).astype(np.uint32)

    f1val = np.where(
        lit, (1 << literal) | dstart.astype(np.uint32),
        np.where(ext, (HC[13] << (HL[sym2] - 1)) | HC[sym2],
                 (HC[sym_b] << window) | idx)).astype(np.uint32)
    f1bits = np.where(
        lit, literal + 1,
        np.where(ext, HUFFMAN_LENGTHS[13] + HL[sym2] - 1,
                 HL[sym_b] + window)).astype(np.uint8)
    f2val = ((trail << window) | idx).astype(np.uint32)

    n_ext = int(ext.sum())
    pos = np.arange(T, dtype=np.int64)
    if T:
        pos += np.concatenate([[0], np.cumsum(ext.astype(np.int64))[:-1]])
    total = T + n_ext
    values = np.zeros(total, np.uint32)
    nbits = np.zeros(total, np.uint8)
    values[pos] = f1val
    nbits[pos] = f1bits
    values[pos[ext] + 1] = f2val[ext]
    nbits[pos[ext] + 1] = 3 + window

    head = build_header(window, literal, dictionary is not None, True, False)
    all_values = np.concatenate([np.array([v for v, _ in head], np.uint32), values])
    all_nbits = np.concatenate([np.array([n for _, n in head], np.uint8), nbits])
    packed, _ = pack_bits_np(all_values, all_nbits)
    return packed


def encode_v1(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    lazy_matching: bool = False,
    dictionary=None,
    search_fn=None,
    parse: str = "greedy",
) -> bytes:
    """Encode a complete v1 (non-extended) Tamp stream.

    ``search_fn(data, dict_arr, window_bits)`` may override the match-table
    backend (NumPy oracle by default; the JAX/Pallas kernels plug in here).

    ``parse="greedy"`` (default) is byte-identical to the reference encoder;
    ``parse="optimal"`` runs a minimum-bit dynamic program over the same
    match tables — output is strictly <= the greedy size, still a
    spec-conforming v1 stream any Tamp decoder reads (a capability the
    reference does not have).
    """
    data = np.frombuffer(bytes(data), dtype=np.uint8)
    dict_arr, C = model_history(data, window, literal, False, dictionary)

    searcher = search_fn or match_tables
    if parse == "optimal":
        from .. import _native

        if not _native.available():
            raise RuntimeError(
                f"optimal parse needs the native engine: {_native.load_error()}")
        minp = compute_min_pattern_size(window, literal)
        cap = min(16, minp + 13)
        if search_fn is None:
            # chain-search-speed exact tables (same semantics as the oracle)
            flen, fidx = _native.native_v1_tables(
                data, window, literal, cap, dictionary=dict_arr.tobytes())
        else:
            tables = searcher(data, dict_arr, window, compute_probe=False)
            if cap == 16:
                flen, fidx = tables.len16, tables.idx16
            else:
                flen, fidx = tables.len15, tables.idx15
        sizes = _native.native_opt_v1_plan(data, flen, fidx, window, literal)
        values, nbits = _emit_v1_plan(data, sizes, flen, fidx, window, literal)
    elif parse == "greedy":
        tables = searcher(data, dict_arr, window, compute_probe=lazy_matching)
        values, nbits = commit_v1(data, tables, C, window, literal, lazy_matching)
    else:
        raise ValueError(f"unknown parse strategy: {parse!r}")

    head = build_header(window, literal, dictionary is not None, False, False)
    all_values = np.concatenate([np.array([v for v, _ in head], np.uint32), values])
    all_nbits = np.concatenate([np.array([n for _, n in head], np.uint8), nbits])
    packed, _ = pack_bits_np(all_values, all_nbits)
    return packed
