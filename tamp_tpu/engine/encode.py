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


def opt_ext_runs(data, window: int):
    """Forced-RLE region structure for the extended optimal parse.

    Regions cover byte runs >= 13 (empirical sweep: below 13 forced RLE
    displaces cheaper match coverage, above it leaves RLE wins on the
    table; the run's first byte stays in the DP so the decoder's
    previous-window-byte equals the run byte).  Returns ``(runs, khat,
    chunks)``: ``runs`` — (a, b) input-coordinate region pairs; ``khat``
    — (n+1,) uint32 write counts modeling the per-chunk <=8-byte no-wrap
    window writes (None when no region exists); ``chunks`` — per RLE
    chunk (start, count) pairs in DP walk order.  Shared by the host DP
    (encode_extended_optimal) and the device DP pipeline
    (engine/pipeline_ext.encode_ext_device_optimal) so both see the
    identical token family.
    """
    from ..constants import RLE_MAX_WINDOW_WRITE

    n = data.shape[0]
    W = 1 << window
    RUN_MIN = 13
    runs, chunks = [], []
    khat = None
    if n:
        starts_r = np.flatnonzero(np.concatenate(([True], data[1:] != data[:-1])))
        lens_r = np.diff(np.append(starts_r, n))
        long_mask = lens_r >= RUN_MIN
        if np.any(long_mask):
            inc = np.ones(n, np.int64)
            cum_full = np.cumsum(inc)  # writes-before assuming no skips
            skipped = 0
            for rs, ln in zip(starts_r[long_mask], lens_r[long_mask]):
                a, b = int(rs) + 1, int(rs + ln)
                runs.append((a, b))
                pos = int((cum_full[a - 1] - skipped) % W)
                i = a
                while i < b:
                    rest = b - i
                    count = 241 if rest >= 243 else (240 if rest == 242 else rest)
                    chunks.append((i, count))
                    wr = min(count, RLE_MAX_WINDOW_WRITE, W - pos)
                    inc[i + wr : i + count] = 0
                    skipped += count - wr
                    pos = (pos + wr) % W
                    i += count
            khat = np.zeros(n + 1, np.uint32)
            np.cumsum(inc, out=khat[1:])
    return runs, khat, chunks


def encode_extended_optimal(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    dictionary=None,
) -> bytes:
    """Optimal extended-format encode: minimum-bit DP over a
    divergence-controlled token family.

    Tokens: literals, basic matches, extended matches capped at the ring
    end (no write truncation), and forced RLE over long byte runs whose
    <=8-byte window writes are modeled by a write-count table (khat) that
    the match-table builder honors — so the exact tables stay valid under
    any parse the DP picks.  Output carries the extended header and decodes
    in every Tamp implementation; typically ~1% smaller than the
    reference's greedy+lazy extended output.
    """
    from .. import _native

    if not _native.available():
        raise RuntimeError(
            f"optimal parse needs the native engine: {_native.load_error()}")

    data = np.frombuffer(bytes(data), dtype=np.uint8)
    W = 1 << window
    dict_bytes = None
    if dictionary is not None:
        dict_bytes = bytes(dictionary)
        if len(dict_bytes) != W:
            raise ValueError("Dictionary-window size mismatch.")
    minp = compute_min_pattern_size(window, literal)
    cap = minp + 131

    runs, khat, _chunks = opt_ext_runs(data, window)

    flen, fidx = _native.native_v1_tables(
        data, window, literal, cap, dictionary=dict_bytes, ext_dict=True,
        khat=khat)
    sizes, kinds = _native.native_opt_ext_plan(
        data, flen, fidx, window, literal, khat=khat, runs=runs)
    return opt_ext_emit(data, sizes, kinds, fidx, window=window,
                        literal=literal,
                        custom_dict=dictionary is not None)


def opt_ext_emit(data, sizes, kinds, fidx, *, window: int, literal: int,
                 custom_dict: bool) -> bytes:
    """Bit-pack an extended optimal token plan (sizes/kinds per token,
    fidx the full per-position index table) into a complete stream —
    shared by the host and device optimal pipelines."""
    from ..constants import HUFFMAN_CODES, HUFFMAN_LENGTHS
    from ..exceptions import ExcessBitsError

    minp = compute_min_pattern_size(window, literal)
    T = sizes.shape[0]
    starts = np.zeros(T, np.int64)
    if T:
        np.cumsum(sizes[:-1], out=starts[1:])
    lit = kinds == 0
    basic = kinds == 1
    ext = kinds == 2
    rle = kinds == 3
    lit_limit = 256 if literal == 8 else (1 << literal)
    dstart = data[starts] if T else np.zeros(0, np.uint8)
    if np.any(lit & (dstart >= lit_limit)):
        raise ExcessBitsError
    HC = np.asarray(HUFFMAN_CODES, np.uint32)
    HL = np.asarray(HUFFMAN_LENGTHS, np.uint32)
    idx = fidx[starts].astype(np.uint32) if T else np.zeros(0, np.uint32)
    sym_b = np.clip(sizes.astype(np.int32) - minp, 0, 13)
    v_ext = np.clip(sizes.astype(np.int32) - minp - 12, 0, 119)
    sym2e = v_ext >> 3
    traile = (v_ext & 7).astype(np.uint32)
    v_rle = np.clip(sizes.astype(np.int32) - 2, 0, 239)  # count - 2
    sym2r = v_rle >> 4
    trailr = (v_rle & 15).astype(np.uint32)

    f1val = np.select(
        [lit, ext, rle],
        [(1 << literal) | dstart.astype(np.uint32),
         (HC[13] << (HL[sym2e] - 1)) | HC[sym2e],
         (HC[12] << (HL[sym2r] - 1)) | HC[sym2r]],
        default=(HC[sym_b] << window) | idx).astype(np.uint32)
    f1bits = np.select(
        [lit, ext, rle],
        [np.full(T, literal + 1, np.uint32),
         HUFFMAN_LENGTHS[13] + HL[sym2e] - 1,
         HUFFMAN_LENGTHS[12] + HL[sym2r] - 1],
        default=HL[sym_b] + window).astype(np.uint8)
    # second field: extended-match trail+offset, or RLE trail
    has_f2 = ext | rle
    f2val = np.where(ext, (traile << window) | idx, trailr).astype(np.uint32)
    f2bits = np.where(ext, 3 + window, 4).astype(np.uint8)

    n_f2 = int(has_f2.sum())
    pos = np.arange(T, dtype=np.int64)
    if T:
        pos += np.concatenate([[0], np.cumsum(has_f2.astype(np.int64))[:-1]])
    total = T + n_f2
    values = np.zeros(total, np.uint32)
    nbits = np.zeros(total, np.uint8)
    values[pos] = f1val
    nbits[pos] = f1bits
    values[pos[has_f2] + 1] = f2val[has_f2]
    nbits[pos[has_f2] + 1] = f2bits[has_f2]

    head = build_header(window, literal, custom_dict, True, False)
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
