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

__all__ = ["encode_v1", "build_header", "model_history"]


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


def encode_v1(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    lazy_matching: bool = False,
    dictionary=None,
    search_fn=None,
) -> bytes:
    """Encode a complete v1 (non-extended) Tamp stream.

    ``search_fn(data, dict_arr, window_bits)`` may override the match-table
    backend (NumPy oracle by default; the JAX/Pallas kernels plug in here).
    """
    data = np.frombuffer(bytes(data), dtype=np.uint8)
    dict_arr, C = model_history(data, window, literal, False, dictionary)

    searcher = search_fn or match_tables
    tables = searcher(data, dict_arr, window, compute_probe=lazy_matching)
    values, nbits = commit_v1(data, tables, C, window, literal, lazy_matching)

    head = build_header(window, literal, dictionary is not None, False, False)
    all_values = np.concatenate([np.array([v for v, _ in head], np.uint32), values])
    all_nbits = np.concatenate([np.array([n for _, n in head], np.uint8), nbits])
    packed, _ = pack_bits_np(all_values, all_nbits)
    return packed
