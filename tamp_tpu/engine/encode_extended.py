"""Extended-format (v2) one-shot encode pipeline.

Pipeline: run planning (host) -> parallel match search over the planned
model history C-hat (TPU/NumPy) -> native greedy commit following the same
plan.  The tables stay exact because all RLE window truncations are part of
the model; residual dynamic divergences (ring-end shortfalls) are validated
per candidate by the native committer.  Extended matches are split at the
ring end (`avoid_divergence`) so their window writes never truncate.

Output is a valid extended Tamp stream with compression within noise of the
reference encoder at equal settings (byte parity in extended mode holds only
for inputs without planned runs or ring-end splits; the streaming
tamp_tpu.Compressor remains fully reference-parity for all modes).
"""

from __future__ import annotations

import numpy as np

from ..dictionary import dictionary_array
from .plan import build_model_history, plan_runs
from .search_np import match_tables

__all__ = ["encode_extended"]


def encode_extended(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    lazy_matching: bool = False,
    dictionary=None,
    search_fn=None,
    avoid_divergence: bool | None = None,
) -> bytes:
    """Encode a complete extended-format Tamp stream via the engine.

    ``avoid_divergence`` trades ring-end extended-match splits against
    table-invalidation fallbacks; which wins is data-dependent.  The
    default (None) commits **both** ways and keeps the smaller stream —
    the sequential commit is cheap next to the table search, and both
    outputs are exact round-trips.
    """
    from .. import _native

    if not _native.available():  # graceful fallback: exact streaming encoder
        from ..compressor import compress

        return compress(
            bytes(data), window=window, literal=literal,
            dictionary=dictionary, lazy_matching=lazy_matching, extended=True,
        )

    data = np.frombuffer(bytes(data), dtype=np.uint8)
    W = 1 << window
    if dictionary is not None:
        dict_arr = np.frombuffer(bytes(dictionary), dtype=np.uint8)
        if dict_arr.shape[0] != W:
            raise ValueError("Dictionary-window size mismatch.")
    else:
        dict_arr = dictionary_array(W, literal=literal)

    plans = plan_runs(data)
    keep, khat, data_hat = build_model_history(data, plans, window)

    searcher = search_fn or match_tables
    tables = searcher(data_hat, dict_arr, window, compute_probe=lazy_matching)

    # Gather table rows (indexed by model positions) back to input positions.
    # khat[t] = model row of input position t (deleted positions point past
    # their region and are never used by the committer; clamp for safety).
    rows = np.minimum(khat[:-1], max(0, data_hat.shape[0] - 1))
    gathered = type(tables)(
        tables.len16[rows], tables.idx16[rows],
        tables.len16[rows], tables.idx16[rows],
        tables.probe_len[rows] if lazy_matching else None,
        tables.probe_idx[rows] if lazy_matching else None,
    )
    # note: extended max_pattern >= 16, so the full cap is 16 (len16/idx16);
    # len15 fields above are placeholders for the container shape.

    def commit(avoid: bool) -> bytes:
        return _native.native_compress(
            data.tobytes(),
            window=window, literal=literal, extended=True,
            lazy_matching=lazy_matching,
            dictionary=None if dictionary is None else bytes(dictionary),
            tables=gathered,
            avoid_divergence=avoid,
            khat=khat,
            plan=plans,
        )

    if avoid_divergence is not None:
        return commit(avoid_divergence)
    return min(commit(True), commit(False), key=len)
