"""NumPy parallel match search (the oracle for the JAX/Pallas kernels).

For every input position ``t`` this computes the reference search result
(longest match, lowest ring index) against the v1 window model: the ring at
time ``t`` holds the last ``W`` bytes of ``C = dictionary || data``, laid out
as

    ring[x] = C[W + t - tau + x]  for x in [0, tau)      (the newest bytes)
    ring[x] = C[t - tau + x]      for x in [tau, W)      (the older bytes)

with ``tau = t mod W``.  A linear-buffer match starting at ring index ``x``
maps to a *contiguous* run in ``C`` at column ``j`` (source ``C[t+j]``, ring
index ``x = (tau + j) mod W``), except where it crosses the write head — the
"wrap-glued" candidates, where the newest bytes are followed by the oldest;
those are patched in from small per-shift tail diagonals.  Equality
diagonals are shared across positions, so the whole search is a handful of
shifted-AND passes over one equality matrix — the broadcast-compare-all-
offsets idea of the reference's ESP32-S3 SIMD search
(espidf/tamp/private/tamp_search.hpp:898-1000), scaled to full-window
vectors.

Two result families are produced:

- the *main* table: target ``data[t:]`` vs ring_t, at caps 15 and 16 (the
  reference search cap is ``min(len(look_ahead), max_pattern)``);
- the *probe* table (lazy matching): target ``data[t+1:]`` vs ring_t — the
  ring *before* the literal at ``t`` is written.  Its candidates coincide
  with the main candidates of ``t+1`` shifted one column left, except at the
  write-head slot, which still holds the t-th oldest byte rather than the
  just-written literal.
"""

from __future__ import annotations

import numpy as np

__all__ = ["match_tables", "match_tables_ext", "MatchTables"]

LMAX = 16  # longest match observable by the reference's 16-byte look-ahead


class MatchTables:
    """Per-position search results.

    ``len15/idx15`` and ``len16/idx16``: main search capped at 15 / 16.
    ``probe_len/probe_idx`` (optional): the lazy probe search (cap 15).
    Index arrays hold the ring index of the lowest-index occurrence.
    """

    __slots__ = ("len15", "idx15", "len16", "idx16", "probe_len", "probe_idx")

    def __init__(self, len15, idx15, len16, idx16, probe_len=None, probe_idx=None):
        self.len15, self.idx15 = len15, idx15
        self.len16, self.idx16 = len16, idx16
        self.probe_len, self.probe_idx = probe_len, probe_idx


def _runs_1d(bits: np.ndarray, cap: int) -> np.ndarray:
    """Run length of consecutive ones starting at each index, capped."""
    n = bits.shape[0]
    run = bits.copy()
    length = run.astype(np.int32)
    for k in range(1, cap):
        nxt = np.zeros(n, dtype=bits.dtype)
        if k < n:
            nxt[: n - k] = bits[k:]
        run = run & nxt
        length += run
    return length


def _runs_1d_log(bits: np.ndarray, cap: int) -> np.ndarray:
    """_runs_1d via log-doubling (O(log cap) passes), capped at ``cap``."""
    n = bits.shape[0]
    L = bits.astype(np.int32)
    k = 1
    while k < cap:
        nxt = np.zeros(n, np.int32)
        if k < n:
            nxt[: n - k] = L[k:]
        L = L + np.where(L == k, nxt, 0)
        k *= 2
    return np.minimum(L, cap)


def match_tables_ext(
    data: np.ndarray,
    dictionary: np.ndarray,
    window_bits: int,
    maxpat: int,
    chunk_rows: int | None = None,
):
    """Max-length match table for the extended format (oracle).

    Per position ``t``: the longest linear-buffer match of ``data[t:]``
    against the v1 ring model, capped at ``maxpat`` (= min_pattern + 131),
    with the lowest ring index among the maximal-length matches — the
    result of the planned-mode committer's one-shot extended search
    (_native/tampnative.cpp emit_ext_planned entry).  Returns
    ``(len_ext int32 (N,), idx_ext int32 (N,))``.

    Same candidate geometry as :func:`match_tables` with the look-ahead
    widened from 16 to ``maxpat`` (log-doubled runs, glue diagonals
    delta = 1..maxpat-1).
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dictionary = np.ascontiguousarray(dictionary, dtype=np.uint8)
    W = 1 << window_bits
    if dictionary.shape[0] != W:
        raise ValueError("dictionary size must equal window size")
    N = data.shape[0]
    LEXT = int(maxpat)
    len_e = np.zeros(N, np.int32)
    idx_e = np.zeros(N, np.int32)
    if N == 0:
        return len_e, idx_e

    C = np.concatenate([dictionary, data, np.zeros(LEXT + 1, dtype=np.uint8)])
    from numpy.lib.stride_tricks import sliding_window_view

    slid = sliding_window_view(C, W)
    cols = np.arange(W, dtype=np.int32)
    n_glue = min(LEXT, W) - 1
    if chunk_rows is None:
        chunk_rows = max(128, (1 << 22) // W)

    for t0 in range(0, N, chunk_rows):
        T = min(chunk_rows, N - t0)
        R = T + LEXT
        rows = min(R, N - t0)
        eq = np.zeros((R, W), dtype=np.uint8)
        eq[:rows] = slid[t0 : t0 + rows] == data[t0 : t0 + rows, None]

        # log-doubled run lengths down each column, capped at LEXT
        L = eq.astype(np.int32)
        k = 1
        while k < LEXT:
            nxt = np.zeros_like(L)
            nxt[: R - k] = L[k:]
            L = L + np.where(L == k, nxt, 0)
            k *= 2
        length = np.minimum(L[:T], LEXT)

        gd = {}
        for d in range(1, n_glue + 1):
            seg = data[t0 + d : t0 + d + T]
            bits = np.zeros(T, dtype=np.uint8)
            bits[: seg.shape[0]] = seg == C[t0 : t0 + seg.shape[0]]
            gd[d] = _runs_1d_log(bits, LEXT)

        tau = ((t0 + np.arange(T, dtype=np.int64)) % W).astype(np.int32)
        x = (tau[:, None] + cols[None, :]) % W
        cap = W - x
        r_idx = np.arange(T)

        usable = length.copy()
        for delta in range(1, n_glue + 1):
            j = W - delta
            glue = (tau >= delta) & (usable[:, j] >= delta)
            if glue.any():
                total = delta + np.minimum(gd[delta], LEXT - delta)
                usable[:, j] = np.where(glue, total, usable[:, j])
        u = np.minimum(usable, cap)
        score = u * W + (cap - 1)
        j_best = np.argmax(score, axis=1)
        len_e[t0 : t0 + T] = u[r_idx, j_best]
        idx_e[t0 : t0 + T] = x[r_idx, j_best]

    return len_e, idx_e


def match_tables(
    data: np.ndarray,
    dictionary: np.ndarray,
    window_bits: int,
    chunk_rows: int = 4096,
    compute_probe: bool = False,
) -> MatchTables:
    """Compute best-match tables for every position of ``data``."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dictionary = np.ascontiguousarray(dictionary, dtype=np.uint8)
    W = 1 << window_bits
    if dictionary.shape[0] != W:
        raise ValueError("dictionary size must equal window size")
    N = data.shape[0]

    len15 = np.zeros(N, dtype=np.uint8)
    idx15 = np.zeros(N, dtype=np.int32)
    len16 = np.zeros(N, dtype=np.uint8)
    idx16 = np.zeros(N, dtype=np.int32)
    probe_len = np.zeros(N, dtype=np.uint8) if compute_probe else None
    probe_idx = np.zeros(N, dtype=np.int32) if compute_probe else None
    if N == 0:
        return MatchTables(len15, idx15, len16, idx16, probe_len, probe_idx)

    # C = dict || data, padded so sliding windows near the end are in-bounds.
    C = np.concatenate([dictionary, data, np.zeros(LMAX + 1, dtype=np.uint8)])
    from numpy.lib.stride_tricks import sliding_window_view

    slid = sliding_window_view(C, W)  # slid[p, j] = C[p + j]

    cols = np.arange(W, dtype=np.int32)
    n_glue = min(LMAX, W) - 1  # glue shifts delta = 1..15

    for t0 in range(0, N, chunk_rows):
        T = min(chunk_rows, N - t0)
        R = T + LMAX  # length rows 0..T, each looks LMAX-1 ahead
        # eq[r, j] = (data[t0+r] == C[t0+r+j]); rows past the data end are 0.
        rows = min(R, N - t0)
        eq = np.zeros((R, W), dtype=np.uint8)
        eq[:rows] = slid[t0 : t0 + rows] == data[t0 : t0 + rows, None]

        # Contiguous-run lengths down each column, rows 0..T, capped at LMAX.
        nrows = T + 1
        run = eq[:nrows].copy()
        length = run.astype(np.int32)
        for k in range(1, LMAX):
            run &= eq[k : k + nrows]
            length += run

        # Tail diagonals for wrap-glued candidates:
        # gd[d][r] = run length of (data[t0+r+d+k] == C[t0+r+k]), capped LMAX.
        gd = {}
        for d in range(1, n_glue + 2):  # main needs 1..15, probe needs 2..16
            seg = data[t0 + d : t0 + d + nrows]
            bits = np.zeros(nrows, dtype=np.uint8)
            bits[: seg.shape[0]] = seg == C[t0 : t0 + seg.shape[0]]
            gd[d] = _runs_1d(bits, LMAX)

        tau = ((t0 + np.arange(T, dtype=np.int64)) % W).astype(np.int32)
        x = (tau[:, None] + cols[None, :]) % W  # ring slot of each candidate
        cap = W - x  # linear-buffer limit: match cannot run past the ring end
        r_idx = np.arange(T)

        # ---- main table: target data[t:], ring_t --------------------------
        usable = length[:T].copy()
        for delta in range(1, n_glue + 1):
            j = W - delta
            glue = (tau >= delta) & (usable[:, j] >= delta)
            if glue.any():
                total = delta + np.minimum(gd[delta][:T], LMAX - delta)
                usable[:, j] = np.where(glue, total, usable[:, j])
        usable = np.minimum(usable, cap)

        for capval, lenout, idxout in ((15, len15, idx15), (16, len16, idx16)):
            u = np.minimum(usable, capval)
            score = u * W + (cap - 1)  # max length, then min ring slot
            j_best = np.argmax(score, axis=1)
            lenout[t0 : t0 + T] = u[r_idx, j_best].astype(np.uint8)
            idxout[t0 : t0 + T] = x[r_idx, j_best]

        # ---- probe table: target data[t+1:], ring_t (lazy matching) -------
        if compute_probe:
            pu = np.zeros((T, W), dtype=np.int32)
            pu[:, 1:] = length[1 : T + 1, : W - 1]  # source C[t+j], run from t+1
            for delta in range(1, n_glue + 1):
                j = W - delta
                glue = (tau >= delta) & (pu[:, j] >= delta)
                if glue.any():
                    total = delta + np.minimum(gd[delta + 1][:T], LMAX - delta)
                    pu[:, j] = np.where(glue, total, pu[:, j])
            # j = 0: source C[t] at the write-head slot tau (cap W - tau).
            pu[:, 0] = gd[1][:T]
            pu = np.minimum(np.minimum(pu, cap), 15)
            pscore = pu * W + (cap - 1)
            j_best = np.argmax(pscore, axis=1)
            probe_len[t0 : t0 + T] = pu[r_idx, j_best].astype(np.uint8)
            probe_idx[t0 : t0 + T] = x[r_idx, j_best]

    return MatchTables(len15, idx15, len16, idx16, probe_len, probe_idx)
