"""Run planning for the extended-format engine.

Long byte runs (>= MIN_PLANNED_RUN) always end up RLE-encoded, and RLE
writes at most 8 bytes into the window — the one unavoidable source of
window divergence from the pure input history.  By *planning* those runs
from the input alone (both the parallel search phase and the sequential
committer follow the same fixed layout), the truncations become part of the
model history ``C-hat`` and the match tables stay exact.

Plan layout per maximal run ``[s, e)`` of length >= 9:

- tokens may not cross position ``s + 1`` (so the byte at ``s`` is emitted
  by ordinary tokenization and becomes the ring's "last byte");
- ``[s+1, e)`` is covered by RLE tokens in fixed chunks (<= 241, never
  leaving a trailing single byte); each chunk writes its first
  ``min(8, chunk)`` bytes to the window, the rest are deleted from the
  model history.

When ``window_bits`` is given to :func:`build_model_history`, chunk writes
are additionally truncated at the ring end (``W - pos`` at the chunk's
model position), mirroring the decoder's no-wrap RLE write semantics
(docs/specification.md).  Together with the committer's planned-mode
ring-end policies (RLE split, extended-match split/shorten —
_native/tampnative.cpp), this makes the model history *exact*: the true
ring never diverges from C-hat, which is what lets the device planner
(ops/plan_ext.py) precompute every walk decision from the tables alone.
Chunk keeps then depend on the ring position at the chunk start, which
depends on earlier keeps — resolved left-to-right over the (few) regions.
"""

from __future__ import annotations

import numpy as np

MIN_PLANNED_RUN = 9
RLE_MAX = 241
RLE_MAX_WIN = 8

__all__ = ["plan_runs", "build_model_history", "MIN_PLANNED_RUN"]


def plan_runs(data: np.ndarray) -> np.ndarray:
    """(n_plans, 2) int64 array of (rle_start, end) pairs for runs >= 9.

    The forced-RLE region starts one byte into the run (the byte at ``s`` is
    emitted by ordinary tokenization and becomes the ring's last byte, which
    the RLE tokens implicitly repeat).
    """
    n = data.shape[0]
    if n < MIN_PLANNED_RUN:
        return np.zeros((0, 2), dtype=np.int64)
    change = np.nonzero(np.diff(data))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    sel = (ends - starts) >= MIN_PLANNED_RUN
    s, e = starts[sel], ends[sel]
    return np.stack([s + 1, e], axis=1).astype(np.int64)


def _chunk_keep_mask(length: int, pos: int = -1, W: int = 0) -> np.ndarray:
    """Keep-mask for one RLE region of ``length`` bytes under the chunk rule.

    ``pos``/``W``: ring position at the region's model start; when given,
    each chunk's window write is truncated at the ring end (never wraps),
    so the kept count is ``min(8, chunk, W - pos_at_chunk)``.
    """
    keep = np.zeros(length, dtype=bool)
    t = 0
    while t < length:
        c = min(RLE_MAX, length - t)
        if length - t - c == 1:
            c -= 1
        k = min(RLE_MAX_WIN, c)
        if pos >= 0:
            k = min(k, W - pos)
            pos = (pos + k) % W
        keep[t : t + k] = True
        t += c
    return keep


def build_model_history(data: np.ndarray, plans: np.ndarray,
                        window_bits: int | None = None):
    """(keep_mask, khat, data_hat) for the planned model history.

    ``khat[t]`` = number of model-written bytes among input positions < t,
    with one extra trailing entry (``khat[N]``); ``data_hat`` = the written
    byte stream the window model sees (``C-hat`` minus the dictionary).

    With ``window_bits`` the keeps are ring-end aware (exact model — see
    module docstring); without it, the legacy keep rule (the committer
    then tracks truncations as dynamic deletions).
    """
    n = data.shape[0]
    keep = np.ones(n, dtype=bool)
    if window_bits is None:
        for s, e in plans:
            keep[s:e] = _chunk_keep_mask(e - s)
    else:
        W = 1 << window_bits
        kept_before = 0  # kept count over [0, prev region end)
        prev_end = 0
        for s, e in plans:
            kept_before += int(s - prev_end)  # inter-region bytes: all kept
            pos = kept_before % W  # model position of the region start
            m = _chunk_keep_mask(e - s, pos, W)
            keep[s:e] = m
            kept_before += int(m.sum())
            prev_end = e
    khat = np.zeros(n + 1, dtype=np.uint32)
    khat[1:] = np.cumsum(keep, dtype=np.uint32)
    return keep, khat, data[keep]
