"""Dictionary-building toolchain.

Builds custom initialization dictionaries from a sample corpus, mirroring
the capabilities of the reference toolchain (BrianPugh/tamp
tamp/cli/build_dictionary.py: substring scoring with the real token cost
model, greedy overlap-filtered selection, value-ordered packing so the
rightmost bytes are the most valuable, trim-threshold sweep measuring real
compressed sizes, and knee analysis) — implemented Apriori-style on hashed
n-grams rather than as a port of its Cython kernels.

The cost model: replacing one occurrence of an ``L``-byte string with a
match token saves ``L*(1+literal) - match_cost(L)`` bits, where
``match_cost`` uses the format's huffman table (and the extended-match
encoding for long patterns).  A substring's score is (occurrences - 1)
times that (the first occurrence must pay to be present), and candidates
whose occurrences are covered by an already-selected superstring are
skipped.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

from .constants import (
    HUFFMAN_LENGTHS,
    compute_min_pattern_size,
)
from .dictionary import initialize_dictionary

__all__ = [
    "build_dictionary",
    "build_dictionary_from_path",
    "pack_dictionary",
    "score_substrings",
    "evaluate_dictionary_tradeoff",
    "find_best_trim_threshold",
    "find_knee",
]

_MAX_LEN = 64          # candidate substring length cap
_SAMPLE_CAP = 1 << 20  # corpus bytes examined for scoring


def _match_cost_bits(length: int, window: int, literal: int, extended: bool) -> int:
    """Bits to encode one match of ``length`` bytes (format token costs)."""
    minp = compute_min_pattern_size(window, literal)
    if length < minp:
        return length * (1 + literal)  # literals
    idx = length - minp
    if idx <= 13:
        return HUFFMAN_LENGTHS[idx] + window  # lengths include the flag bit
    if extended and idx <= 131:
        # extended match: EXT huffman (flag incl.) + secondary huffman
        # (no flag) + 3 trailing bits + window index.
        sym = min(max((length - minp - 12) >> 3, 0), 14)
        return HUFFMAN_LENGTHS[13] + (HUFFMAN_LENGTHS[sym] - 1) + 3 + window
    # longer strings are encoded as multiple tokens; approximate greedily
    best = HUFFMAN_LENGTHS[13] + window
    return best + _match_cost_bits(length - (minp + 13), window, literal, extended)


def _saved_bits(length: int, window: int, literal: int, extended: bool) -> int:
    return length * (1 + literal) - _match_cost_bits(length, window, literal, extended)


def score_substrings(
    samples: list[bytes],
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    min_saved_bits: int = 6,
    min_count: int = 2,
    max_len: int = _MAX_LEN,
) -> list[tuple[int, bytes]]:
    """(score, substring) candidates, best first.

    Apriori expansion: a length-L substring can only be frequent if its
    length-(L-1) prefix is (the pruning invariant the reference's Cython
    kernels exploit, _c_build_dictionary.pyx:69-180).
    """
    minp = compute_min_pattern_size(window, literal)
    budget = _SAMPLE_CAP // max(1, len(samples))
    samples = [s[: max(budget, 4096)] for s in samples if s]
    if not samples:
        return []

    frequent: dict[bytes, int] = {}
    counts = Counter()
    for s in samples:
        for i in range(len(s) - minp + 1):
            counts[bytes(s[i : i + minp])] += 1
    cur = {g: c for g, c in counts.items() if c >= min_count}
    frequent.update(cur)

    length = minp
    while cur and length < max_len:
        length += 1
        counts = Counter()
        prev = cur
        for s in samples:
            for i in range(len(s) - length + 1):
                g = bytes(s[i : i + length])
                if g[:-1] in prev:
                    counts[g] += 1
        cur = {g: c for g, c in counts.items() if c >= min_count}
        frequent.update(cur)

    scored = []
    for g, c in frequent.items():
        saved = _saved_bits(len(g), window, literal, extended)
        if saved < min_saved_bits:
            continue
        score = (c - 1) * saved
        if score > 0:
            scored.append((score, g))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored


def select_candidates(
    scored: list[tuple[int, bytes]], capacity: int
) -> list[tuple[int, bytes]]:
    """Greedy selection: skip entries already contained in a selection
    (their occurrences are covered), until ``capacity`` bytes are chosen."""
    chosen: list[tuple[int, bytes]] = []
    used = 0
    blob = b""
    for score, g in scored:
        if used + len(g) > capacity:
            continue
        if g in blob:
            continue
        chosen.append((score, g))
        blob += g
        used += len(g)
        if used >= capacity:
            break
    return chosen


def pack_dictionary(
    chosen: list[tuple[int, bytes]], size: int, *, literal: int = 8
) -> bytearray:
    """Pack selections right-to-left by score density onto the default
    initialized window, so the rightmost (newest, cheapest-offset) bytes
    are the most valuable (reference packing invariant,
    build_dictionary.py's evaluate_dictionary_tradeoff contract)."""
    out = initialize_dictionary(size, literal=literal)
    # Most valuable nearest the end: iterate descending density, placing
    # from the right edge inwards.
    pos = size
    for _score, g in sorted(
        chosen, key=lambda t: t[0] / max(1, len(t[1])), reverse=True
    ):
        if pos - len(g) < 0:
            continue
        pos -= len(g)
        out[pos : pos + len(g)] = g
    return out


def build_dictionary(
    samples: list[bytes],
    *,
    window: int = 10,
    size: int | None = None,
    literal: int = 8,
    extended: bool = True,
    min_saved_bits: int = 6,
    auto_trim: bool = False,
) -> bytearray:
    """Build a ``size``-byte dictionary from corpus ``samples``."""
    size = size or (1 << window)
    if size > (1 << window):
        raise ValueError("dictionary size cannot exceed the window size")
    if auto_trim:
        return find_best_trim_threshold(
            samples, window=window, size=size, literal=literal, extended=extended
        )[1]
    scored = score_substrings(
        samples, window=window, literal=literal, extended=extended,
        min_saved_bits=min_saved_bits,
    )
    chosen = select_candidates(scored, size)
    return pack_dictionary(chosen, size, literal=literal if extended else 8)


def evaluate_dictionary_tradeoff(
    samples: list[bytes], dictionary: bytes, *, window: int = 10, literal: int = 8
) -> int:
    """Total compressed corpus size (bytes) using ``dictionary``."""
    from . import _native

    if len(dictionary) != (1 << window):
        base = initialize_dictionary(1 << window, literal=literal)
        base[-len(dictionary):] = dictionary
        dictionary = bytes(base)
    total = 0
    if _native.available():
        for s in samples:
            total += len(_native.native_compress(
                s, window=window, literal=literal, dictionary=bytes(dictionary)
            ))
    else:
        from .compressor import compress

        for s in samples:
            total += len(compress(
                s, window=window, literal=literal, dictionary=bytes(dictionary)
            ))
    return total


def find_best_trim_threshold(
    samples: list[bytes],
    *,
    window: int = 10,
    size: int | None = None,
    literal: int = 8,
    extended: bool = True,
    thresholds: tuple = (6, 8, 10, 12, 14, 16),
) -> tuple[int, bytearray]:
    """Sweep min-saved-bits thresholds, measuring the real compressed corpus
    size for each dictionary (the reference's zstd-style sweep,
    build_dictionary.py:426-490); returns (best_threshold, dictionary)."""
    best = None
    for th in thresholds:
        d = build_dictionary(
            samples, window=window, size=size, literal=literal,
            extended=extended, min_saved_bits=th,
        )
        total = evaluate_dictionary_tradeoff(
            samples, bytes(d), window=window, literal=literal
        )
        if best is None or total < best[0]:
            best = (total, th, d)
    return best[1], best[2]


def find_knee(sizes: list[int], gains: list[int]) -> int:
    """Index of the marginal-return knee: the last point whose incremental
    gain per incremental byte stays above half the average rate
    (reference analogue: build_dictionary.py:545-610)."""
    if len(sizes) < 2:
        return max(0, len(sizes) - 1)
    total_rate = (gains[-1] - gains[0]) / max(1, sizes[-1] - sizes[0])
    knee = 0
    for i in range(1, len(sizes)):
        rate = (gains[i] - gains[i - 1]) / max(1, sizes[i] - sizes[i - 1])
        if rate >= total_rate / 2:
            knee = i
    return knee


def build_dictionary_from_path(
    corpus: Path,
    *,
    window: int = 10,
    size: int | None = None,
    delimiter: str | None = None,
    min_saved_bits: int = 6,
    auto_trim: bool = False,
) -> bytearray:
    """CLI helper: corpus directory (one sample per file) or delimited file."""
    corpus = Path(corpus)
    if corpus.is_dir():
        samples = [p.read_bytes() for p in sorted(corpus.iterdir()) if p.is_file()]
    elif delimiter is not None:
        samples = corpus.read_bytes().split(delimiter.encode())
    else:
        samples = [corpus.read_bytes()]
    samples = [s for s in samples if s]
    if not samples:
        raise SystemExit("corpus is empty")
    return build_dictionary(
        samples, window=window, size=size, min_saved_bits=min_saved_bits,
        auto_trim=auto_trim,
    )
