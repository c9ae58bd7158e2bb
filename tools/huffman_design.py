"""Huffman design tool: rebuild the match-size code from measured stats.

Reference analogue: tools/huffman.py + tools/analysis.py of BrianPugh/tamp —
the design tools that produced the format's static Huffman table
(tamp/compressor.py:25-27).  This tool measures the wire symbol frequencies
on a corpus (via the streaming compressor's debug callbacks), builds an
optimal prefix code for them, and reports the expected token cost under
(a) the freshly built code and (b) the shipped format table — i.e. how close
the frozen table is to optimal for *your* data.  It also sanity-checks the
shipped table (prefix-free, Kraft-complete).

The wire table is frozen by the spec; this is a design/analysis tool, not a
configuration knob.

Usage: python tools/huffman_design.py FILE [--window 10] [--no-extended]
"""

from __future__ import annotations

import argparse
import heapq
import io
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tamp_tpu.constants import (  # noqa: E402
    FLUSH_SYMBOL,
    HUFFMAN_CODES,
    HUFFMAN_LENGTHS,
    NUM_SYMBOLS,
    RLE_SYMBOL,
    EXTENDED_MATCH_SYMBOL,
    compute_min_pattern_size,
)


def build_huffman(freqs: dict[int, float]) -> dict[int, str]:
    """Canonical bottom-up Huffman over symbol -> frequency."""
    heap: list[tuple[float, int, object]] = []
    uid = 0
    for sym, f in freqs.items():
        heap.append((f, uid, sym))
        uid += 1
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, _, a = heapq.heappop(heap)
        fb, _, b = heapq.heappop(heap)
        heapq.heappush(heap, (fa + fb, uid, (a, b)))
        uid += 1
    codes: dict[int, str] = {}

    def walk(node, prefix):
        if isinstance(node, tuple):
            walk(node[0], prefix + "0")
            walk(node[1], prefix + "1")
        else:
            codes[node] = prefix or "0"

    walk(heap[0][2], "")
    return codes


def check_shipped_table() -> None:
    """The shipped table must be a complete prefix code (Kraft sum == 1)."""
    codes = []
    for s in range(NUM_SYMBOLS):
        nb = HUFFMAN_LENGTHS[s] - 1  # lengths include the 1-bit token flag
        codes.append(format(HUFFMAN_CODES[s], f"0{nb}b"))
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j and b.startswith(a):
                raise AssertionError(f"prefix violation: {a} < {b}")
    kraft = sum(2.0 ** -len(c) for c in codes)
    assert abs(kraft - 1.0) < 1e-12, kraft
    print(f"shipped table: prefix-free, Kraft sum = {kraft}")


def measure(data: bytes, window: int, extended: bool) -> Counter:
    from tamp_tpu.compressor import Compressor

    counts: Counter = Counter()
    minp = compute_min_pattern_size(window, 8)
    c = Compressor(io.BytesIO(), window=window, extended=extended)
    c.match_cb = lambda pos, idx, sz, m: counts.update([sz - minp])
    c.rle_cb = lambda n, byte: counts.update([RLE_SYMBOL])
    c.extended_match_cb = lambda pos, idx, sz, m: counts.update(
        [EXTENDED_MATCH_SYMBOL])
    c.flush_cb = lambda: counts.update([FLUSH_SYMBOL])
    c.write(data)
    c.flush(write_token=True)
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--no-extended", dest="extended", action="store_false")
    ap.add_argument("--limit", type=int, default=1 << 20)
    args = ap.parse_args()

    check_shipped_table()

    with open(args.file, "rb") as f:
        data = f.read(args.limit)
    counts = measure(data, args.window, args.extended)
    total = sum(counts.values())
    if not total:
        print("no tokens emitted (all literals?)")
        return

    freqs = {s: counts.get(s, 0.5) / total for s in range(NUM_SYMBOLS)}
    built = build_huffman(freqs)

    shipped_bits = sum(
        counts[s] * (HUFFMAN_LENGTHS[s] - 1) for s in counts)
    built_bits = sum(counts[s] * len(built[s]) for s in counts)
    print(f"{'sym':>4} {'count':>9} {'shipped':>8} {'rebuilt':>8}")
    for s in range(NUM_SYMBOLS):
        name = {RLE_SYMBOL: "RLE", EXTENDED_MATCH_SYMBOL: "EXT",
                FLUSH_SYMBOL: "FLUSH"}.get(s, str(s))
        print(f"{name:>4} {counts.get(s, 0):>9} "
              f"{HUFFMAN_LENGTHS[s]-1:>8} {len(built[s]):>8}")
    print(f"expected bits/token: shipped {shipped_bits/total:.3f}, "
          f"rebuilt-optimal {built_bits/total:.3f} "
          f"({(shipped_bits-built_bits)/max(shipped_bits,1)*100:.2f}% headroom)")


if __name__ == "__main__":
    main()
