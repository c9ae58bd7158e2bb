"""Per-token statistics via the streaming compressor's debug callbacks.

Reference analogues: tools/collect-data.py + tools/analysis.py (the design
tools behind the format's huffman table).  Prints token-type counts and a
match-length histogram for the given file.

Usage: python tools/token_stats.py FILE [--window 10] [--extended]
"""

import argparse
import io
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--no-extended", dest="extended", action="store_false")
    ap.add_argument("--limit", type=int, default=1 << 20)
    args = ap.parse_args()

    from tamp_tpu.compressor import Compressor

    data = open(args.file, "rb").read()[: args.limit]
    counts = Counter()
    match_hist = Counter()
    rle_hist = Counter()

    comp = Compressor(io.BytesIO(), window=args.window, extended=args.extended)
    comp.match_cb = lambda pos, idx, size, pat: (
        counts.update(["match"]), match_hist.update([size]))
    comp.extended_match_cb = lambda pos, idx, size, pat: (
        counts.update(["ext_match"]), match_hist.update([size]))
    comp.literal_cb = lambda b: counts.update(["literal"])
    comp.rle_cb = lambda count, b: (counts.update(["rle"]),
                                    rle_hist.update([count]))
    comp.write(data)
    comp.flush()

    total = sum(counts.values())
    print(f"{args.file}: {len(data)} bytes, {total} tokens")
    for kind, c in counts.most_common():
        print(f"  {kind:<10} {c:>8}  ({100*c/total:.1f}%)")
    if match_hist:
        print("match length histogram:")
        for size in sorted(match_hist):
            print(f"  {size:>3}: {match_hist[size]}")
    if rle_hist:
        print(f"rle: {sum(rle_hist.values())} tokens, "
              f"mean run {sum(k*v for k, v in rle_hist.items())/sum(rle_hist.values()):.1f}")


if __name__ == "__main__":
    main()
