"""Dictionary-seed search: sweep XorShift32 seeds for the initial window.

Reference analogue: tools/find_seed.py of BrianPugh/tamp — the search that
produced the format's frozen seed 3758097560 (reference common.c:38).  For
each candidate seed, dictionaries are generated for the requested window
sizes and random corpus slices are compressed with them (custom-dictionary
mode, native engine); seeds are ranked by total compressed size.

The wire seed is frozen by the spec; this exists to reproduce/extend the
design search (e.g. for domain-specific custom dictionaries seeded
differently).

Usage: python tools/seed_search.py FILE [--seeds 64] [--slices 24]
       [--slice-size 2048] [--windows 8,10,12] [--jobs 4]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tamp_tpu import _native  # noqa: E402
from tamp_tpu.constants import DICTIONARY_SEED  # noqa: E402
from tamp_tpu.dictionary import dictionary_array  # noqa: E402


def evaluate_seed(seed: int, slices_by_window: dict[int, list[bytes]]) -> int:
    """Total compressed size of all slices under this seed's dictionaries."""
    total = 0
    for window, slices in slices_by_window.items():
        dictionary = dictionary_array(1 << window, seed=seed).tobytes()
        for chunk in slices:
            total += len(
                _native.native_compress(chunk, window=window,
                                        dictionary=dictionary))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--seeds", type=int, default=64,
                    help="number of random candidate seeds")
    ap.add_argument("--slices", type=int, default=24)
    ap.add_argument("--slice-size", type=int, default=2048)
    ap.add_argument("--windows", default="8,10,12")
    ap.add_argument("--jobs", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--rng-seed", type=int, default=0)
    args = ap.parse_args()

    if not _native.available():
        raise SystemExit(f"native engine unavailable: {_native.load_error()}")

    with open(args.file, "rb") as f:
        data = f.read()
    if len(data) < args.slice_size + 1:
        raise SystemExit("corpus smaller than one slice")

    rng = random.Random(args.rng_seed)
    windows = [int(w) for w in args.windows.split(",")]
    slices_by_window = {
        w: [
            data[s : s + args.slice_size]
            for s in (rng.randrange(len(data) - args.slice_size)
                      for _ in range(args.slices))
        ]
        for w in windows
    }

    candidates = [DICTIONARY_SEED] + [
        rng.randrange(1, 2**32) for _ in range(args.seeds)
    ]
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        sizes = list(pool.map(
            lambda s: evaluate_seed(s, slices_by_window), candidates))

    ranked = sorted(zip(sizes, candidates))
    baseline = sizes[0]
    print(f"{'seed':>12} {'total bytes':>12} {'vs shipped':>10}")
    for size, seed in ranked[:10]:
        tag = " (shipped)" if seed == DICTIONARY_SEED else ""
        print(f"{seed:>12} {size:>12} {100*(size-baseline)/baseline:>+9.3f}%{tag}")
    rank = [s for _, s in ranked].index(DICTIONARY_SEED) + 1
    print(f"shipped seed {DICTIONARY_SEED} ranks {rank}/{len(candidates)}")


if __name__ == "__main__":
    main()
