"""Benchmark sweep across engines, windows, and corpora.

Reference analogues: tools/performance-benchmark.sh + Makefile benchmark
targets.  Prints a table of encode/decode MB/s and compression ratios.

Usage: python tools/benchmark.py [FILE ...]
With no files, uses the deterministic documentation corpus from bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    return out, time.perf_counter() - t0


def main() -> None:
    from bench import build_corpus
    from tamp_tpu import _native
    from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded

    files = sys.argv[1:]
    if files:
        corpora = [(os.path.basename(f), open(f, "rb").read()) for f in files]
    else:
        corpora = [("docs-16MB", build_corpus(16 << 20))]

    print(f"{'corpus':<12} {'engine':<10} {'w':>2} {'enc MB/s':>9} "
          f"{'dec MB/s':>9} {'ratio':>6}")
    for name, data in corpora:
        for w in (8, 10, 12):
            blob, dt = timed(
                _native.native_compress, data, window=w, literal=8, extended=True
            )
            out, ddt = timed(_native.native_decompress, blob)
            assert bytes(out) == data
            print(f"{name:<12} {'native':<10} {w:>2} {len(data)/dt/1e6:>9.1f} "
                  f"{len(data)/ddt/1e6:>9.1f} {len(blob)/len(data):>6.3f}")
        blob, dt = timed(
            compress_sharded, data, engine="native", workers=os.cpu_count()
        )
        out, ddt = timed(decompress_sharded, blob)
        assert bytes(out) == data
        print(f"{name:<12} {'native-mt':<10} 10 {len(data)/dt/1e6:>9.1f} "
              f"{len(data)/ddt/1e6:>9.1f} {len(blob)/len(data):>6.3f}")


if __name__ == "__main__":
    main()
