"""Profile the encode pipelines (reference analogue: tools/profiler.py).

Usage: python tools/profiler.py [--engine native|tables|python] [--mb 4]
Prints a cProfile summary of one compress call over the doc corpus.
"""

import argparse
import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="tables",
                    choices=("native", "tables", "python"))
    ap.add_argument("--mb", type=int, default=4)
    args = ap.parse_args()

    from bench import build_corpus

    data = build_corpus(args.mb << 20)

    if args.engine == "native":
        from tamp_tpu import _native

        fn = lambda: _native.native_compress(data)  # noqa: E731
    elif args.engine == "tables":
        from tamp_tpu.engine.encode_extended import encode_extended

        fn = lambda: encode_extended(data)  # noqa: E731
    else:
        from tamp_tpu.compressor import compress

        fn = lambda: compress(data)  # noqa: E731

    prof = cProfile.Profile()
    prof.enable()
    fn()
    prof.disable()
    pstats.Stats(prof).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
