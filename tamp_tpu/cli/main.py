"""``tamp-tpu`` command-line interface.

Mirrors the reference CLI surface (BrianPugh/tamp tamp/cli/main.py:
``compress`` / ``decompress`` / ``build-dictionary``, stdin/stdout
defaults, undersized-dictionary expansion) with tamp-tpu implementation
choices:

- ``native``  — the C++ engine (fastest single stream)
- ``engine``  — vectorized search + native commit (device-accelerated)
- ``python``  — the pure-Python streaming codec (the executable spec)
- default     — auto-detect (native when available, else python)

plus a ``--sharded`` flag on compress/decompress for the TTPU container
(data-parallel independent streams; see tamp_tpu.parallel.shard).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _read(input_: Path | None) -> bytes:
    data = sys.stdin.buffer.read() if input_ is None else input_.read_bytes()
    if not data:
        raise SystemExit("No data provided.")
    return data


def _write(output: Path | None, data: bytes) -> None:
    if output is None:
        sys.stdout.buffer.write(data)
        sys.stdout.buffer.flush()
    else:
        output.write_bytes(bytes(data))


def load_dictionary(path: Path, window: int, literal: int, extended: bool) -> bytearray:
    """Load a dictionary file, expanding undersized files onto the default
    initialized window (reference semantics: main.py:90-105)."""
    import tamp_tpu

    raw = path.read_bytes()
    window_size = 1 << window
    if len(raw) == window_size:
        return bytearray(raw)
    if len(raw) > window_size:
        raise SystemExit(
            f"Dictionary file ({len(raw)} bytes) is larger than window size "
            f"({window_size} bytes)."
        )
    dictionary = tamp_tpu.initialize_dictionary(
        window_size, literal=literal if extended else 8
    )
    dictionary[-len(raw):] = raw
    return dictionary


def get_compress_implementation(impl_name: str | None):
    import tamp_tpu

    if impl_name is None:
        from tamp_tpu import _native

        impl_name = "native" if _native.available() else "python"
    impl_name = impl_name.lower()
    if impl_name == "native":
        from tamp_tpu import _native

        def compress_native(data, **kw):
            return _native.native_compress(data, **kw)

        return compress_native
    if impl_name == "engine":
        from tamp_tpu.engine.encode import encode_v1
        from tamp_tpu.engine.encode_extended import encode_extended

        def compress_engine(data, *, extended=True, **kw):
            if extended:
                return encode_extended(data, **kw)
            return encode_v1(data, **kw)

        return compress_engine
    if impl_name == "python":
        return tamp_tpu.compress
    raise SystemExit(
        f"Unknown implementation: {impl_name}. "
        "Valid options are 'native', 'engine' or 'python'."
    )


def get_decompress_implementation(impl_name: str | None):
    import tamp_tpu

    if impl_name is None:
        from tamp_tpu import _native

        impl_name = "native" if _native.available() else "python"
    impl_name = impl_name.lower()
    if impl_name == "native":
        from tamp_tpu import _native

        def decompress_native(data, **kw):
            return bytes(_native.native_decompress(data, **kw))

        return decompress_native
    if impl_name == "python":
        return lambda data, **kw: bytes(tamp_tpu.decompress(data, **kw))
    raise SystemExit(
        f"Unknown implementation: {impl_name}. "
        "Valid options are 'native' or 'python'."
    )


def _add_io_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("input", nargs="?", type=Path, default=None,
                   help="input file (default: stdin)")
    p.add_argument("--input", "-i", dest="input_opt", type=Path, default=None)
    p.add_argument("--output", "-o", type=Path, default=None,
                   help="output file (default: stdout)")


def _window(v: str) -> int:
    w = int(v)
    if not 8 <= w <= 15:
        raise argparse.ArgumentTypeError("window must be in [8, 15]")
    return w


def _literal(v: str) -> int:
    x = int(v)
    if not 5 <= x <= 8:
        raise argparse.ArgumentTypeError("literal must be in [5, 8]")
    return x


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tamp-tpu", description="Compress/Decompress data in Tamp format."
    )
    sub = ap.add_subparsers(dest="command", required=True)

    c = sub.add_parser("compress", help="Compress an input file or stream.")
    _add_io_args(c)
    c.add_argument("--window", "-w", type=_window, default=10)
    c.add_argument("--literal", "-l", type=_literal, default=8)
    c.add_argument("--dictionary", "-d", type=Path, default=None)
    c.add_argument("--lazy-matching", action="store_true")
    c.add_argument("--no-extended", dest="extended", action="store_false")
    c.add_argument("--implementation", choices=("native", "engine", "python"),
                   default=None)
    c.add_argument("--sharded", action="store_true",
                   help="emit a TTPU container of independent streams")
    c.add_argument("--shard-size", type=int, default=1 << 20)
    c.add_argument("--optimal", action="store_true",
                   help="minimum-bit parse (smaller than the reference "
                        "encoder's output, still spec-conforming; combine "
                        "with --no-extended for the v1 format)")

    d = sub.add_parser("decompress", help="Decompress an input file or stream.")
    _add_io_args(d)
    d.add_argument("--dictionary", "-d", type=Path, default=None)
    d.add_argument("--window", "-w", type=_window, default=10)
    d.add_argument("--literal", "-l", type=_literal, default=8)
    d.add_argument("--no-extended", dest="extended", action="store_false")
    d.add_argument("--implementation", choices=("native", "python"), default=None)

    b = sub.add_parser("build-dictionary",
                       help="Build a shared dictionary from a corpus.")
    b.add_argument("corpus", type=Path,
                   help="directory of sample files, or a single delimited file")
    b.add_argument("--output", "-o", type=Path, required=True)
    b.add_argument("--window", "-w", type=_window, default=10)
    b.add_argument("--size", type=int, default=None,
                   help="dictionary size in bytes (default: 1 << window)")
    b.add_argument("--delimiter", type=str, default=None,
                   help="treat corpus as one file split on this delimiter")
    b.add_argument("--trim-threshold", "--min-saved-bits", type=int, default=8,
                   dest="trim_threshold",
                   help="minimum length for common-substring extraction")
    b.add_argument("--target-fill", type=float, default=1.0,
                   help="max fraction of the window filled with corpus content")
    b.add_argument("--auto-trim", action="store_true",
                   help="sweep trim thresholds for the best compressed size")
    b.add_argument("--auto-size", action="store_true",
                   help="sweep fill levels and pick the marginal-return knee")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "compress":
        inp = args.input_opt or args.input
        if (args.sharded and not getattr(args, "optimal", False)
                and inp is not None and args.output is not None):
            # file-to-file container path: bounded memory (shard-streamed),
            # byte-identical to the in-memory container
            from tamp_tpu.parallel.shard import compress_file_sharded

            dict_b = None
            if args.dictionary is not None:
                dict_b = bytes(load_dictionary(
                    args.dictionary, args.window, args.literal, args.extended))
            compress_file_sharded(
                inp, args.output, window=args.window, literal=args.literal,
                extended=args.extended, lazy_matching=args.lazy_matching,
                dictionary=dict_b, shard_size=args.shard_size,
                engine="native")
            return 0
        data = _read(inp)
        if getattr(args, "optimal", False):
            if args.sharded:
                from tamp_tpu.parallel.shard import compress_sharded

                dict_b = None
                if args.dictionary is not None:
                    dict_b = bytes(load_dictionary(
                        args.dictionary, args.window, args.literal,
                        args.extended))
                _write(args.output, compress_sharded(
                    data, window=args.window, literal=args.literal,
                    extended=args.extended, dictionary=dict_b,
                    shard_size=args.shard_size, engine="optimal"))
                return 0
            from tamp_tpu.engine.encode import encode_extended_optimal, encode_v1

            kwargs = dict(window=args.window, literal=args.literal)
            if args.dictionary is not None:
                kwargs["dictionary"] = bytes(load_dictionary(
                    args.dictionary, args.window, args.literal, args.extended))
            if args.extended:
                _write(args.output, encode_extended_optimal(data, **kwargs))
            else:
                _write(args.output, encode_v1(data, parse="optimal", **kwargs))
            return 0
        if args.sharded:
            from tamp_tpu.parallel.shard import compress_sharded

            dict_b = None
            if args.dictionary is not None:
                dict_b = bytes(load_dictionary(
                    args.dictionary, args.window, args.literal, args.extended))
            out = compress_sharded(
                data, window=args.window, literal=args.literal,
                extended=args.extended, lazy_matching=args.lazy_matching,
                dictionary=dict_b, shard_size=args.shard_size,
                engine="native",
            )
        else:
            kwargs = dict(
                window=args.window, literal=args.literal,
                lazy_matching=args.lazy_matching, extended=args.extended,
            )
            if args.dictionary is not None:
                kwargs["dictionary"] = bytes(load_dictionary(
                    args.dictionary, args.window, args.literal, args.extended
                ))
            out = get_compress_implementation(args.implementation)(data, **kwargs)
        _write(args.output, out)
        return 0

    if args.command == "decompress":
        inp = args.input_opt or args.input
        if inp is not None and args.output is not None:
            with open(str(inp), "rb") as f:
                magic = f.read(4)
            if magic == b"TTPU":  # file-to-file container: bounded memory
                from tamp_tpu.parallel.shard import decompress_file_sharded

                dict_b = None
                if args.dictionary is not None:
                    dict_b = bytes(load_dictionary(
                        args.dictionary, args.window, args.literal,
                        args.extended))
                decompress_file_sharded(inp, args.output, dictionary=dict_b)
                return 0
        data = _read(inp)
        if data[:4] == b"TTPU":
            from tamp_tpu.parallel.shard import decompress_sharded

            dict_b = None
            if args.dictionary is not None:
                dict_b = bytes(load_dictionary(
                    args.dictionary, args.window, args.literal,
                    args.extended))
            out = bytes(decompress_sharded(data, dictionary=dict_b))
        else:
            kwargs = {}
            if args.dictionary is not None:
                kwargs["dictionary"] = bytes(load_dictionary(
                    args.dictionary, args.window, args.literal, args.extended
                ))
            out = get_decompress_implementation(args.implementation)(data, **kwargs)
        _write(args.output, out)
        return 0

    if args.command == "build-dictionary":
        from tamp_tpu.dictbuild import build_dictionary_from_path

        dictionary = build_dictionary_from_path(
            args.corpus, window=args.window, size=args.size,
            delimiter=args.delimiter, trim_threshold=args.trim_threshold,
            target_fill=args.target_fill, auto_trim=args.auto_trim,
            auto_size=args.auto_size,
        )
        args.output.write_bytes(bytes(dictionary))
        print(f"Wrote {len(dictionary)}-byte dictionary to {args.output}",
              file=sys.stderr)
        return 0

    return 1


def run_app() -> None:
    raise SystemExit(main())


if __name__ == "__main__":
    run_app()
