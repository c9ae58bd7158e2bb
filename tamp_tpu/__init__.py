"""tamp-tpu: a TPU-native implementation of the Tamp compression format.

Public API mirrors the ``tamp`` reference package (BrianPugh/tamp
tamp/__init__.py): ``compress`` / ``decompress`` one-shots, streaming
``Compressor`` / ``Decompressor`` (plus ``Text*`` variants), ``open``,
``initialize_dictionary``, and ``compute_min_pattern_size`` — with additional
TPU-first entry points under :mod:`tamp_tpu.engine` (vectorized single-chip
codec) and :mod:`tamp_tpu.parallel` (data-parallel sharded streams over a
device mesh).
"""

__version__ = "0.1.0"

from .compressor import Compressor, TextCompressor
from .compressor import compress as _py_compress
from .constants import compute_min_pattern_size
from .decompressor import Decompressor, TextDecompressor
from .decompressor import decompress as _py_decompress
from .dictionary import initialize_dictionary
from .exceptions import ExcessBitsError, OutOfBoundsError


def compress(data, **kwargs):
    """One-shot compression, dispatched to the fastest implementation.

    Mirrors the reference's import-fallback dispatch (tamp/__init__.py:73-93:
    viper -> Cython -> pure Python): the native C++ engine when available —
    byte-identical output, verified by the differential suite — else the
    pure-Python codec.  ``tamp_tpu.compressor.compress`` is always the
    Python implementation.

    ``parse="optimal"`` selects the minimum-bit parse (beyond the
    reference; see engine.encode) — smaller output, same format.
    """
    from . import _native

    if kwargs.pop("parse", "greedy") == "optimal":
        extended = kwargs.pop("extended", True)
        kwargs.pop("lazy_matching", None)  # the DP replaces the heuristic
        from .engine.encode import encode_extended_optimal, encode_v1

        if extended:
            return encode_extended_optimal(bytes(data), **kwargs)
        return encode_v1(bytes(data), parse="optimal", **kwargs)

    if _native.available():
        if "dictionary" in kwargs and kwargs["dictionary"] is not None:
            kwargs["dictionary"] = bytes(kwargs["dictionary"])
        return _native.native_compress(bytes(data), **kwargs)
    return _py_compress(data, **kwargs)


def decompress(data, **kwargs):
    """One-shot decompression via the fastest implementation (see compress).

    Note the native decoder rejects out-of-window references (reference C
    behavior); ``tamp_tpu.decompressor.decompress`` keeps the permissive
    pure-Python semantics.
    """
    from . import _native

    if _native.available():
        if "dictionary" in kwargs and kwargs["dictionary"] is not None:
            kwargs["dictionary"] = bytes(kwargs["dictionary"])
        return _native.native_decompress(bytes(data), **kwargs)
    return _py_decompress(data, **kwargs)

__all__ = [
    "Compressor",
    "TextCompressor",
    "compress",
    "Decompressor",
    "TextDecompressor",
    "decompress",
    "initialize_dictionary",
    "compute_min_pattern_size",
    "ExcessBitsError",
    "OutOfBoundsError",
    "open",
    "bit_size",
    "__version__",
]

_builtin_open = open


def bit_size(value: int) -> int:
    """Number of bits needed to represent ``value`` (0 for 0; -1 if 32+ bits)."""
    for i in range(32):
        if not value:
            return i
        value >>= 1
    return -1


def open(f, mode: str = "rb", *, implementation: str = "auto", **kwargs):
    """Open a Tamp stream for reading (decompression) or writing (compression).

    ``mode`` follows the reference contract: ``"r"``/``"rb"`` return a
    (Text)Decompressor, ``"w"``/``"wb"`` a (Text)Compressor; binary modes
    operate on bytes, text modes on str.

    ``implementation``: ``"auto"`` uses the native streaming engine for
    binary modes when available (byte-identical output, much faster);
    ``"python"`` / ``"native"`` force a backend.
    """
    if "r" in mode and "w" in mode:
        raise ValueError(f"Cannot open in both read and write mode: {mode!r}")
    use_native = False
    if implementation in ("auto", "native") and "b" in mode:
        from . import _native

        use_native = _native.available()
        if implementation == "native" and not use_native:
            raise RuntimeError(f"native engine unavailable: {_native.load_error()}")
    elif implementation not in ("auto", "python", "native"):
        raise ValueError(f"Unknown implementation: {implementation!r}")
    if "r" in mode:
        if use_native:
            from ._native.stream import NativeDecompressor

            return NativeDecompressor(f, **kwargs)
        return Decompressor(f, **kwargs) if "b" in mode else TextDecompressor(f, **kwargs)
    if "w" in mode:
        if use_native:
            from ._native.stream import NativeCompressor

            return NativeCompressor(f, **kwargs)
        return Compressor(f, **kwargs) if "b" in mode else TextCompressor(f, **kwargs)
    raise ValueError(f"Invalid mode: {mode!r}")
