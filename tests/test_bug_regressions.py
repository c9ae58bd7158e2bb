"""Regression scenarios mirrored from the reference's fixed-bug suite.

The reference pinned each of these after a real bug (reference
tests/test_bug_regressions.py); this port asserts the same observable
behaviors for both our pure-Python codec and the native (C++) streaming
codec, so the same classes of bug cannot land here:

- ``read(size)`` past end-of-stream returns short, never zero-padded
  (reference tests/test_bug_regressions.py:51-59)
- ``write(b"")`` is a 0-byte no-op (":61-65")
- wrong-size dictionaries are rejected up front, compressors demand the
  exact window size, decompressors accept >= window and use the prefix
  in place (":67-98", ":161-236")
- a supplied-but-unused dictionary buffer is re-initialized in place
  rather than used verbatim (":100-111", ":210-220")
- non-conforming file objects: over-returning ``read()`` must not corrupt
  output, objects with only ``read()`` (no ``readinto``) must work
  (":113-158")
"""

import io

import pytest

from tamp_tpu import Compressor, Decompressor, initialize_dictionary
from tamp_tpu._native import available as native_available
from tamp_tpu._native.stream import NativeCompressor, NativeDecompressor

NATIVE = native_available()

COMPRESSORS = [("python", Compressor)] + (
    [("native", NativeCompressor)] if NATIVE else []
)
DECOMPRESSORS = [("python", Decompressor)] + (
    [("native", NativeDecompressor)] if NATIVE else []
)

PAYLOAD = b"payload " * 20

# The reference's pinned wire bytes for PAYLOAD at window=10 with/without a
# custom dictionary (initialize_dictionary(4096)[:1024]); regenerated live by
# test_pinned_streams_match to double as an encoder-parity check
# (reference tests/test_bug_regressions.py:178-179).
CUSTOM_DICT_STREAM = bytes.fromhex(
    "5eb8586f36c06cb248130009c8004f08004f320013c20000"
)
DEFAULT_STREAM = bytes.fromhex(
    "5ab8586f36c06cb248130009c8004f08004f320013c20000"
)


def _compress(Comp, payload, **kwargs):
    f = io.BytesIO()
    c = Comp(f, **kwargs)
    c.write(payload)
    c.flush(write_token=False)
    return f.getvalue()


def test_pinned_streams_match():
    big = initialize_dictionary(4096)
    for name, Comp in COMPRESSORS:
        assert (
            _compress(Comp, PAYLOAD, window=10, dictionary=bytearray(big[:1024]))
            == CUSTOM_DICT_STREAM
        ), name
        assert _compress(Comp, PAYLOAD, window=10) == DEFAULT_STREAM, name


@pytest.mark.parametrize("dname,Decomp", DECOMPRESSORS)
def test_read_size_past_end_returns_short(dname, Decomp):
    for cname, Comp in COMPRESSORS:
        blob = _compress(Comp, b"hello")
        assert bytes(Decomp(io.BytesIO(blob)).read(100)) == b"hello", cname


@pytest.mark.parametrize("cname,Comp", COMPRESSORS)
def test_write_empty(cname, Comp):
    with io.BytesIO() as f:
        assert Comp(f).write(b"") == 0


@pytest.mark.parametrize("cname,Comp", COMPRESSORS)
def test_compressor_dictionary_must_be_exact_size(cname, Comp):
    for wrong_size in (256, 2560, 0, 8192):
        with pytest.raises(ValueError):
            Comp(io.BytesIO(), window=12, dictionary=bytearray(wrong_size))


@pytest.mark.parametrize("dname,Decomp", DECOMPRESSORS)
def test_decompressor_undersized_dictionary_raises(dname, Decomp):
    # 2560 is in (2**11, 2**12]: a naive bit-length check would accept it
    # even though it is too small for a window=12 stream
    # (reference tests/test_bug_regressions.py:77-83).
    blob = _compress(
        Compressor, PAYLOAD, window=12,
        dictionary=bytearray(initialize_dictionary(4096)),
    )
    for wrong_size in (256, 2560, 0):
        with pytest.raises(ValueError):
            Decomp(io.BytesIO(blob), dictionary=bytearray(wrong_size))
    for wrong_size in (256, 1023, 0):
        with pytest.raises(ValueError):
            Decomp(
                io.BytesIO(CUSTOM_DICT_STREAM), dictionary=bytearray(wrong_size)
            )


@pytest.mark.parametrize("dname,Decomp", DECOMPRESSORS)
def test_oversized_dictionary_uses_prefix(dname, Decomp):
    big = initialize_dictionary(4096)
    d = Decomp(io.BytesIO(CUSTOM_DICT_STREAM), dictionary=bytearray(big))
    assert bytes(d.read()) == PAYLOAD

    # Bytes past the window must never influence output.
    garbage_tail = bytearray(big[:1024]) + bytearray(b"\xff" * 3072)
    d = Decomp(io.BytesIO(CUSTOM_DICT_STREAM), dictionary=garbage_tail)
    assert bytes(d.read()) == PAYLOAD

    # A wrong prefix must not round-trip (guards against a size check that
    # accepts a mismatched dictionary basis).
    d = Decomp(io.BytesIO(CUSTOM_DICT_STREAM), dictionary=bytearray(4096))
    assert bytes(d.read()) != PAYLOAD


def test_oversized_dictionary_prefix_mutated_in_place_python():
    # The pure-Python decompressor uses the caller's buffer as the live
    # window: the prefix mutates, the tail is never written
    # (reference tests/test_bug_regressions.py:181-196).
    big = initialize_dictionary(4096)
    oversized = bytearray(big)
    d = Decompressor(io.BytesIO(CUSTOM_DICT_STREAM), dictionary=oversized)
    assert bytes(d.read()) == PAYLOAD
    assert oversized[:1024] != big[:1024]
    assert oversized[1024:] == big[1024:]


@pytest.mark.parametrize("dname,Decomp", DECOMPRESSORS)
def test_unused_dictionary_reinitialized(dname, Decomp):
    # Supplying a dictionary for a stream whose header doesn't request one
    # must not corrupt output: the window region is re-initialized.
    payload = b"the quick brown fox jumps over the lazy dog" * 5
    for cname, Comp in COMPRESSORS:
        blob = _compress(Comp, payload)
        d = Decomp(io.BytesIO(blob), dictionary=bytearray(b"\xff" * 1024))
        assert bytes(d.read()) == payload, cname
    # Oversized unused buffer: correct output, tail untouched (python path
    # guarantees in-place semantics).
    oversized = bytearray(b"\xff" * 4096)
    d = Decompressor(io.BytesIO(DEFAULT_STREAM), dictionary=oversized)
    assert bytes(d.read()) == PAYLOAD
    assert oversized[:1024] != b"\xff" * 1024
    assert oversized[1024:] == b"\xff" * 3072


class _OverRead:
    """File object that returns more bytes than requested from read()."""

    def __init__(self, data):
        self._f = io.BytesIO(data)

    def read(self, n=-1):
        return self._f.read(n * 2 if n > 0 else -1)


class _ReadOnly:
    """File object with read() but no readinto()."""

    def __init__(self, data):
        self._f = io.BytesIO(data)

    def read(self, n=-1):
        return self._f.read(n)


@pytest.mark.parametrize("dname,Decomp", DECOMPRESSORS)
def test_overreturning_read_never_corrupts(dname, Decomp):
    # The reference's Cython binding chose to raise; the invariant that
    # matters is that over-returning input can never silently corrupt
    # output — either reject it or decode it correctly
    # (reference tests/test_bug_regressions.py:113-138).
    import random

    payload = random.Random(0).randbytes(50_000) * 4
    blob = _compress(Compressor, payload)
    try:
        got = bytes(Decomp(_OverRead(blob)).read())
    except ValueError:
        return
    assert got == payload


@pytest.mark.parametrize("dname,Decomp", DECOMPRESSORS)
def test_read_only_stream(dname, Decomp):
    payload = b"read-only source works" * 20
    for cname, Comp in COMPRESSORS:
        blob = _compress(Comp, payload)
        assert bytes(Decomp(_ReadOnly(blob)).read()) == payload, cname


def test_live_oversized_roundtrip_matrix():
    # Compress against the window-size prefix with every implementation,
    # decompress with the full oversized dictionary with every other.
    big = initialize_dictionary(4096)
    for cname, Comp in COMPRESSORS:
        blob = _compress(
            Comp, PAYLOAD, window=10, dictionary=bytearray(big[:1024])
        )
        for dname, Decomp in DECOMPRESSORS:
            d = Decomp(io.BytesIO(blob), dictionary=bytearray(big))
            assert bytes(d.read()) == PAYLOAD, (cname, dname)
