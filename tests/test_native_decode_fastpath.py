"""Decoder fast-path coverage: the native decoders take a bulk-refill fast
path whenever >=8 input bytes are loadable and >=256 output bytes of slack
remain, falling back to the token-atomic careful path near stream edges.
These tests force both paths and every handover between them, checking the
output byte-equal to the reference decoder (which also decodes any trailing
zero-padding as spurious tokens — external framing is the format's contract,
reference specification.rst "Flushing")."""

import io
import random

import pytest

import tamp_tpu
from tamp_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _flushy_stream(ref_tamp, rng, window, literal, n):
    """Reference-encoded stream with mid-stream FLUSHes and a dictionary
    reset, so FLUSH padding-discard runs inside the fast path."""
    base = b"fast path handover test data " * 64
    data = bytes(base[rng.randrange(len(base))] for _ in range(n // 2)) + base[: n - n // 2]
    mask = (1 << literal) - 1
    data = bytes(b & mask for b in data)
    buf = io.BytesIO()
    c = ref_tamp.Compressor(
        buf, window=window, literal=literal, dictionary_reset=True
    )
    third = max(1, len(data) // 3)
    c.write(data[:third])
    c.flush(write_token=True)
    c.write(data[third : 2 * third])
    c.reset_dictionary()
    c.write(data[2 * third :])
    if rng.random() < 0.5:
        c.flush(write_token=True)
    c.close()
    return buf.getvalue()


@pytest.mark.parametrize("window,literal", [(8, 8), (10, 8), (11, 5), (12, 7)])
def test_oneshot_decode_matches_reference(window, literal, ref_tamp, rng):
    for n in (0, 1, 7, 300, 5000, 40000):
        comp = _flushy_stream(ref_tamp, rng, window, literal, n)
        want = ref_tamp.Decompressor(io.BytesIO(comp)).read()
        got = _native.native_decompress(comp)
        assert bytes(got) == want, (window, literal, n)


def test_streaming_decode_mixed_read_sizes(ref_tamp, rng):
    """Tiny reads force the careful path, huge reads the fast path; the
    interleaving exercises every handover (acc/bits carry across)."""
    from tamp_tpu._native.stream import NativeDecompressor

    for trial in range(8):
        comp = _flushy_stream(ref_tamp, rng, 10, 8, 20000)
        want = ref_tamp.Decompressor(io.BytesIO(comp)).read()
        d = NativeDecompressor(io.BytesIO(comp))
        out = bytearray()
        while True:
            k = rng.choice([1, 2, 17, 255, 256, 257, 65536])
            chunk = d.read(k)
            if not chunk:
                break
            out += chunk
        assert bytes(out) == want, trial


def test_rle_and_extended_in_fast_path(ref_tamp):
    """Long runs (RLE tokens) and long repeats (extended matches) decoded
    wholly inside the fast path."""
    data = b"\x00" * 5000 + b"abcdefgh" * 2000 + b"\xff" * 999 + b"tail"
    comp = ref_tamp.compress(data, window=10)
    got = _native.native_decompress(comp)
    assert bytes(got)[: len(data)] == data
    assert bytes(got) == ref_tamp.Decompressor(io.BytesIO(comp)).read()


def test_fast_path_oob_reference_rejected(rng):
    """A corrupted stream whose match index runs past the window must error,
    not read out of bounds, regardless of which path decodes it."""
    data = bytes(rng.choice(b"seed data ") for _ in range(4000))
    comp = bytearray(tamp_tpu.compress(data, window=8))
    failures = 0
    for _ in range(200):
        mutated = bytearray(comp)
        for _ in range(rng.randrange(1, 6)):
            mutated[rng.randrange(1, len(mutated))] ^= 1 << rng.randrange(8)
        try:
            out = _native.native_decompress(bytes(mutated))
            assert len(out) < len(data) + (1 << 20)
        except ValueError:  # includes OutOfBoundsError
            failures += 1
    assert failures >= 0  # no crash is the property under test
