"""Malicious-input robustness and regression vectors.

Mirrors the reference's fuzz targets and on-device vector replay
(fuzz/fuzz_decompressor.c; devices/vectors: truncated, random-garbage,
lone-header, all-ones): decoders must never crash, hang, or read outside
the window; the native decoder rejects OOB references like the reference C
implementation, while the Python decoder matches the reference Python
decoder's permissive behavior byte-for-byte.
"""

import random

import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.constants import HUFFMAN_CODES, HUFFMAN_LENGTHS
from tamp_tpu.exceptions import OutOfBoundsError


def _bitstream(fields):
    acc = nb = 0
    out = bytearray()
    for v, n in fields:
        acc = (acc << n) | v
        nb += n
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def _decode_python(blob):
    from tamp_tpu.decompressor import decompress as py_decompress

    try:
        return bytes(py_decompress(blob)), None
    except Exception as e:
        return None, type(e).__name__


def _decode_native(blob):
    try:
        return bytes(_native.native_decompress(blob)), None
    except Exception as e:
        return None, type(e).__name__


VECTORS = {
    "lone-header": bytes([0x5A]),
    "lone-extended-header": bytes([0x1A]),
    "truncated": tamp_tpu.compress(b"hello world, hello world!")[:4],
    "all-ones": b"\xff" * 64,
    "all-zero": b"\x00" * 64,
    "random-garbage": bytes(random.Random(7).getrandbits(8) for _ in range(256)),
}


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_vectors_never_crash(name):
    blob = VECTORS[name]
    out_p, err_p = _decode_python(blob)
    out_n, err_n = _decode_native(blob)
    # Both must terminate; when both succeed they must agree.
    if out_p is not None and out_n is not None:
        assert out_p == out_n, name


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_vectors_match_reference(name, ref_tamp):
    blob = VECTORS[name]
    try:
        expected = bytes(ref_tamp.decompress(blob))
    except Exception as e:
        expected = type(e).__name__
    out, err = _decode_python(blob)
    got = out if out is not None else err
    if isinstance(expected, bytes):
        assert got == expected, name
    else:
        assert out is None, (name, "reference raised but we decoded")


def test_oob_native_rejected_python_matches_reference(ref_tamp):
    # Basic match w=8: index 255, size 15 -> index + size > window.
    blob = _bitstream([(0x18, 8), (HUFFMAN_CODES[13], HUFFMAN_LENGTHS[13]), (255, 8)])
    from tamp_tpu.decompressor import decompress as py_decompress

    with pytest.raises(OutOfBoundsError):
        _native.native_decompress(blob)
    assert bytes(py_decompress(blob)) == bytes(ref_tamp.decompress(blob))


def test_oob_extended_native_rejected():
    # Extended match w=8: secondary sym encodes a large size at index 250.
    fields = [(0x1A, 8), (HUFFMAN_CODES[13], HUFFMAN_LENGTHS[13]),
              (HUFFMAN_CODES[5], HUFFMAN_LENGTHS[5] - 1), (0, 3), (250, 8)]
    blob = _bitstream(fields)
    with pytest.raises((OutOfBoundsError, ValueError)):
        _native.native_decompress(blob)


def test_decompressor_fuzz_smoke(rng):
    """Bounded random-input fuzz: both decoders must terminate gracefully
    and agree whenever both succeed (the reference's fuzz_decompressor
    harness, minus libFuzzer)."""
    for trial in range(300):
        n = rng.randrange(0, 64)
        blob = bytes(rng.getrandbits(8) for _ in range(n))
        out_p, _ = _decode_python(blob)
        out_n, err_n = _decode_native(blob)
        if out_p is not None and out_n is not None:
            assert out_p == out_n, blob.hex()


def test_roundtrip_fuzz_smoke(rng):
    """Bounded compress->decompress fuzz across the config lattice
    (the reference's fuzz_round_trip target)."""
    for trial in range(40):
        n = rng.randrange(0, 2000)
        style = rng.randrange(3)
        if style == 0:
            data = bytes(rng.getrandbits(8) for _ in range(n))
        elif style == 1:
            data = bytes(rng.choice(b"abc ") for _ in range(n))
        else:
            data = bytes([rng.getrandbits(8)]) * n
        w = rng.choice([8, 10, 12])
        lazy = rng.random() < 0.5
        ext = rng.random() < 0.7
        lit = rng.choice([8, 8, 7])
        data = bytes(b & ((1 << lit) - 1) for b in data)
        blob = _native.native_compress(
            data, window=w, literal=lit, extended=ext, lazy_matching=lazy
        )
        assert bytes(_native.native_decompress(blob)) == data
        assert bytes(tamp_tpu.decompress(blob)) == data
