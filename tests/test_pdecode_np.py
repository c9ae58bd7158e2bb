"""Parallel-decode oracle (engine/pdecode_np) parity vs the native decoder.

The NumPy oracle implements the device decode algorithm (speculative per-bit
parse -> boundary resolution -> prefix-sum placement -> window-stream source
arithmetic -> pointer-doubling value resolution); these tests pin it
byte-identical to ``_native.native_decompress`` across the config lattice,
flush/reset flows, custom dictionaries, and corrupted streams, with both
boundary-resolution variants (sequential ground truth and the device-shaped
blocked pointer doubling).
"""

import io

import numpy as np
import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.engine.pdecode_np import pdecode

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _native_or_exc(comp, dictionary=None):
    try:
        return bytes(_native.native_decompress(comp, dictionary=dictionary)), None
    except Exception as e:  # noqa: BLE001 - differential oracle
        return None, type(e)


def _check(comp, dictionary=None, blocked=False):
    want, want_exc = _native_or_exc(comp, dictionary)
    if want_exc is not None:
        with pytest.raises(Exception):
            pdecode(comp, dictionary=dictionary, use_blocked_chase=blocked)
    else:
        got = pdecode(comp, dictionary=dictionary, use_blocked_chase=blocked)
        assert got == want


@pytest.mark.parametrize("window,literal,extended", [
    (8, 8, True), (10, 8, True), (10, 8, False), (11, 5, True),
    (12, 7, True), (15, 8, True), (13, 6, False),
])
@pytest.mark.parametrize("blocked", [False, True])
def test_config_lattice_parity(window, literal, extended, blocked, rng):
    base = b"parallel decode oracle corpus -- tokens of every kind " * 30
    mask = (1 << literal) - 1
    data = bytes(b & mask for b in base) + bytes(
        rng.randrange(1 << literal) for _ in range(1500))
    comp = bytes(_native.native_compress(
        data, window=window, literal=literal, extended=extended))
    _check(comp, blocked=blocked)


@pytest.mark.parametrize("blocked", [False, True])
def test_flush_and_reset_flows(blocked, rng):
    data = bytes(rng.choice(b"flush reset data ") for _ in range(5000))
    buf = io.BytesIO()
    c = tamp_tpu.Compressor(buf, window=10, dictionary_reset=True)
    third = len(data) // 3
    c.write(data[:third])
    c.flush(write_token=True)
    c.write(data[third:2 * third])
    c.reset_dictionary()
    c.write(data[2 * third:])
    c.flush(write_token=True)
    c.reset_dictionary()
    c.close()
    _check(buf.getvalue(), blocked=blocked)


def test_rle_heavy_and_window_truncation():
    # long runs force RLE window-write truncation at the ring edge; the
    # window-stream arithmetic must model the <=8-byte no-wrap writes
    # (reference decompressor.c decode_rle)
    data = b"\x00" * 4000 + b"ab" * 600 + b"\xff" * 999 + b"tail" + b"\x00" * 9
    for w in (8, 9, 10):
        _check(tamp_tpu.compress(data, window=w))
        _check(tamp_tpu.compress(data, window=w), blocked=True)


def test_custom_and_oversized_dictionaries(rng):
    W = 1 << 10
    dictv = bytes(rng.randrange(256) for _ in range(W))
    data = b"custom dictionary stream " * 120
    comp = tamp_tpu.compress(data, window=10, dictionary=bytearray(dictv))
    _check(comp, dictionary=dictv)
    # oversized: only the first W bytes are the window
    big = dictv + bytes(rng.randrange(256) for _ in range(512))
    comp2 = tamp_tpu.compress(data, window=10, dictionary=bytearray(dictv))
    _check(comp2, dictionary=big)


def test_custom_dict_reset_reverts_to_default(rng):
    dictv = bytes(rng.randrange(256) for _ in range(1 << 10))
    data = b"reset reverts to the default dictionary " * 60
    buf = io.BytesIO()
    c = tamp_tpu.Compressor(
        buf, window=10, dictionary=bytearray(dictv), dictionary_reset=True)
    c.write(data)
    c.reset_dictionary()
    c.write(data)
    c.close()
    _check(buf.getvalue(), dictionary=dictv)


def test_empty_and_tiny():
    _check(tamp_tpu.compress(b""))
    _check(tamp_tpu.compress(b"a"))
    _check(tamp_tpu.compress(b"ab" * 3))


@pytest.mark.parametrize("blocked", [False, True])
def test_corrupted_and_truncated_streams(blocked, rng):
    for trial in range(120):
        data = bytes(rng.choice(b"abcdef measure ")
                     for _ in range(rng.randrange(1, 2500)))
        comp = bytearray(tamp_tpu.compress(data, window=rng.choice([8, 10, 12])))
        op = rng.random()
        if op < 0.45:
            for _ in range(rng.randrange(1, 5)):
                comp[rng.randrange(len(comp))] ^= 1 << rng.randrange(8)
        elif op < 0.75:
            comp = comp[: rng.randrange(len(comp) + 1)]
        if not comp:
            continue
        _check(bytes(comp), blocked=blocked)
