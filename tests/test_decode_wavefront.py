"""Wavefront device decoder (ops/decode_wavefront) parity vs the native decoder.

The wavefront kernel is the device port of the parallel-decode formulation
oracled by ``engine/pdecode_np``; these tests pin it byte-identical to
``_native.native_decompress`` across the config lattice, flush/reset flows,
custom dictionaries, grouped multi-shard calls, and corrupted streams
(exception-for-exception where the native decoder rejects the stream).

Runs on the virtual CPU mesh (conftest); the same jitted program serves TPU.
"""

import io

import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.ops.decode_wavefront import decode_shards_wavefront

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _native_or_exc(comp, dictionary=None):
    try:
        return bytes(_native.native_decompress(comp, dictionary=dictionary)), None
    except Exception as e:  # noqa: BLE001 - differential oracle
        return None, type(e)


def _wave(comp, dictionary=None, max_out=None):
    return decode_shards_wavefront(
        [comp], dictionary=dictionary, max_out=max_out)[0]


def _check(comp, dictionary=None):
    want, want_exc = _native_or_exc(comp, dictionary)
    if want_exc is not None:
        with pytest.raises(Exception):
            _wave(comp, dictionary=dictionary, max_out=1 << 20)
    else:
        got = _wave(comp, dictionary=dictionary,
                    max_out=max(len(want) + 64, 1024))
        assert got == want


@pytest.mark.parametrize("window,literal,extended", [
    (8, 8, True), (10, 8, True), (10, 8, False), (11, 5, True),
    (12, 7, True), (15, 8, True), (13, 6, False),
])
def test_config_lattice_parity(window, literal, extended, rng):
    base = b"wavefront decoder corpus -- tokens of every kind " * 30
    mask = (1 << literal) - 1
    data = bytes(b & mask for b in base) + bytes(
        rng.randrange(1 << literal) for _ in range(1500))
    comp = bytes(_native.native_compress(
        data, window=window, literal=literal, extended=extended))
    _check(comp)


def test_flush_and_reset_flows(rng):
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
    _check(buf.getvalue())


def test_rle_heavy_and_window_truncation():
    # long runs force RLE window-write truncation at the ring edge; the
    # deficit while_loop must model the <=8-byte no-wrap writes
    # (reference decompressor.c decode_rle / decode_extended_match)
    data = b"\x00" * 4000 + b"ab" * 600 + b"\xff" * 999 + b"tail" + b"\x00" * 9
    for w in (8, 9, 10):
        _check(tamp_tpu.compress(data, window=w))


def test_custom_and_oversized_dictionaries(rng):
    W = 1 << 10
    dictv = bytes(rng.randrange(256) for _ in range(W))
    data = b"custom dictionary stream " * 120
    comp = tamp_tpu.compress(data, window=10, dictionary=bytearray(dictv))
    _check(comp, dictionary=dictv)
    # oversized: only the first W bytes are the window
    big = dictv + bytes(rng.randrange(256) for _ in range(512))
    _check(comp, dictionary=big)


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


def test_grouped_multi_shard_call(rng):
    datas = [bytes(rng.choice(b"shard body text ") for _ in range(n))
             for n in (0, 1, 700, 2500, 64, 4096)]
    comps = [tamp_tpu.compress(d, window=10) for d in datas]
    got = decode_shards_wavefront(comps, max_out=5000)
    assert got == datas
    # small group budget forces multiple device calls
    got2 = decode_shards_wavefront(
        comps, max_out=5000, group_payload_bytes=1024)
    assert got2 == datas


def test_corrupted_and_truncated_streams(rng):
    for trial in range(60):
        data = bytes(rng.choice(b"abcdef measure ")
                     for _ in range(rng.randrange(1, 2000)))
        comp = bytearray(tamp_tpu.compress(data, window=rng.choice([8, 10, 12])))
        op = rng.random()
        if op < 0.45:
            for _ in range(rng.randrange(1, 5)):
                comp[rng.randrange(len(comp))] ^= 1 << rng.randrange(8)
        elif op < 0.75:
            comp = comp[: rng.randrange(len(comp) + 1)]
        if not comp:
            continue
        _check(bytes(comp))
