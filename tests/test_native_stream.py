"""Native streaming codec: differential equality with the Python streaming
codec under random operation interleavings (write sizes, mid-stream flushes,
dictionary resets, append mode, chunked reads)."""

import io
import random

import pytest

import tamp_tpu
from tamp_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _random_ops(rng, n_ops):
    ops = []
    for _ in range(n_ops):
        r = rng.random()
        if r < 0.75:
            n = rng.randrange(0, 400)
            style = rng.randrange(3)
            if style == 0:
                data = bytes(rng.getrandbits(8) for _ in range(n))
            elif style == 1:
                data = bytes(rng.choice(b"tampa bay ") for _ in range(n))
            else:
                data = bytes([rng.getrandbits(8)]) * n
            ops.append(("write", data))
        elif r < 0.9:
            ops.append(("flush", rng.random() < 0.7))
        else:
            ops.append(("reset", None))
    return ops


@pytest.mark.parametrize("window,literal,extended,lazy", [
    (10, 8, True, False), (10, 8, True, True), (9, 8, False, False),
    (8, 8, True, True), (12, 7, True, False),
])
def test_stream_matches_python(window, literal, extended, lazy, rng):
    from tamp_tpu._native.stream import NativeCompressor

    for trial in range(6):
        ops = _random_ops(rng, 12)
        kw = dict(window=window, literal=literal, extended=extended,
                  lazy_matching=lazy, dictionary_reset=True)
        mask = (1 << literal) - 1

        fp = io.BytesIO()
        cp = tamp_tpu.Compressor(fp, **kw)
        fn = io.BytesIO()
        cn = NativeCompressor(fn, **kw)
        raw = bytearray()
        for op, arg in ops:
            if op == "write":
                data = bytes(b & mask for b in arg)
                cp.write(data)
                cn.write(data)
                raw += data
            elif op == "flush":
                cp.flush(write_token=arg)
                cn.flush(write_token=arg)
            else:
                cp.reset_dictionary()
                cn.reset_dictionary()
                raw.clear()
        cp.close()
        cn.close()
        assert fp.getvalue() == fn.getvalue(), (trial, ops)


def test_stream_append_mode(ref_tamp, rng):
    from tamp_tpu._native.stream import NativeCompressor

    first = b"part one of the stream. " * 8
    second = b"part two, appended after a reboot. " * 8

    out = io.BytesIO()
    c = NativeCompressor(out, dictionary_reset=True)
    c.write(first)
    c.close()  # ends on FLUSH so an append can continue

    c2 = NativeCompressor(out, dictionary_reset=True, append=True)
    c2.write(second)
    c2.close()

    blob = out.getvalue()
    # The appended stream decodes as first || second in every decoder.
    assert bytes(tamp_tpu.decompress(blob)) == first + second
    assert bytes(ref_tamp.decompress(blob)) == first + second


def test_stream_decompressor_chunked(rng):
    from tamp_tpu._native.stream import NativeDecompressor

    data = bytes(rng.choice(b"the quick brown fox ") for _ in range(20000))
    blob = tamp_tpu.compress(data, window=9)

    class DribbleIO:
        def __init__(self, raw):
            self.raw = raw
            self.off = 0

        def read(self, n):
            step = rng.randrange(1, 97)
            chunk = self.raw[self.off : self.off + step]
            self.off += len(chunk)
            return chunk

    d = NativeDecompressor(DribbleIO(blob))
    out = bytearray()
    while True:
        piece = d.read(rng.randrange(1, 777))
        if not piece:
            break
        out += piece
    assert bytes(out) == data


def test_stream_decompressor_custom_dictionary(ref_tamp):
    dict_ = bytearray((b"lorem ipsum dolor sit amet " * 40)[:1024])
    data = b"lorem ipsum dolor sit consectetur"
    blob = tamp_tpu.compress(data, dictionary=bytearray(dict_))
    from tamp_tpu._native.stream import NativeDecompressor

    d = NativeDecompressor(io.BytesIO(blob), dictionary=bytes(dict_))
    assert bytes(d.read()) == data


def test_stream_excess_bits():
    from tamp_tpu._native.stream import NativeCompressor

    c = NativeCompressor(io.BytesIO(), literal=7)
    with pytest.raises(tamp_tpu.ExcessBitsError):
        c.write(b"\xff")
        c.flush()


def test_stream_large_incompressible_write(rng):
    """A single write whose output exceeds the internal drain buffer must
    not duplicate input (regression: OUTPUT_FULL retry re-passed the data)."""
    import numpy as np

    from tamp_tpu._native.stream import NativeCompressor

    data = np.random.default_rng(7).integers(0, 256, 300000, dtype=np.uint8).tobytes()
    out = io.BytesIO()
    c = NativeCompressor(out)
    c.write(data)
    c.close()
    assert bytes(tamp_tpu.decompress(out.getvalue())) == data
    fp = io.BytesIO()
    cp = tamp_tpu.Compressor(fp)
    cp.write(data)
    cp.close()
    assert fp.getvalue() == out.getvalue()
