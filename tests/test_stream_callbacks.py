"""Native progress callbacks + abort (observability parity with the
reference's tamp_callback_t, tamp/_c_src/tamp/common.h:184-210, and with
the Python codec's per-token callbacks, tamp_tpu/compressor.py).

Contract under test: cumulative (bytes_in, bytes_out) counters fire
periodically at token boundaries; a truthy return aborts the in-flight
call with AbortedError while the stream stays token-consistent, so the
same call can resume and the final output is byte-identical.
"""

import io

import pytest

from tamp_tpu import _native
from tamp_tpu.exceptions import AbortedError

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native engine unavailable")


def _data():
    import numpy as np

    rng = np.random.default_rng(0xCB)
    words = [bytes(rng.integers(97, 123, rng.integers(2, 9))) for _ in range(64)]
    return b" ".join(words[int(i) % 64] for i in rng.integers(0, 64, 60_000))


def _compress(data, cb=None, **kw):
    from tamp_tpu._native.stream import NativeCompressor

    buf = io.BytesIO()
    c = NativeCompressor(buf, **kw)
    if cb is not None:
        c.set_progress_callback(cb)
    c.write(data)
    c.close()
    return buf.getvalue()


def test_compressor_events_monotonic_and_output_unchanged():
    data = _data()
    events = []
    blob = _compress(data, cb=lambda bi, bo: events.append((bi, bo)))
    assert events, "callback never fired"
    assert all(b >= a for a, b in zip(events, events[1:]))
    assert 0 < events[-1][0] <= len(data)
    assert 0 < events[-1][1] <= len(blob)
    assert blob == _compress(data), "observing callback changed the stream"


def test_decompressor_events_monotonic():
    from tamp_tpu._native.stream import NativeDecompressor

    data = _data()
    blob = _compress(data)
    events = []
    d = NativeDecompressor(blob)
    d.set_progress_callback(lambda bi, bo: events.append((bi, bo)))
    assert bytes(d.read()) == data
    assert events, "callback never fired"
    assert all(b >= a for a, b in zip(events, events[1:]))
    assert events[-1][0] <= len(blob)
    assert events[-1][1] <= len(data)


def test_compressor_abort_then_resume_is_byte_identical():
    from tamp_tpu._native.stream import NativeCompressor

    data = _data()
    expect = _compress(data)
    buf = io.BytesIO()
    c = NativeCompressor(buf)
    calls = [0]

    def aborter(bi, bo):
        calls[0] += 1
        return calls[0] >= 2

    c.set_progress_callback(aborter)
    with pytest.raises(AbortedError):
        c.write(data)
    assert calls[0] == 2
    c.set_progress_callback(None)
    c.write(b"")  # resume: the unconsumed input is held in the stream
    c.close()
    assert buf.getvalue() == expect


def test_decompressor_abort_then_resume_covers_all_bytes():
    from tamp_tpu._native.stream import NativeDecompressor

    data = _data()
    blob = _compress(data)
    d = NativeDecompressor(blob)
    d.set_progress_callback(lambda bi, bo: True)  # abort on first poll
    got = bytearray(len(data))
    with pytest.raises(AbortedError):
        d.readinto(got)
    d.set_progress_callback(None)
    rest = d.read()
    k = len(data) - len(rest)
    assert 0 < k < len(data), "abort happened at the very start/end"
    assert bytes(got[:k]) == data[:k]
    assert bytes(rest) == data[k:]


def test_callback_exception_propagates_and_stream_survives():
    from tamp_tpu._native.stream import NativeDecompressor

    data = _data()
    blob = _compress(data)
    d = NativeDecompressor(blob)

    def boom(bi, bo):
        raise KeyError("boom")

    d.set_progress_callback(boom)
    with pytest.raises(KeyError):
        d.read()
    d.set_progress_callback(None)
    rest = d.read()
    assert data.endswith(bytes(rest)) and len(rest) > 0


def test_flush_drain_polls_callback():
    # A small write below the look-ahead holds all input; the flush drain
    # must still fire the callback as it consumes the held bytes.
    from tamp_tpu._native.stream import NativeCompressor

    data = _data()[:8192]
    buf = io.BytesIO()
    c = NativeCompressor(buf)
    events = []
    c.set_progress_callback(lambda bi, bo: events.append((bi, bo)))
    for i in range(0, len(data), 13):  # tiny writes: run_held rarely steps
        c.write(data[i : i + 13])
    c.close()
    assert events, "drain never polled the callback"
    assert events[-1][0] <= len(data)
