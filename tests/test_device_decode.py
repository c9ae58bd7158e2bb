"""Device (JAX) decoder tests: parity with the native decoder across
configurations, flush/reset streams, and TTPU containers."""

import random

import numpy as np
import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.ops.decode_jax import decode_shards_device

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native encoder needed to build fixtures"
)


def _gen(rng, n, style):
    if style == 0:
        return bytes(rng.getrandbits(8) for _ in range(n))
    if style == 1:
        return bytes(rng.choice(b"hello world ") for _ in range(n))
    if style == 2:
        return bytes([7]) * n
    return (b"abcdefgh" * (n // 8 + 1))[:n]


@pytest.mark.parametrize("w,lit,ext", [
    (10, 8, True), (8, 8, False), (12, 7, True), (9, 5, True),
])
def test_device_decode_parity(w, lit, ext, rng):
    mask = (1 << lit) - 1
    datas = [
        bytes(b & mask for b in _gen(rng, rng.randrange(50, 1500), s % 4))
        for s in range(6)
    ]
    shards = [
        _native.native_compress(d, window=w, literal=lit, extended=ext)
        for d in datas
    ]
    outs = decode_shards_device(shards, max_out=1500)
    for o, d in zip(outs, datas):
        assert o == d


def test_device_decode_flush_and_reset(rng):
    import io

    from tamp_tpu._native.stream import NativeCompressor

    out = io.BytesIO()
    c = NativeCompressor(out, dictionary_reset=True)
    c.write(b"first segment " * 20)
    c.flush()
    c.write(b"second segment " * 20)
    c.reset_dictionary()
    c.write(b"third segment " * 20)
    c.close()
    blob = out.getvalue()
    expected = bytes(tamp_tpu.decompress(blob))
    (got,) = decode_shards_device([blob], max_out=4096)
    assert got == expected


def test_device_decode_container(rng):
    from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded_device

    data = bytes(rng.choice(b"tampa bay buccaneers ") for _ in range(60000))
    blob = compress_sharded(data, shard_size=4096, engine="native")
    for algorithm in ("wavefront", "serial"):
        got = decompress_sharded_device(blob, shard_size=4096, algorithm=algorithm)
        assert bytes(got) == data


def test_device_decode_custom_dictionary(rng):
    d = bytes((b"shared dictionary content " * 64)[:1024])
    data = b"shared dictionary content is reused here"
    blob = _native.native_compress(data, dictionary=d)
    (got,) = decode_shards_device([blob], dictionary=d, max_out=256)
    assert got == data


def test_unified_v1_decode_edges():
    """The v1 unified (output-buffer-as-ring) commit variant across the
    geometry that distinguishes it from the classic path: outputs
    straddling flush-chunk boundaries, matches reading dictionary slots,
    exact-W outputs, and wrap-overlap matches (ab-periodic data maximizes
    self-referential copies)."""
    import os

    import numpy as np

    import tamp_tpu
    from tamp_tpu.ops.decode_wavefront import decode_shards_wavefront

    prev = os.environ.get("TAMP_TPU_DECODE")
    os.environ["TAMP_TPU_DECODE"] = "commit"
    try:
        rng = np.random.default_rng(55)
        # w=12: unified (>= 4 flush chunks); w=10: the classic ring path
        for w in (12, 10):
            for n in (1, 511, 512, 513, 1023, 1024, 1025, 3000, 8192):
                for data in ((b"ab" * n)[:n],
                             bytes(rng.integers(0, 256, n, np.uint8))):
                    blob = tamp_tpu.compress(data, window=w, extended=False)
                    got = decode_shards_wavefront([blob], max_out=n + 64)[0]
                    assert got == data, (w, n)
    finally:
        if prev is None:
            del os.environ["TAMP_TPU_DECODE"]
        else:
            os.environ["TAMP_TPU_DECODE"] = prev
