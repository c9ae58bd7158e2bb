"""On-chip v1 encode (MXU tables + Pallas stream-commit) parity.

``engine.pipeline.encode_v1_device_commit`` must be byte-identical to the
native encoder (itself byte-parity with the reference) across configs,
lazy matching, batch shapes, and tail edge cases.  Runs the commit kernel
in interpreter mode on the CPU suite; the compiled kernel runs the same
program on TPU (validated on-chip during development).
"""

import numpy as np
import pytest

from tamp_tpu import _native
from tamp_tpu.engine.pipeline import encode_v1_device_commit
from tamp_tpu.exceptions import ExcessBitsError

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _corpus(n, rng):
    base = (b"the stream-commit encoder walks tokens on the scalar core "
            b"while the MXU searches windows in parallel ")
    reps = -(-n // len(base))
    mixed = bytearray((base * reps)[:n])
    # sprinkle randomness so matches vary
    for k in rng.integers(0, max(n, 1), max(n // 37, 1)):
        mixed[int(k) % max(n, 1)] = int(rng.integers(0, 256))
    return bytes(mixed[:n])


@pytest.mark.parametrize("lazy", [False, True])
def test_batch_parity_vs_native(lazy, rng):
    nrng = np.random.default_rng(11)
    shards = [
        _corpus(5000, nrng),
        _corpus(1 << 13, nrng)[3:],
        bytes(nrng.integers(0, 256, 2048, np.uint8)),  # incompressible
        b"a" * 700,                                     # run-heavy
        b"",
        b"x",
        _corpus(17, nrng),                              # almost all tail
        bytes(nrng.integers(0, 256, 15, np.uint8)),     # pure tail
    ]
    got = encode_v1_device_commit(
        shards, window=10, literal=8, lazy_matching=lazy, interpret=True)
    for s, g in zip(shards, got):
        want = bytes(_native.native_compress(
            s, window=10, literal=8, extended=False, lazy_matching=lazy))
        assert g == want, len(s)


@pytest.mark.parametrize("window,literal", [(8, 8), (12, 7), (15, 8), (9, 5)])
def test_config_sweep(window, literal, rng):
    nrng = np.random.default_rng(window * 31 + literal)
    mask = (1 << literal) - 1
    data = bytes(b & mask for b in _corpus(3000, nrng))
    got = encode_v1_device_commit(
        [data], window=window, literal=literal, interpret=True)[0]
    want = bytes(_native.native_compress(
        data, window=window, literal=literal, extended=False))
    assert got == want


@pytest.mark.parametrize("lazy", [False, True])
def test_fused_device_call_parity(lazy):
    """The single-call fused path (ops/encode_fused.py: on-device search ->
    pack -> commit, interpret mode here) matches the native encoder
    byte-for-byte, including tails, empties, and runs."""
    nrng = np.random.default_rng(77)
    shards = [
        _corpus(3000, nrng),
        b"b" * 500 + _corpus(600, nrng),
        bytes(nrng.integers(0, 256, 1024, np.uint8)),
        b"",
        _corpus(17, nrng),
    ]
    got = encode_v1_device_commit(
        shards, window=10, literal=8, lazy_matching=lazy, interpret=True,
        fused=True)
    for s, g in zip(shards, got):
        want = bytes(_native.native_compress(
            s, window=10, literal=8, extended=False, lazy_matching=lazy))
        assert g == want, len(s)


@pytest.mark.parametrize("window,literal", [(8, 8), (11, 5)])
def test_fused_config_sweep(window, literal):
    """Fused path across the cap-15/cap-16 table split (w=8,l=8 -> cap 15;
    w=11,l=5 -> minp 3, cap 16)."""
    nrng = np.random.default_rng(window * 131 + literal)
    mask = (1 << literal) - 1
    data = bytes(b & mask for b in _corpus(2500, nrng))
    got = encode_v1_device_commit(
        [data], window=window, literal=literal, interpret=True, fused=True)[0]
    want = bytes(_native.native_compress(
        data, window=window, literal=literal, extended=False))
    assert got == want


def test_excess_bits_raises():
    with pytest.raises(ExcessBitsError):
        encode_v1_device_commit(
            [b"\xff" * 64], window=10, literal=7, interpret=True)


def test_roundtrips_through_reference_decoder():
    import io
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from tamp.decompressor import Decompressor as RefDecompressor
    except Exception:
        pytest.skip("reference package unavailable")
    finally:
        sys.path.remove("/root/reference")

    nrng = np.random.default_rng(5)
    data = _corpus(4000, nrng)
    blob = encode_v1_device_commit([data], window=10, literal=8,
                                   interpret=True)[0]
    assert bytes(RefDecompressor(io.BytesIO(blob)).read()) == data


def test_container_device_commit_engine():
    """engine="device-commit" produces a container byte-identical to the
    native engine at extended=False and round-trips."""
    from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded

    nrng = np.random.default_rng(23)
    data = _corpus(40_000, nrng)
    blob = compress_sharded(
        data, engine="device-commit", extended=False, shard_size=1 << 14)
    want = compress_sharded(
        data, engine="native", extended=False, shard_size=1 << 14)
    assert blob == want
    assert bytes(decompress_sharded(blob)) == data
    # extended device-commit: valid container, exact round-trip (per-shard
    # byte parity vs the forced-planned native committer is pinned in
    # tests/test_encode_ext_device.py)
    blob_ext = compress_sharded(
        data, engine="device-commit", extended=True, shard_size=1 << 14)
    assert bytes(decompress_sharded(blob_ext)) == data
    assert len(blob_ext) < len(blob)
    # round-2 gaps now capabilities: lazy matching and windows 14/15 run
    # on the device ext path (parity pinned in tests/test_encode_ext_device)
    blob_lazy = compress_sharded(data, engine="device-commit", extended=True,
                                 lazy_matching=True, shard_size=1 << 14)
    assert bytes(decompress_sharded(blob_lazy)) == data
    blob_w14 = compress_sharded(data, engine="device-commit", extended=True,
                                window=14, shard_size=1 << 14)
    assert bytes(decompress_sharded(blob_w14)) == data
