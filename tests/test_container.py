"""TTPU container frame tests: v2 round-trip (zero-copy ordered gather),
v1 back-compat, partial last shard, decode-into semantics, and corruption
errors.  The container is the data-parallel scaling layer (SURVEY.md §2.8);
the Tamp spec itself delegates framing to the container
(reference docs/source/specification.rst "Flushing")."""

import struct

import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.parallel import shard

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _corpus(rng, n):
    return bytes(rng.choice(b"the quick brown fox jumps over \x00\xff") for _ in range(n))


def test_container_custom_dictionary(rng):
    """Custom dictionaries thread through every container engine and both
    decode sides (host threads + device kernels); per-shard streams carry
    the custom-dict header bit and interop with the reference decoder."""
    import numpy as np

    data = _corpus(rng, 30000)
    dict_b = bytes(data[:512] * 2)  # window-sized, content-correlated
    kw = dict(window=10, shard_size=4096, dictionary=dict_b)
    blob = shard.compress_sharded(data, **kw)
    # a correlated dictionary must help on this corpus
    assert len(blob) < len(shard.compress_sharded(
        data, window=10, shard_size=4096))
    assert bytes(shard.decompress_sharded(blob, dictionary=dict_b)) == data
    # per-shard stream: reference-package interop
    _, _, pieces = shard._parse_frame(blob)
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import tamp as ref

        assert bytes(ref.decompress(
            bytearray(pieces[0]), dictionary=bytearray(dict_b))
        ) == data[:4096]
    except ImportError:
        pass
    finally:
        sys.path.remove("/root/reference")
    # other engines produce identical containers where parity is contracted
    blob_opt = shard.compress_sharded(data, engine="optimal", **kw)
    assert bytes(shard.decompress_sharded(
        blob_opt, dictionary=dict_b)) == data
    # device-commit (interpret kernels) + device decode
    blob_v1 = shard.compress_sharded(
        data, engine="device-commit", extended=False, **kw)
    assert blob_v1 == shard.compress_sharded(
        data, engine="native", extended=False, lazy_matching=False, **kw)
    blob_ext = shard.compress_sharded(data, engine="device-commit", **kw)
    assert bytes(shard.decompress_sharded(
        blob_ext, dictionary=dict_b)) == data
    got = shard.decompress_sharded_device(blob, dictionary=dict_b)
    assert bytes(got) == data


def test_v2_roundtrip_and_partial_last_shard(rng):
    for n in (0, 1, 4095, 4096, 4097, 50000):
        data = _corpus(rng, n)
        blob = shard.compress_sharded(data, shard_size=4096)
        raw, ss, pieces = shard._parse_frame(blob)
        assert raw == n and ss == 4096
        assert bytes(shard.decompress_sharded(blob)) == data
        assert bytes(shard.decompress_sharded(blob, workers=1)) == data


def test_v1_frame_back_compat(rng):
    data = _corpus(rng, 30000)
    blob = shard.compress_sharded(data, shard_size=8192)
    raw, _ss, pieces = shard._parse_frame(blob)
    head = shard.MAGIC + struct.pack("<BBIQ", 1, 0, len(pieces), raw)
    v1 = head + struct.pack(f"<{len(pieces)}I", *(len(b) for b in pieces)) \
        + b"".join(pieces)
    assert bytes(shard.decompress_sharded(v1)) == data
    # device decode of a v1 frame needs the caller-supplied bound
    assert bytes(shard.decompress_sharded_device(v1, shard_size=8192)) == data


def test_v2_device_decode_needs_no_shard_size(rng):
    data = _corpus(rng, 20000)
    blob = shard.compress_sharded(data, shard_size=4096)
    assert bytes(shard.decompress_sharded_device(blob)) == data


def test_decompress_into(rng):
    import numpy as np

    data = _corpus(rng, 9000)
    comp = tamp_tpu.compress(data)
    out = np.zeros(len(data), np.uint8)
    n = _native.native_decompress_into(comp, out)
    assert n == len(data) and out.tobytes() == data
    small = np.zeros(100, np.uint8)
    with pytest.raises(ValueError):
        _native.native_decompress_into(comp, small)


def test_container_errors(rng):
    data = _corpus(rng, 10000)
    blob = bytearray(shard.compress_sharded(data, shard_size=4096))
    with pytest.raises(ValueError):
        shard.decompress_sharded(b"NOPE" + bytes(blob[4:]))
    bad_ver = bytearray(blob)
    bad_ver[4] = 9
    with pytest.raises(ValueError):
        shard.decompress_sharded(bytes(bad_ver))
    # truncated stream inside a shard -> raw-size mismatch, not silence
    with pytest.raises(ValueError):
        shard.decompress_sharded(bytes(blob[:-3]))


def test_file_sharded_matches_in_memory(rng, tmp_path):
    # bounded-memory file API: byte-identical container, round-trip via
    # both the streaming and in-memory decoders
    data = _corpus(rng, 50_000)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.ttpu"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    n = shard.compress_file_sharded(src, dst, shard_size=4096, workers=3)
    blob = dst.read_bytes()
    assert n == len(blob)
    assert blob == shard.compress_sharded(data, shard_size=4096)
    assert bytes(shard.decompress_sharded(blob)) == data
    m = shard.decompress_file_sharded(dst, back, workers=3)
    assert m == len(data) and back.read_bytes() == data


def test_file_sharded_empty_and_single_shard(rng, tmp_path):
    for payload in (b"", b"tiny"):
        src = tmp_path / "in.bin"
        dst = tmp_path / "out.ttpu"
        back = tmp_path / "back.bin"
        src.write_bytes(payload)
        shard.compress_file_sharded(src, dst, shard_size=4096)
        assert dst.read_bytes() == shard.compress_sharded(payload, shard_size=4096)
        shard.decompress_file_sharded(dst, back)
        assert back.read_bytes() == payload


def test_file_sharded_rejects_device_commit(tmp_path):
    src = tmp_path / "in.bin"
    src.write_bytes(b"x" * 100)
    with pytest.raises(ValueError):
        shard.compress_file_sharded(src, tmp_path / "o", engine="device-commit")


def test_file_sharded_raw_size_mismatch(rng, tmp_path):
    data = _corpus(rng, 20_000)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.ttpu"
    src.write_bytes(data)
    shard.compress_file_sharded(src, dst, shard_size=4096)
    blob = bytearray(dst.read_bytes())
    struct.pack_into("<Q", blob, 10, len(data) + 1)  # corrupt raw_size
    bad = tmp_path / "bad.ttpu"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        shard.decompress_file_sharded(bad, tmp_path / "back.bin")
