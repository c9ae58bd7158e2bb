"""Native engine tests: standalone codec + table-assisted commit."""

import numpy as np
import pytest

import tamp_tpu
from tamp_tpu import _native

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)

CONFIGS = [
    (10, 8, True, False),
    (10, 8, True, True),
    (10, 8, False, False),
    (10, 8, False, True),
    (8, 8, True, True),
    (12, 8, True, False),
    (9, 7, False, True),
    (11, 5, True, False),
    (15, 8, True, False),
]


def _datasets(rng):
    text = (
        b"It was the best of times, it was the worst of times, it was the age "
        b"of wisdom, it was the age of foolishness. " * 40
    )
    return [
        b"",
        b"z",
        b"foo foo foo",
        text,
        bytes(rng.getrandbits(8) for _ in range(4000)),
        bytes(rng.choice(b"abcde") for _ in range(8000)),
        bytes([9] * 1500),                       # long runs -> RLE divergence
        bytes([9] * 300) + text[:400] + bytes([9] * 300),
        bytes(range(256)) * 16,
        bytes(rng.choice(b"ab") for _ in range(5000)),
    ]


@pytest.mark.parametrize("window,literal,extended,lazy", CONFIGS)
def test_native_standalone_matches_reference(window, literal, extended, lazy, ref_tamp, rng):
    from tamp.compressor import compress as ref_compress

    mask = (1 << literal) - 1
    for data in _datasets(rng):
        data = bytes(b & mask for b in data)
        ours = _native.native_compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        theirs = ref_compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        assert ours == theirs, (window, literal, extended, lazy, len(data))
        # native decoder round-trips
        assert bytes(_native.native_decompress(ours)) == data


@pytest.mark.parametrize("window,literal,extended,lazy", CONFIGS)
def test_native_table_commit(window, literal, extended, lazy, ref_tamp, rng):
    """Search tables + native commit: byte parity (v1 always; extended until
    divergence, then still valid with ratio close to reference)."""
    from tamp.compressor import compress as ref_compress
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.engine.search_np import match_tables

    mask = (1 << literal) - 1
    W = 1 << window
    for data in _datasets(rng):
        data = bytes(b & mask for b in data)
        arr = np.frombuffer(data, dtype=np.uint8)
        if extended:
            from tamp_tpu.engine.encode_extended import encode_extended

            ours = encode_extended(
                data, window=window, literal=literal, lazy_matching=lazy
            )
        else:
            dict_arr = dictionary_array(W, literal=8)
            tables = match_tables(arr, dict_arr, window, compute_probe=lazy)
            ours = _native.native_compress(
                data, window=window, literal=literal, extended=False,
                lazy_matching=lazy, tables=tables,
            )
        # Always: valid stream, exact round-trip through ours and reference.
        assert bytes(tamp_tpu.decompress(ours)) == data
        assert bytes(_native.native_decompress(ours)) == data
        theirs = ref_compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        if not extended:
            assert ours == theirs, (window, literal, lazy, len(data))
        else:
            # Post-divergence tokenization may differ; size must stay close.
            assert len(ours) <= len(theirs) + max(8, len(theirs) // 100), (
                window, literal, lazy, len(data), len(ours), len(theirs),
            )
            # exact-table mode (round 4): raw-history tables + seeded
            # exact searches past divergence = full byte parity.  Small
            # windows only (the O(N*W) oracle is slow at w>=13); the fuzz
            # campaign's greedy-device leg covers the full lattice.
            if window <= 11:
                dict_arr = dictionary_array(W, literal=literal)
                tabs = match_tables(arr, dict_arr, window,
                                    compute_probe=lazy)
                exact = _native.native_compress(
                    data, window=window, literal=literal, extended=True,
                    lazy_matching=lazy, tables=tabs, exact_tables=True)
                assert exact == theirs, (window, literal, lazy, len(data))


def test_native_decoder_vs_reference_streams(ref_tamp, rng):
    from tamp.compressor import compress as ref_compress

    for data in _datasets(rng):
        for kw in ({}, {"extended": False}, {"window": 12}, {"lazy_matching": True}):
            blob = ref_compress(data, **kw)
            assert bytes(_native.native_decompress(blob)) == data


def test_native_custom_dictionary(ref_tamp):
    d = bytearray((b"the quick brown fox jumps over the lazy dog " * 24)[:1024])
    data = b"the quick brown fox says hi to the lazy dog"
    ours = _native.native_compress(data, dictionary=bytes(d))
    import tamp.compressor

    theirs = tamp.compressor.compress(data, dictionary=bytearray(d))
    assert ours == theirs
    assert bytes(_native.native_decompress(ours, dictionary=bytes(d))) == data


def test_native_excess_bits():
    with pytest.raises(tamp_tpu.ExcessBitsError):
        _native.native_compress(b"\xff", literal=7)


def test_invalid_config_rejected_before_native_dispatch():
    """The reference validates window in [8,15] / literal in [5,8]
    (tamp/_c_src/tamp/compressor.c:207-209); the native fast path must not
    silently wrap out-of-range values into the header bits."""
    for kw in ({"window": 7}, {"window": 16}, {"literal": 4}, {"literal": 9}):
        with pytest.raises(ValueError):
            tamp_tpu.compress(b"x", **kw)
        with pytest.raises(ValueError):
            _native.native_compress(b"x", **kw)


def test_native_decoder_handles_garbage():
    for blob in (b"\xff\xff\xff", b"\x01", bytes(range(64))):
        try:
            _native.native_decompress(blob)
        except ValueError:
            pass


@pytest.mark.parametrize("window,literal", [(11, 8), (12, 8), (13, 8), (12, 5)])
def test_native_big_window_multi_cycle_parity(window, literal, ref_tamp, rng):
    """Big windows use the trigram-chain search (tampnative.cpp
    Committer::chain_search phase 1); drive the ring through several full
    wrap cycles so chain expiry and the head-adjacent trigram checks are
    exercised, and require byte parity with the reference encoder
    (reference: tamp/compressor.py greedy search semantics).  The (12, 5)
    case has min_pattern_size == 3, driving the trigram-only phase-1 path
    (no 2-byte phase 2) through the wrap cycles as well."""
    W = 1 << window
    text = (
        b"It was the best of times, it was the worst of times, it was the "
        b"age of wisdom, it was the age of foolishness. "
    )
    reps = (3 * W) // len(text) + 1
    base = (text * reps)[: 3 * W]
    # splice in runs and structure so RLE/extended interleave with matches
    data = base[: W // 2] + bytes([7] * 600) + base[W // 2 :] + bytes(
        rng.getrandbits(8) for _ in range(W // 4)
    )
    if literal < 8:  # literal-bit streams only carry bytes < 2**literal
        data = bytes(b & ((1 << literal) - 1) for b in data)
    for lazy in (False, True):
        ours = _native.native_compress(
            data, window=window, literal=literal, extended=True,
            lazy_matching=lazy
        )
        theirs = bytes(
            ref_tamp.compress(
                data, window=window, literal=literal, lazy_matching=lazy)
        )
        assert ours == theirs, (window, literal, lazy, len(data))
        assert bytes(_native.native_decompress(ours)) == data
