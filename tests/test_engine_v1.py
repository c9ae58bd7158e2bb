"""Vectorized v1 engine: byte-parity vs the reference and the streaming codec."""

import numpy as np
import pytest

import tamp_tpu
from tamp_tpu.engine import encode_v1
from tamp_tpu.engine.search_np import match_tables
from tamp_tpu.ops.bitpack import pack_bits_np


def _datasets(rng):
    text = (
        b"It was the best of times, it was the worst of times, it was the age "
        b"of wisdom, it was the age of foolishness. " * 30
    )
    return [
        b"",
        b"a",
        b"foo foo foo",
        text,
        bytes(rng.getrandbits(8) for _ in range(3000)),
        bytes(rng.choice(b"abcde") for _ in range(6000)),
        bytes([3] * 700),
        bytes(range(256)) * 12,
        bytes(rng.choice(b"ab") for _ in range(4000)),
    ]


class TestBitpack:
    def test_matches_bitwriter(self, rng):
        import io

        from tamp_tpu.bitio import BitWriter

        fields = []
        for _ in range(5000):
            n = rng.randint(1, 24)
            fields.append((rng.getrandbits(n), n))
        f = io.BytesIO()
        w = BitWriter(f)
        for v, n in fields:
            w.write(v, n)
        w.flush(write_token=False)
        packed, total = pack_bits_np(
            np.array([v for v, _ in fields], np.uint64),
            np.array([n for _, n in fields], np.int64),
        )
        assert packed == f.getvalue()
        assert total == sum(n for _, n in fields)

    def test_empty(self):
        assert pack_bits_np(np.array([], np.uint64), np.array([], np.int64)) == (b"", 0)


class TestSearchOracle:
    """Differential test of the parallel search vs an exhaustive ring scan."""

    def _exhaustive(self, C, data, t, W, cap, minp):
        tau = t % W
        ring = bytes(C[W + t - tau : W + t].tobytes() + C[t : t + W - tau].tobytes())
        target = bytes(data[t : t + cap].tobytes())
        limit = min(len(target), cap)
        size = minp
        if limit < minp:
            return 0, 0
        idx = ring.find(target[:size])
        if idx < 0:
            return 0, size - 1
        while size < limit:
            nxt = ring.find(target[: size + 1], idx)
            if nxt < 0:
                break
            idx = nxt
            size += 1
        return idx, size

    @pytest.mark.parametrize("window", [8, 10])
    def test_vs_exhaustive(self, window, rng):
        from tamp_tpu.dictionary import dictionary_array

        W = 1 << window
        # Data long enough to wrap the ring several times, with heavy repeats.
        data = np.frombuffer(
            bytes(rng.choice(b"abcab") for _ in range(3 * W + 37)), dtype=np.uint8
        )
        dict_arr = dictionary_array(W, literal=8)
        C = np.concatenate([dict_arr, data])
        tables = match_tables(data, dict_arr, window, chunk_rows=97)
        for cap, lens, idxs in ((15, tables.len15, tables.idx15), (16, tables.len16, tables.idx16)):
            for t in range(0, len(data) - 16):
                idx, size = self._exhaustive(C, data, t, W, cap, 2)
                got_len, got_idx = int(lens[t]), int(idxs[t])
                if size < 2:
                    assert got_len < 2, (t, got_len, size)
                else:
                    assert (got_len, got_idx) == (size, idx), (t, got_len, got_idx, size, idx)


@pytest.mark.parametrize("window,literal,lazy", [
    (10, 8, False),
    (10, 8, True),
    (8, 8, False),
    (12, 8, True),
    (11, 5, False),   # min_pattern = 3 -> full cap 16
    (15, 7, False),   # min_pattern = 3, large window
    (9, 7, True),
])
def test_encode_v1_byte_parity(window, literal, lazy, ref_tamp, rng):
    from tamp.compressor import compress as ref_compress

    mask = (1 << literal) - 1
    for data in _datasets(rng):
        data = bytes(b & mask for b in data)
        ours = encode_v1(data, window=window, literal=literal, lazy_matching=lazy)
        theirs = ref_compress(
            data, window=window, literal=literal, extended=False, lazy_matching=lazy
        )
        assert ours == theirs, (window, literal, lazy, len(data))
        assert bytes(tamp_tpu.decompress(ours)) == data


def test_encode_v1_custom_dictionary(ref_tamp):
    from tamp.compressor import compress as ref_compress

    d = bytearray((b"lorem ipsum dolor sit amet " * 40)[:1024])
    data = b"lorem ipsum dolor sit amet, consectetur adipiscing elit"
    ours = encode_v1(data, dictionary=bytearray(d))
    theirs = ref_compress(data, extended=False, dictionary=bytearray(d))
    assert ours == theirs
    assert bytes(tamp_tpu.decompress(ours, dictionary=bytearray(d))) == data


def test_encode_v1_excess_bits():
    with pytest.raises(tamp_tpu.ExcessBitsError):
        encode_v1(b"\x80", literal=7)


def test_pack_bits_jnp_matches_np(rng):
    import numpy as np

    from tamp_tpu.ops.bitpack import pack_bits_jnp, pack_bits_np

    for trial in range(4):
        n = rng.randrange(1, 400)
        nbits = np.array([rng.randrange(1, 21) for _ in range(n)], np.int64)
        values = np.array(
            [rng.getrandbits(int(b)) for b in nbits], np.uint64
        )
        ref, total = pack_bits_np(values, nbits)
        max_bytes = len(ref) + 8
        dev, dev_total = pack_bits_jnp(
            np.asarray(values, np.uint32), np.asarray(nbits, np.int32), max_bytes
        )
        assert int(dev_total) == total
        assert bytes(np.asarray(dev)[: len(ref)].tobytes()) == ref
