"""Format-core tests: dictionary init, min-pattern table, bit I/O, huffman."""

import io

import pytest

from tamp_tpu import bit_size, compute_min_pattern_size, initialize_dictionary
from tamp_tpu.bitio import BitReader, BitWriter
from tamp_tpu.constants import (
    HUFFMAN_CODES,
    HUFFMAN_DECODE_TABLE,
    HUFFMAN_LENGTHS,
    NUM_SYMBOLS,
)

# Golden value from the reference suite (tests/test_pseudorandom.py:22-24):
# the first 256 bytes of the default-seed dictionary.
_EXPECTED_256 = bytearray(
    b"\x00.//r.0. t>\n/>snas.trnr i\x00r/a\x00snat./.r\x00i o.s tneo>.as>\na.ta\x00 aa\x00\x00\x00"
    b"0oe ri\x00a>eatsi\n.\ni.str\n//snesr.ost<  \x00\ni\neoa\x00se0.o\n\n>aori>n0.>./.oo"
    b"nen0<\x00<r o\n\naas0< ai\n0\x00na\x00e><.\noas to \n></se>>ts/oreatinter.n0 >s\n/."
    b"e.><. r si<>/<san\x00ae t 0.r.o/0./a r/ttn nn.<re.t0 \x00r\x00ro"
)


class TestDictionary:
    def test_golden_256(self):
        assert initialize_dictionary(256) == _EXPECTED_256

    def test_inplace(self):
        buf = bytearray(256)
        out = initialize_dictionary(buf)
        assert out is buf
        assert buf == _EXPECTED_256

    def test_zero_seed(self):
        assert initialize_dictionary(256, seed=0) == bytearray(256)

    def test_nonzero_seed_differs(self):
        assert initialize_dictionary(256, seed=1) != bytearray(256)
        assert initialize_dictionary(256, seed=1) != _EXPECTED_256

    def test_matches_reference_all_literals_sizes(self, ref_tamp):
        for literal in (5, 6, 7, 8):
            for size in (256, 1024, 4096):
                assert initialize_dictionary(size, literal=literal) == ref_tamp.initialize_dictionary(
                    size, literal=literal
                ), (literal, size)

    def test_invalid_literal(self):
        with pytest.raises(ValueError):
            initialize_dictionary(256, literal=4)
        with pytest.raises(ValueError):
            initialize_dictionary(256, literal=9)


class TestMinPatternSize:
    def test_table_vs_reference(self, ref_tamp):
        for w in range(8, 16):
            for l in range(5, 9):
                assert compute_min_pattern_size(w, l) == ref_tamp.compute_min_pattern_size(w, l)

    def test_bounds(self):
        for bad in ((7, 8), (16, 8), (10, 4), (10, 9)):
            with pytest.raises(ValueError):
                compute_min_pattern_size(*bad)

    def test_known_values(self):
        assert compute_min_pattern_size(10, 8) == 2
        assert compute_min_pattern_size(15, 8) == 2
        assert compute_min_pattern_size(15, 5) == 3
        assert compute_min_pattern_size(8, 5) == 2
        assert compute_min_pattern_size(11, 5) == 3


class TestBitSize:
    def test_values(self):
        assert bit_size(0) == 0
        assert bit_size(1) == 1
        assert bit_size(255) == 8
        assert bit_size(256) == 9
        assert bit_size((1 << 31) - 1) == 31
        assert bit_size((1 << 32) - 1) == -1  # out of 32-bit range


class TestBitIO:
    def test_round_trip_patterns(self, rng):
        f = io.BytesIO()
        w = BitWriter(f)
        fields = []
        for _ in range(2000):
            nbits = rng.randint(1, 24)
            value = rng.getrandbits(nbits)
            fields.append((value, nbits))
            w.write(value, nbits)
        w.flush(write_token=False)
        f.seek(0)
        r = BitReader(f)
        for value, nbits in fields:
            assert r.read(nbits) == value

    def test_msb_first(self):
        f = io.BytesIO()
        w = BitWriter(f)
        w.write(0b1, 1)
        w.write(0b0101, 4)
        w.write(0b011, 3)
        assert f.getvalue() == bytes([0b10101011])

    def test_flush_pads_with_zeros(self):
        f = io.BytesIO()
        w = BitWriter(f)
        w.write(0b11, 2)
        w.flush(write_token=False)
        assert f.getvalue() == bytes([0b11000000])

    def test_flush_token(self):
        f = io.BytesIO()
        w = BitWriter(f)
        w.write(0b1, 1)
        w.flush(write_token=True)
        # 1 + FLUSH(010101011) + 6 pad bits
        assert f.getvalue() == bytes([0b10101010, 0b11000000])

    def test_flush_noop_when_aligned(self):
        f = io.BytesIO()
        w = BitWriter(f)
        w.write(0xAB, 8)
        assert w.flush(write_token=True) == 0
        assert f.getvalue() == b"\xab"

    def test_flush_force_token_when_aligned(self):
        f = io.BytesIO()
        w = BitWriter(f)
        w.write(0xFF, 8)
        w.flush(write_token=True, force_token=True)
        assert f.getvalue() == bytes([0xFF, 0b01010101, 0b10000000])

    def test_reader_transaction_rollback(self):
        f = io.BytesIO(bytes([0b10110011, 0b01010101]))
        r = BitReader(f)
        assert r.read(3) == 0b101
        try:
            with r:
                assert r.read(5) == 0b10011
                r.read(12)  # only 8 bits remain -> EOF
                raise AssertionError("expected EOFError")
        except EOFError:
            pass
        # rolled back: the 5 bits (and buffered byte) are readable again
        assert r.read(5) == 0b10011
        assert r.read(8) == 0b01010101

    def test_reader_eof(self):
        r = BitReader(io.BytesIO(b""))
        with pytest.raises(EOFError):
            r.read(1)


class TestHuffman:
    def test_codes_are_prefix_free(self):
        codes = []
        for s in range(NUM_SYMBOLS):
            n = HUFFMAN_LENGTHS[s] - 1
            code = HUFFMAN_CODES[s] & ((1 << n) - 1)
            codes.append(format(code, f"0{n}b"))
        for i, a in enumerate(codes):
            for j, b in enumerate(codes):
                if i != j:
                    assert not b.startswith(a), (i, j)

    def test_decode_table_complete_and_consistent(self):
        for word in range(256):
            sym, nbits = HUFFMAN_DECODE_TABLE[word]
            assert 0 <= sym < NUM_SYMBOLS
            n = HUFFMAN_LENGTHS[sym] - 1
            assert nbits == n
            code = HUFFMAN_CODES[sym] & ((1 << n) - 1)
            assert word >> (8 - n) == code
