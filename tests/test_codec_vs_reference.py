"""Differential tests: tamp_tpu streaming codec vs the reference package.

Cross-implementation matrix in the style of the reference suite
(tests/test_compressor_decompressor.py:42-56): our encoder's output must be
byte-identical to the reference encoder at equal settings, every stream must
round-trip through both decoders, and reference-produced streams must decode
bit-exactly through ours.
"""

import io
import random

import pytest

import tamp_tpu

CONFIGS = [
    # (window, literal, extended, lazy)
    (10, 8, True, False),
    (10, 8, True, True),
    (10, 8, False, False),
    (10, 8, False, True),
    (8, 8, True, False),
    (12, 8, True, True),
    (15, 8, True, False),
    (9, 7, True, False),
    (10, 7, False, False),
    (11, 6, True, False),
    (8, 5, True, True),
    (13, 8, True, False),
]


def _data_suite(rng):
    tale = (
        b"It was the best of times, it was the worst of times, it was the age of "
        b"wisdom, it was the age of foolishness, it was the epoch of belief, it was "
        b"the epoch of incredulity, it was the season of Light, it was the season of "
        b"Darkness, it was the spring of hope, it was the winter of despair."
    )
    return [
        b"",
        b"f",
        b"foo foo foo",
        b"ababababababababababab" * 40,
        tale * 8,
        bytes(rng.getrandbits(8) for _ in range(4096)),          # 8-bit random
        bytes(rng.getrandbits(7) for _ in range(4096)),          # 7-bit random
        bytes(rng.getrandbits(6) for _ in range(2048)),
        bytes(rng.getrandbits(5) for _ in range(2048)),
        bytes([7] * 1000),                                       # long run -> RLE
        b"\x00" * 300 + tale + b"\x00" * 300,
        bytes(range(256)) * 16,                                  # sequential
        bytes(rng.choice(b"abcd") for _ in range(5000)),         # small alphabet
    ]


def _mask(data, literal):
    m = (1 << literal) - 1
    return bytes(b & m for b in data)


@pytest.mark.parametrize("window,literal,extended,lazy", CONFIGS)
def test_encode_matches_reference(window, literal, extended, lazy, ref_tamp, rng):
    from tamp.compressor import compress as ref_compress

    for data in _data_suite(rng):
        data = _mask(data, literal)
        ours = tamp_tpu.compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        theirs = ref_compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        assert ours == theirs, (window, literal, extended, lazy, len(data))


@pytest.mark.parametrize("window,literal,extended,lazy", CONFIGS)
def test_cross_decode(window, literal, extended, lazy, ref_tamp, rng):
    from tamp.compressor import compress as ref_compress
    from tamp.decompressor import decompress as ref_decompress

    for data in _data_suite(rng):
        data = _mask(data, literal)
        blob = ref_compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        # ours decodes reference streams bit-exactly
        assert bytes(tamp_tpu.decompress(blob)) == data
        # reference decodes our streams
        ours = tamp_tpu.compress(
            data, window=window, literal=literal, extended=extended, lazy_matching=lazy
        )
        assert bytes(ref_decompress(ours)) == data
        # and we round-trip ourselves
        assert bytes(tamp_tpu.decompress(ours)) == data


def test_streaming_chunked_writes_match_oneshot(ref_tamp, rng):
    data = bytes(rng.choice(b"the quick brown fox ") for _ in range(20000))
    one = tamp_tpu.compress(data)
    f = io.BytesIO()
    c = tamp_tpu.Compressor(f)
    i = 0
    r = random.Random(3)
    while i < len(data):
        n = r.randint(1, 97)
        c.write(data[i : i + n])
        i += n
    c.flush(write_token=False)
    assert f.getvalue() == one


def test_flush_token_mid_stream(ref_tamp):
    import tamp.compressor
    import tamp.decompressor

    data1 = b"hello world hello world"
    data2 = b" and hello again, world!"

    def run(mod_c):
        f = io.BytesIO()
        c = mod_c(f)
        c.write(data1)
        c.flush(write_token=True)
        c.write(data2)
        c.flush(write_token=False)
        return f.getvalue()

    ours = run(tamp_tpu.Compressor)
    theirs = run(tamp.compressor.Compressor)
    assert ours == theirs
    assert bytes(tamp_tpu.decompress(ours)) == data1 + data2
    assert bytes(tamp.decompressor.decompress(ours)) == data1 + data2


def test_double_flush_without_reset_is_inert(ref_tamp):
    # flush() twice in a row on a non-dictionary_reset stream must suppress
    # the second FLUSH token (no double-FLUSH signal).
    f = io.BytesIO()
    c = tamp_tpu.Compressor(f)
    c.write(b"abcabcabc")
    c.flush(write_token=True)
    c.flush(write_token=True)
    c.write(b"abcabcabc")
    c.flush(write_token=False)
    blob = f.getvalue()

    import tamp.compressor

    f2 = io.BytesIO()
    c2 = tamp.compressor.Compressor(f2)
    c2.write(b"abcabcabc")
    c2.flush(write_token=True)
    c2.flush(write_token=True)
    c2.write(b"abcabcabc")
    c2.flush(write_token=False)
    assert blob == f2.getvalue()
    assert bytes(tamp_tpu.decompress(blob)) == b"abcabcabc" * 2


def test_reset_dictionary_and_append(ref_tamp):
    import tamp.compressor
    import tamp.decompressor

    def run(mod):
        f = io.BytesIO()
        c = mod(f, dictionary_reset=True)
        c.write(b"first segment first segment")
        c.reset_dictionary()
        c.write(b"second segment second segment")
        c.close()
        return f.getvalue()

    ours = run(tamp_tpu.Compressor)
    theirs = run(tamp.compressor.Compressor)
    assert ours == theirs
    expected = b"first segment first segmentsecond segment second segment"
    assert bytes(tamp_tpu.decompress(ours)) == expected
    assert bytes(tamp.decompressor.decompress(ours)) == expected

    # Append mode: new compressor continues an existing dictionary_reset stream.
    def run_append(mod):
        f = io.BytesIO()
        c = mod(f, dictionary_reset=True, append=True)
        c.write(b"appended data appended data")
        c.close()
        return f.getvalue()

    ours2 = run_append(tamp_tpu.Compressor)
    theirs2 = run_append(tamp.compressor.Compressor)
    assert ours2 == theirs2
    combined = ours + ours2
    assert bytes(tamp_tpu.decompress(combined)) == expected + b"appended data appended data"


def test_custom_dictionary(ref_tamp):
    import tamp.compressor
    import tamp.decompressor

    dict_data = bytearray((b"the quick brown fox jumps over the lazy dog " * 24)[:1024])
    data = b"the quick brown fox says hello to the lazy dog"

    ours = tamp_tpu.compress(data, dictionary=bytearray(dict_data))
    theirs = tamp.compressor.compress(data, dictionary=bytearray(dict_data))
    assert ours == theirs
    assert bytes(tamp_tpu.decompress(ours, dictionary=bytearray(dict_data))) == data
    assert bytes(tamp.decompressor.decompress(ours, dictionary=bytearray(dict_data))) == data
    # Oversized dictionary buffers are allowed at decompression.
    big = bytearray(dict_data) + bytearray(512)
    assert bytes(tamp_tpu.decompress(ours, dictionary=big)) == data

    with pytest.raises(ValueError):
        tamp_tpu.decompress(ours)  # custom-dictionary stream without dictionary


def test_excess_bits_error():
    with pytest.raises(tamp_tpu.ExcessBitsError):
        tamp_tpu.compress(b"\xff", literal=7)


def test_reference_vectors_decode():
    """Decode the reference repo's on-device regression vectors."""
    import pathlib

    vec_dir = pathlib.Path("/root/reference/devices/vectors")
    if not vec_dir.is_dir():
        pytest.skip("vectors not available")

    # valid-small: must decode without error and round-trip through us.
    blob = (vec_dir / "valid-small.tamp.bin").read_bytes()
    out = tamp_tpu.decompress(blob)
    assert bytes(tamp_tpu.decompress(tamp_tpu.compress(bytes(out)))) == bytes(out)

    # all-ones / lone-header: well-formed prefixes; decoding must not crash.
    for name in ("lone-header.bin", "all-ones-64.bin"):
        data = (vec_dir / name).read_bytes()
        try:
            tamp_tpu.decompress(data)
        except (ValueError, EOFError):
            pass

    # truncated / garbage: must raise or return cleanly, never hang/crash.
    for name in ("truncated.bin", "random-garbage.bin"):
        data = (vec_dir / name).read_bytes()
        try:
            tamp_tpu.decompress(data)
        except (ValueError, EOFError):
            pass


def test_open_file_interface(tmp_path):
    p = tmp_path / "out.tamp"
    with tamp_tpu.open(p, "wb") as f:
        f.write(b"hello hello hello")
    with tamp_tpu.open(p, "rb") as f:
        assert bytes(f.read()) == b"hello hello hello"
    with tamp_tpu.open(p, "w") as f:
        f.write("text mode éè")
    with tamp_tpu.open(p, "r") as f:
        assert f.read() == "text mode éè"
    with pytest.raises(ValueError):
        tamp_tpu.open(p, "rw")


def test_readinto_partial_and_overflow(ref_tamp):
    data = b"abcdefgh" * 100
    blob = tamp_tpu.compress(data)
    d = tamp_tpu.Decompressor(io.BytesIO(blob))
    out = bytearray()
    while True:
        buf = bytearray(7)  # deliberately tiny, forces overflow splits
        got = d.readinto(buf)
        if not got:
            break
        out += buf[:got]
    assert bytes(out) == data
