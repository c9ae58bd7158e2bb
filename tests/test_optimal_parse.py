"""Optimal (minimum-bit) v1 parse: spec-conforming streams strictly <= the
greedy/reference size, decodable by every decoder (ours and the reference's).
This is a capability beyond the reference encoder — the v1 window is
tokenization-independent, so a DP over the exact match tables stays valid."""

import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.engine.encode import encode_v1
from tamp_tpu.exceptions import ExcessBitsError

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


@pytest.mark.parametrize("window,literal", [(8, 8), (10, 8), (12, 7), (15, 8)])
def test_native_tables_match_oracle(window, literal, rng):
    """The seeded chain-search table builder must stay element-exact against
    the NumPy oracle (longest match, lowest slot among ties) — the optimal
    parse's correctness rests on it."""
    import numpy as np

    from tamp_tpu.engine.encode import model_history
    from tamp_tpu.engine.search_np import match_tables
    from tamp_tpu.constants import compute_min_pattern_size

    mask = (1 << literal) - 1
    raw = (b"table parity corpus abcabcabc " * 50
           + bytes(rng.randrange(256) for _ in range(2000))
           + b"\x00" * 300 + b"tail tail tail " * 20)
    data = bytes(b & mask for b in raw)
    arr = np.frombuffer(data, np.uint8)
    dict_arr, _ = model_history(arr, window, literal, False, None)
    t = match_tables(arr, dict_arr, window)
    minp = compute_min_pattern_size(window, literal)
    cap = min(16, minp + 13)
    ofl, ofi = (t.len16, t.idx16) if cap == 16 else (t.len15, t.idx15)
    nfl, nfi = _native.native_v1_tables(
        arr, window, literal, cap, dictionary=dict_arr.tobytes())
    m = ofl >= minp
    assert np.array_equal(np.where(ofl < minp, 0, ofl), nfl)
    assert np.array_equal(ofi[m], nfi[m])


@pytest.mark.parametrize("window,literal", [(10, 8), (8, 8), (12, 7), (9, 5)])
def test_optimal_le_greedy_and_roundtrips(window, literal, rng, ref_tamp):
    mask = (1 << literal) - 1
    base = b"optimal parse differential corpus -- some repeats repeats " * 40
    data = bytes(b & mask for b in base) + bytes(
        rng.randrange(1 << literal) for _ in range(1200))
    greedy = encode_v1(data, window=window, literal=literal)
    lazy = encode_v1(data, window=window, literal=literal, lazy_matching=True)
    opt = encode_v1(data, window=window, literal=literal, parse="optimal")
    assert len(opt) <= len(greedy)
    assert len(opt) <= len(lazy)  # DP dominates the lazy heuristic too
    assert bytes(ref_tamp.decompress(opt)) == data
    assert bytes(tamp_tpu.decompress(opt)) == data
    assert bytes(_native.native_decompress(opt)) == data


def test_optimal_with_custom_dictionary(rng, ref_tamp):
    W = 1 << 10
    dictv = bytes(rng.randrange(256) for _ in range(W))
    data = dictv[100:400] + b" body reusing dictionary bytes " * 20
    opt = encode_v1(data, window=10, parse="optimal", dictionary=dictv)
    plain = encode_v1(data, window=10, parse="optimal")
    assert len(opt) < len(plain)  # the dictionary must actually help
    assert bytes(ref_tamp.decompress(opt, dictionary=bytearray(dictv))) == data


def test_optimal_excess_bits():
    with pytest.raises(ExcessBitsError):
        encode_v1(b"ab\x90xy", window=10, literal=7, parse="optimal")


def test_optimal_empty_and_tiny(ref_tamp):
    for d in (b"", b"q", b"ab" * 4):
        opt = encode_v1(d, window=10, parse="optimal")
        assert bytes(ref_tamp.decompress(opt)) == d


@pytest.mark.parametrize("window,literal", [(10, 8), (8, 8), (12, 7)])
def test_extended_optimal_roundtrips(window, literal, rng, ref_tamp):
    from tamp_tpu.engine.encode import encode_extended_optimal

    mask = (1 << literal) - 1
    base = (b"extended optimal corpus with long long long repeats " * 60
            + b"\x00" * 500)
    data = bytes(b & mask for b in base) + bytes(
        rng.randrange(1 << literal) for _ in range(1000))
    opt = encode_extended_optimal(data, window=window, literal=literal)
    assert bytes(ref_tamp.decompress(opt)) == data
    assert bytes(tamp_tpu.decompress(opt)) == data
    assert bytes(_native.native_decompress(opt)) == data


def test_extended_optimal_beats_lazy_on_text(ref_tamp):
    from tamp_tpu.engine.encode import encode_extended_optimal

    data = open("/root/reference/README.md", "rb").read()
    opt = encode_extended_optimal(data, window=10)
    lazy = bytes(_native.native_compress(
        data, window=10, extended=True, lazy_matching=True))
    assert len(opt) < len(lazy)
    assert bytes(ref_tamp.decompress(opt)) == data


def test_extended_optimal_custom_dictionary(rng, ref_tamp):
    from tamp_tpu.engine.encode import encode_extended_optimal

    W = 1 << 10
    dictv = bytes(rng.randrange(256) for _ in range(W))
    data = dictv[50:420] + b" extended body reusing dictionary " * 25
    opt = encode_extended_optimal(data, window=10, dictionary=dictv)
    plain = encode_extended_optimal(data, window=10)
    assert len(opt) < len(plain)
    assert bytes(ref_tamp.decompress(opt, dictionary=bytearray(dictv))) == data


def test_extended_optimal_empty_and_tiny(ref_tamp):
    from tamp_tpu.engine.encode import encode_extended_optimal

    for d in (b"", b"q", b"ab" * 4):
        assert bytes(ref_tamp.decompress(encode_extended_optimal(d))) == d


def test_top_level_compress_optimal(ref_tamp):
    data = b"top level optimal dispatch " * 80
    for kw in ({"parse": "optimal"}, {"parse": "optimal", "extended": False},
               {"parse": "optimal", "window": 12, "lazy_matching": True}):
        blob = tamp_tpu.compress(data, **kw)
        assert bytes(ref_tamp.decompress(blob)) == data
    assert len(tamp_tpu.compress(data, parse="optimal")) <= len(
        tamp_tpu.compress(data))


def test_cli_optimal(tmp_path):
    import subprocess
    import sys

    data = b"cli optimal corpus " * 120
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "o.tamp"
    back = tmp_path / "b.bin"
    subprocess.run(
        [sys.executable, "-m", "tamp_tpu", "compress", str(src), "-o",
         str(out), "--optimal"], check=True)
    subprocess.run(
        [sys.executable, "-m", "tamp_tpu", "decompress", str(out), "-o",
         str(back)], check=True)
    assert back.read_bytes() == data
    greedy = encode_v1(data, window=10)
    assert len(out.read_bytes()) <= len(greedy)


def test_device_optimal_v1_pipeline_byte_parity(rng):
    """The fully on-chip optimal v1 pipeline (Pallas search -> blocked
    min-plus DP -> fields -> commit kernel, interpret on CPU) must be
    byte-identical to encode_v1(parse="optimal") — identical DP tie-breaks
    (literal first, ascending size, strictly-less) and identical emission —
    and round-trip through the native decoder."""
    import sys

    import numpy as np

    sys.path.insert(0, "tests")
    from test_encode_ext_device import _gen

    from tamp_tpu import _native
    from tamp_tpu.engine.pipeline import encode_v1_device_optimal

    r = np.random.default_rng(13)
    for w, lit in ((8, 8), (10, 8), (12, 6)):
        lmask = (1 << lit) - 1
        shards = [_gen(r, k, int(r.integers(100, 2500)), lmask)
                  for k in range(4)] + [b"", bytes([2]) * 1500]
        outs = encode_v1_device_optimal(shards, window=w, literal=lit,
                                        interpret=True)
        for s, o in zip(shards, outs):
            want = encode_v1(s, window=w, literal=lit, parse="optimal")
            assert o == want, (w, lit, len(s))
            if _native.available():
                assert bytes(_native.native_decompress(o)) == s


def test_device_optimal_dp_matches_native_choice(rng):
    """The blocked min-plus DP alone (ops/opt_parse) against the native
    DP's token chain, across block-boundary geometry (sizes straddling the
    B=1024 blocks and the K=16 basis window)."""
    import numpy as np

    from tamp_tpu import _native
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.ops.opt_parse import opt_v1_choice_device

    if not _native.available():
        import pytest

        pytest.skip("native engine unavailable")
    import jax.numpy as jnp

    r = np.random.default_rng(29)
    w, lit = 10, 8
    d = dictionary_array(1 << w, literal=8)
    for n in (1, 15, 16, 17, 1023, 1024, 1025, 2048 + 17, 5000):
        data = bytes(r.choice([97, 98, 99, 32]) for _ in range(n))
        arr = np.frombuffer(data, np.uint8)
        flen, fidx = _native.native_v1_tables(arr, w, lit, 16,
                                              dictionary=d.tobytes())
        sizes = _native.native_opt_v1_plan(arr, flen, fidx, w, lit)
        NP = 1 << max(10, (n - 1).bit_length())
        fl = np.zeros((1, NP), np.int32)
        fl[0, :n] = flen
        db = np.zeros((1, NP), np.uint8)
        db[0, :n] = arr
        ch, _, bad = opt_v1_choice_device(
            jnp.asarray(fl), jnp.asarray(db),
            jnp.asarray(np.asarray([n], np.int32)),
            window=w, literal=lit, NP=NP)
        ch = np.asarray(ch)[0]
        assert not bool(np.asarray(bad)[0])
        got, t = [], 0
        while t < n:
            got.append(int(ch[t]))
            t += int(ch[t])
        assert got == list(sizes), n


def test_device_ext_optimal_byte_parity():
    """The device-side EXTENDED optimal DP (ops/opt_parse_ext: full
    K=maxpat lookback, U-unrolled blocked min-plus, forced-RLE weight
    chains) must be byte-identical to encode_extended_optimal across
    windows, literals, custom dictionaries, corpus classes, and the
    B=1024 / K=134 block-boundary geometry, and every stream must decode
    in the reference implementation."""
    import sys

    import numpy as np

    import tamp_tpu
    from tamp_tpu import _native
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.engine.encode import encode_extended_optimal
    from tamp_tpu.engine.pipeline_ext import encode_ext_device_optimal

    if not _native.available():
        import pytest

        pytest.skip("native engine unavailable")
    sys.path.insert(0, "/root/reference")
    try:
        import tamp as ref
    except Exception:
        ref = None
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(77)

    def gen(kind, n, lmask=255):
        if kind == 0:  # run-heavy: forced regions + chunk splits
            out, tot = [], 0
            while tot < n:
                c = int(rng.integers(1, 500))
                out.append(bytes([int(rng.integers(0, 6)) & lmask]) * c)
                tot += c
            return b"".join(out)[:n]
        if kind == 1:  # periodic: ext matches vs ring-end room caps
            p = bytes(int(x) & lmask for x in
                      rng.integers(0, 256, int(rng.integers(2, 30))))
            return (p * (n // len(p) + 1))[:n]
        if kind == 2:
            words = [bytes(int(x) & lmask
                           for x in rng.integers(97, 123, int(k)))
                     for k in rng.integers(2, 9, 64)]
            return bytes([1 & lmask]).join(
                words[int(i) % 64]
                for i in rng.integers(0, 64, max(n // 4, 4)))[:n]
        return bytes(int(x) & lmask for x in rng.integers(0, 256, n))

    cases = []
    for window, literal in [(8, 8), (10, 8), (11, 6), (12, 8)]:
        lmask = (1 << literal) - 1
        for kind in range(4):
            n = int(rng.integers(300, min((1 << window) * 3, 5000)))
            dct = None
            if kind == 1:
                base = dictionary_array(1 << window, literal=literal)
                dct = bytes(((base.astype(np.int32) + 1)
                             % (lmask + 1)).astype(np.uint8))
            cases.append((window, literal, gen(kind, n, lmask), dct))
    for n in (1023, 1024, 1025, 1024 + 134, 2048 + 133):
        cases.append((10, 8, gen(2, n), None))
    cases.append((10, 8, b"", None))

    for window, literal, s, dct in cases:
        got = encode_ext_device_optimal(
            [s], window=window, literal=literal, dictionary=dct)[0]
        want = encode_extended_optimal(
            s, window=window, literal=literal, dictionary=dct)
        assert got == want, (window, literal, len(s))
        assert bytes(tamp_tpu.decompress(got, dictionary=dct)) == s
        if ref is not None and dct is None:
            assert bytes(ref.decompress(got)) == s


def test_device_ext_optimal_container():
    """Container engine='device-optimal' with extended=True: byte-equal to
    the host optimal container and round-trips."""
    import numpy as np

    from tamp_tpu import _native
    from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded

    if not _native.available():
        import pytest

        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(5)
    words = [bytes(rng.integers(97, 123, int(k)))
             for k in rng.integers(2, 9, 64)]
    data = (b" ".join(words[int(i) % 64]
                      for i in rng.integers(0, 64, 3000))
            + bytes([9]) * 500)
    blob = compress_sharded(data, shard_size=4096, engine="device-optimal",
                            extended=True)
    want = compress_sharded(data, shard_size=4096, engine="optimal",
                            extended=True)
    assert blob == want
    assert bytes(decompress_sharded(blob)) == data
