"""Wavefront device decoder (ops/decode_wavefront) parity vs the native decoder.

The wavefront kernel is the device port of the parallel-decode formulation
oracled by ``engine/pdecode_np``; these tests pin it byte-identical to
``_native.native_decompress`` across the config lattice, flush/reset flows,
custom dictionaries, grouped multi-shard calls, and corrupted streams
(exception-for-exception where the native decoder rejects the stream).

Runs on the virtual CPU mesh (conftest); the same jitted program serves TPU.
"""

import io

import jax
import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.ops.decode_wavefront import decode_shards_wavefront

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def _native_or_exc(comp, dictionary=None):
    try:
        return bytes(_native.native_decompress(comp, dictionary=dictionary)), None
    except Exception as e:  # noqa: BLE001 - differential oracle
        return None, type(e)


def _wave(comp, dictionary=None, max_out=None):
    return decode_shards_wavefront(
        [comp], dictionary=dictionary, max_out=max_out)[0]


def _check(comp, dictionary=None):
    want, want_exc = _native_or_exc(comp, dictionary)
    if want_exc is not None:
        with pytest.raises(Exception):
            _wave(comp, dictionary=dictionary, max_out=1 << 20)
    else:
        got = _wave(comp, dictionary=dictionary,
                    max_out=max(len(want) + 64, 1024))
        assert got == want


@pytest.mark.parametrize("window,literal,extended", [
    (8, 8, True), (10, 8, True), (10, 8, False), (11, 5, True),
    (12, 7, True), (15, 8, True), (13, 6, False),
])
def test_config_lattice_parity(window, literal, extended, rng):
    base = b"wavefront decoder corpus -- tokens of every kind " * 30
    mask = (1 << literal) - 1
    data = bytes(b & mask for b in base) + bytes(
        rng.randrange(1 << literal) for _ in range(1500))
    comp = bytes(_native.native_compress(
        data, window=window, literal=literal, extended=extended))
    _check(comp)


def test_flush_and_reset_flows(rng):
    data = bytes(rng.choice(b"flush reset data ") for _ in range(5000))
    buf = io.BytesIO()
    c = tamp_tpu.Compressor(buf, window=10, dictionary_reset=True)
    third = len(data) // 3
    c.write(data[:third])
    c.flush(write_token=True)
    c.write(data[third:2 * third])
    c.reset_dictionary()
    c.write(data[2 * third:])
    c.flush(write_token=True)
    c.reset_dictionary()
    c.close()
    _check(buf.getvalue())


def test_rle_heavy_and_window_truncation():
    # long runs force RLE window-write truncation at the ring edge; the
    # deficit while_loop must model the <=8-byte no-wrap writes
    # (reference decompressor.c decode_rle / decode_extended_match)
    data = b"\x00" * 4000 + b"ab" * 600 + b"\xff" * 999 + b"tail" + b"\x00" * 9
    for w in (8, 9, 10):
        _check(tamp_tpu.compress(data, window=w))


def test_custom_and_oversized_dictionaries(rng):
    W = 1 << 10
    dictv = bytes(rng.randrange(256) for _ in range(W))
    data = b"custom dictionary stream " * 120
    comp = tamp_tpu.compress(data, window=10, dictionary=bytearray(dictv))
    _check(comp, dictionary=dictv)
    # oversized: only the first W bytes are the window
    big = dictv + bytes(rng.randrange(256) for _ in range(512))
    _check(comp, dictionary=big)


def test_custom_dict_reset_reverts_to_default(rng):
    dictv = bytes(rng.randrange(256) for _ in range(1 << 10))
    data = b"reset reverts to the default dictionary " * 60
    buf = io.BytesIO()
    c = tamp_tpu.Compressor(
        buf, window=10, dictionary=bytearray(dictv), dictionary_reset=True)
    c.write(data)
    c.reset_dictionary()
    c.write(data)
    c.close()
    _check(buf.getvalue(), dictionary=dictv)


def test_empty_and_tiny():
    _check(tamp_tpu.compress(b""))
    _check(tamp_tpu.compress(b"a"))
    _check(tamp_tpu.compress(b"ab" * 3))


def test_grouped_multi_shard_call(rng):
    datas = [bytes(rng.choice(b"shard body text ") for _ in range(n))
             for n in (0, 1, 700, 2500, 64, 4096)]
    comps = [tamp_tpu.compress(d, window=10) for d in datas]
    got = decode_shards_wavefront(comps, max_out=5000)
    assert got == datas
    # small group budget forces multiple device calls
    got2 = decode_shards_wavefront(
        comps, max_out=5000, group_payload_bytes=1024)
    assert got2 == datas


def test_corrupted_and_truncated_streams(rng):
    for trial in range(60):
        data = bytes(rng.choice(b"abcdef measure ")
                     for _ in range(rng.randrange(1, 2000)))
        comp = bytearray(tamp_tpu.compress(data, window=rng.choice([8, 10, 12])))
        op = rng.random()
        if op < 0.45:
            for _ in range(rng.randrange(1, 5)):
                comp[rng.randrange(len(comp))] ^= 1 << rng.randrange(8)
        elif op < 0.75:
            comp = comp[: rng.randrange(len(comp) + 1)]
        if not comp:
            continue
        _check(bytes(comp))


def test_pallas_chase_matches_xla_table(rng):
    """The Pallas sequential-chase boundary kernel (interpret mode here;
    compiled on TPU) produces the exact token table of the XLA
    doubling+scan+walks path, and the chase-driven full batch decodes
    byte-identically — including ragged multi-shard batches, FLUSH
    alignment, and trailing-incomplete-token drops."""
    import numpy as np
    import jax.numpy as jnp

    from tamp_tpu.ops import decode_wavefront as wf
    from tamp_tpu.ops.token_chase_pallas import token_table_chase

    payloads = []
    raws = []
    for n in (0, 1, 700, 5000):
        raw = bytes(rng.randbytes(max(n // 3, 1))) + b"chase kernel " * (n // 13)
        raw = raw[: max(n, 1)]
        blob = tamp_tpu.compress(raw, window=10, literal=8)
        raws.append(raw)
        payloads.append(blob[1:])
    # a flushed stream (byte-align token mid-stream)
    f = io.BytesIO()
    c = tamp_tpu.Compressor(f, window=10)
    c.write(b"flush one ")
    c.flush(write_token=True)
    c.write(b"flush two " * 9)
    c.flush(write_token=False)
    raws.append(b"flush one " + b"flush two " * 9)
    payloads.append(f.getvalue()[1:])

    L = wf._pow2_bucket(max(len(p) for p in payloads), 64)
    NBP = 8 * L
    T_max = NBP // 9 + 2
    S = len(payloads)
    blobs = np.zeros((S, L + 8), np.uint32)
    nbytes = np.zeros(S, np.int32)
    for i, p in enumerate(payloads):
        blobs[i, : len(p)] = np.frombuffer(p, np.uint8)
        nbytes[i] = len(p)

    nxt, _k, _c, _i, _inv, inc = jax.vmap(
        lambda b, n: wf._speculative_parse(b, n * 8, NBP, 10, 8, True)
    )(jnp.asarray(blobs), jnp.asarray(nbytes))
    s_ref, t_ref = jax.vmap(
        lambda n, i: wf._token_table(n, i, NBP, 8, T_max))(nxt, inc)
    s_new, t_new = token_table_chase(nxt, NBP, T_max, interpret=True)
    assert bool(jnp.all(t_ref == t_new))
    assert bool(jnp.all(s_ref == s_new))

    from tamp_tpu.dictionary import dictionary_array

    d = jnp.asarray(dictionary_array(1024, literal=8).astype(np.int32))
    max_out = wf._pow2_bucket(max(len(r) for r in raws), 1024)
    kw = dict(NBP=NBP, window=10, literal=8, extended=True, more=False,
              max_out=max_out)
    o1, l1, e1 = wf._wavefront_batch(
        jnp.asarray(blobs), jnp.asarray(nbytes), d, d, mode="xla", **kw)
    for mode in ("chase", "commit"):
        o2, l2, e2 = wf._wavefront_batch(
            jnp.asarray(blobs), jnp.asarray(nbytes), d, d, mode=mode, **kw)
        assert bool(jnp.all(o1 == o2)) and bool(jnp.all(l1 == l2)), mode
        assert bool(jnp.all(e1 == e2)), mode
        for i, raw in enumerate(raws):
            assert bytes(np.asarray(o2[i, : int(l2[i])], np.uint8)) == raw


def test_commit_mode_resets_dicts_and_errors(rng):
    """Stream-commit kernel (interpret) vs XLA on the tricky flows: custom
    dictionaries (init != reset), double-FLUSH dictionary resets on
    more_header streams, small windows, and OOB/corrupt streams."""
    import numpy as np
    import jax.numpy as jnp

    import tamp_tpu
    from tamp_tpu._native.stream import NativeCompressor
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.ops import decode_wavefront as wf

    # a dictionary_reset stream: header + data, double-FLUSH, more data
    f = io.BytesIO()
    c = NativeCompressor(f, window=10, literal=8, extended=True,
                         dictionary_reset=True)
    c.write(b"first segment first segment " * 8)
    c.reset_dictionary()
    c.write(b"second segment second segment " * 8)
    c.flush(write_token=False)
    stream = f.getvalue()
    want = bytes(_native.native_decompress(stream))

    payload = stream[2:]  # header + reserved byte
    L = wf._pow2_bucket(len(payload), 64)
    NBP = 8 * L
    blobs = np.zeros((1, L + 8), np.uint32)
    blobs[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    d = jnp.asarray(dictionary_array(1024, literal=8).astype(np.int32))
    kw = dict(NBP=NBP, window=10, literal=8, extended=True, more=True,
              max_out=wf._pow2_bucket(len(want), 1024))
    nbs = jnp.asarray([len(payload)], np.int32)
    o1, l1, e1 = wf._wavefront_batch(
        jnp.asarray(blobs), nbs, d, d, mode="xla", **kw)
    o2, l2, e2 = wf._wavefront_batch(
        jnp.asarray(blobs), nbs, d, d, mode="commit", **kw)
    assert bool(jnp.all(o1 == o2)) and int(l1[0]) == int(l2[0])
    assert bytes(np.asarray(o2[0, : int(l2[0])], np.uint8)) == want

    # small window + narrow literal config through commit
    data = bytes(b & 31 for b in b"abcabcabc config sweep " * 20)
    blob = tamp_tpu.compress(data, window=8, literal=5)
    payload = blob[1:]
    L = wf._pow2_bucket(len(payload), 64)
    NBP = 8 * L
    blobs = np.zeros((1, L + 8), np.uint32)
    blobs[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    d8 = jnp.asarray(dictionary_array(256, literal=5).astype(np.int32))
    kw = dict(NBP=NBP, window=8, literal=5, extended=True, more=False,
              max_out=1024)
    o1, l1, _ = wf._wavefront_batch(
        jnp.asarray(blobs), jnp.asarray([len(payload)], np.int32),
        d8, d8, mode="xla", **kw)
    o2, l2, _ = wf._wavefront_batch(
        jnp.asarray(blobs), jnp.asarray([len(payload)], np.int32),
        d8, d8, mode="commit", **kw)
    assert bool(jnp.all(o1 == o2))
    assert bytes(np.asarray(o2[0, : int(l2[0])], np.uint8)) == data

    # OOB error parity: craft a match referencing past the window
    from tamp_tpu.ops.decode_wavefront import ERR_OK

    bad = tamp_tpu.compress(b"zqx" * 400, window=10, literal=8)
    corrupted = bytearray(bad)
    corrupted[len(corrupted) // 2] ^= 0x5A
    payload = bytes(corrupted[1:])
    L = wf._pow2_bucket(len(payload), 64)
    NBP = 8 * L
    blobs = np.zeros((1, L + 8), np.uint32)
    blobs[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    kw = dict(NBP=NBP, window=10, literal=8, extended=True, more=False,
              max_out=4096)
    d10 = jnp.asarray(dictionary_array(1024, literal=8).astype(np.int32))
    _, _, e1 = wf._wavefront_batch(
        jnp.asarray(blobs), jnp.asarray([len(payload)], np.int32),
        d10, d10, mode="xla", **kw)
    _, _, e2 = wf._wavefront_batch(
        jnp.asarray(blobs), jnp.asarray([len(payload)], np.int32),
        d10, d10, mode="commit", **kw)
    # same accept/reject verdict (error codes may legitimately differ only
    # in which error fired first; both must agree on validity)
    assert (int(e1[0]) == ERR_OK) == (int(e2[0]) == ERR_OK)
