"""On-chip EXTENDED-format encode parity.

``engine.pipeline_ext.encode_ext_device_commit`` must be byte-identical to
the native planned committer (``force_planned=True``,
``avoid_divergence=True``) — the tokenization the VPU planner
(ops/plan_ext.py) reproduces — across configs, data shapes, and ring-end
edge cases, and every stream must round-trip through the native decoder
(and the reference decoder: the stream is plain extended Tamp).

Runs the commit kernel in interpreter mode on the CPU suite; the compiled
kernel runs the same program on TPU.
"""

import os

import numpy as np
import pytest

from tamp_tpu import _native
from tamp_tpu.dictionary import dictionary_array
from tamp_tpu.engine.pipeline_ext import encode_ext_device_commit
from tamp_tpu.engine.plan import build_model_history, plan_runs
from tamp_tpu.engine.search_np import MatchTables, match_tables

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


def native_planned(data: bytes, window: int, literal: int,
                   np_oracle: bool = False, lazy: bool = False) -> bytes:
    """The parity oracle: native committer in forced-planned mode.

    Tables come from the native chain engine by default (element-exact vs
    the NumPy oracle per tests/test_search_kernels.py; the O(N*W) oracle is
    unusable at window 14/15 sizes) — ``np_oracle=True`` keeps one leg on
    the semantic reference."""
    W = 1 << window
    arr = np.frombuffer(data, np.uint8)
    plans = plan_runs(arr)
    keep, khat, dh = build_model_history(arr, plans, window)
    dict_b = dictionary_array(W, literal=literal)
    pl = pi = None
    if np_oracle or not _native.available():
        t16 = match_tables(dh, dict_b, window, compute_probe=lazy)
        l16, i16 = np.asarray(t16.len16), np.asarray(t16.idx16)
        if lazy:
            pl, pi = np.asarray(t16.probe_len), np.asarray(t16.probe_idx)
    elif lazy:
        l16, i16, pl, pi = _native.native_v1_tables(
            dh, window, literal, 16, dictionary=dict_b.tobytes(), probe=True)
    else:
        l16, i16 = _native.native_v1_tables(
            dh, window, literal, 16, dictionary=dict_b.tobytes())
    rows = np.minimum(
        khat[:-1].astype(np.int64), max(0, dh.shape[0] - 1)).astype(np.int64)
    g = MatchTables(l16[rows], i16[rows], l16[rows], i16[rows],
                    pl[rows] if lazy else None, pi[rows] if lazy else None)
    return _native.native_compress(
        arr.tobytes(), window=window, literal=literal, extended=True,
        lazy_matching=lazy, tables=g, avoid_divergence=True,
        khat=khat, plan=plans, force_planned=True)


def _gen(rng, kind: int, n: int, lmask: int) -> bytes:
    if kind == 0:  # run-heavy: forced-RLE regions, ring-end chunk splits
        out, tot = [], 0
        while tot < n:
            c = int(rng.integers(1, 500))
            b = int(rng.integers(0, 6)) & lmask
            out.append(bytes([b]) * c)
            tot += c
        return b"".join(out)[:n]
    if kind == 1:  # periodic: extended matches, ring-end ext splits
        p = bytes(int(x) & lmask for x in
                  rng.integers(0, 256, int(rng.integers(2, 30))))
        return (p * (n // len(p) + 1))[:n]
    if kind == 2:  # text-ish: literals + short matches + short RLE
        words = [bytes(int(x) & lmask for x in rng.integers(97, 123, int(k)))
                 for k in rng.integers(2, 9, 64)]
        sep = bytes([1 & lmask])
        return sep.join(words[int(i) % 64]
                        for i in rng.integers(0, 64, n // 4))[:n]
    return bytes(int(x) & lmask for x in rng.integers(0, 256, n))


@pytest.mark.parametrize("window,literal", [(8, 8), (10, 8), (11, 6), (13, 8)])
def test_config_sweep_parity(window, literal):
    rng = np.random.default_rng(window * 77 + literal)
    lmask = (1 << literal) - 1
    for kind in range(4):
        n = int(rng.integers(64, (1 << window) + (1 << window) // 2))
        data = _gen(rng, kind, n, lmask)
        want = native_planned(data, window, literal)
        got = encode_ext_device_commit(
            [data], window=window, literal=literal, interpret=True)[0]
        assert got == want, (window, literal, kind, n)
        assert bytes(_native.native_decompress(got)) == data


def test_batch_shapes_and_edges():
    rng = np.random.default_rng(5)
    shards = [
        _gen(rng, 2, 3000, 255),
        b"a" * 2000,                                 # one big planned run
        b"xy" + b"\x00" * 9 + b"xy" + b"\x00" * 300,  # runs at both scales
        bytes(rng.integers(0, 256, 1500, np.uint8)),  # incompressible
        b"",
        b"z",
        _gen(rng, 1, 17, 255),                        # almost all tail
        _gen(rng, 0, 1030, 255),                      # region spans ring end
    ]
    got = encode_ext_device_commit(shards, window=10, literal=8,
                                   interpret=True)
    for s, g in zip(shards, got):
        assert g == native_planned(s, 10, 8), len(s)
        assert bytes(_native.native_decompress(g)) == s


@pytest.mark.parametrize("window", [8, 10, 15])
def test_native_ext_prep_matches_numpy_reference(window):
    """tampn_ext_prep (one-pass plans/khat/dh/rc) against the NumPy
    semantic reference across run-heavy/periodic/text/random shapes and
    ring-end chunk-keep geometry."""
    from tamp_tpu.engine.pipeline_ext import _chunk_counts

    rng = np.random.default_rng(window * 997)
    W = 1 << window
    for kind in range(4):
        for n in (0, 1, 8, 9, 240, 241, 242, 243, W + W // 2,
                  int(rng.integers(2000, 9000))):
            data = np.frombuffer(_gen(rng, kind, max(n, 1), 255)[:n],
                                 np.uint8)
            plans_ref = plan_runs(data)
            keep, khat_ref, dh_ref = build_model_history(
                data, plans_ref, window)
            rc_ref = _chunk_counts(plans_ref, khat_ref, dh_ref.shape[0])
            plans, khat, dh, rc = _native.native_ext_prep(data, window)
            np.testing.assert_array_equal(plans, plans_ref.reshape(-1, 2))
            np.testing.assert_array_equal(khat, khat_ref)
            np.testing.assert_array_equal(dh, dh_ref)
            np.testing.assert_array_equal(rc.astype(np.int32), rc_ref)


@pytest.mark.parametrize("window,literal", [(8, 8), (10, 8), (11, 6), (14, 8)])
def test_lazy_matching_parity(window, literal):
    """Device lazy matching (planner-side pure-position deferral) must be
    byte-identical to the native planned committer with lazy_matching on —
    the shared planned-lazy semantics (plan_ext.plan_fields_ext docstring:
    steady-state-gated, cache-free; reference cache semantics stay on the
    host engines).  Round-trips through the native decoder."""
    rng = np.random.default_rng(window * 31 + literal)
    lmask = (1 << literal) - 1
    W = 1 << window
    for kind in range(4):
        n = W + W // 2 + int(rng.integers(0, 2048))
        data = _gen(rng, kind, n, lmask)
        want = native_planned(data, window, literal, lazy=True)
        got = encode_ext_device_commit(
            [data], window=window, literal=literal, lazy_matching=True,
            interpret=True)[0]
        assert got == want, (window, literal, kind, n)
        assert bytes(_native.native_decompress(got)) == data
        # lazy must never hurt vs the non-lazy planned stream by more than
        # noise (it exists to improve the parse)
        plain = native_planned(data, window, literal)
        assert len(got) <= len(plain) * 1.001 + 2


def test_lazy_strictly_wins_on_text():
    """Pin a corpus class where device-lazy strictly BEATS non-lazy (the
    parity test above only bounds lazy from below; this asserts the feature
    actually helps — VERDICT r03 weak #4).  Text-ish data wins by ~0.6-0.8%
    at every seed tried; any planner regression that neuters the deferral
    trips this."""
    rng = np.random.default_rng(31)
    data = _gen(rng, 2, 20_000, 255)
    plain = encode_ext_device_commit([data], window=10, literal=8,
                                     interpret=True)[0]
    lz = encode_ext_device_commit([data], window=10, literal=8,
                                  lazy_matching=True, interpret=True)[0]
    assert len(lz) < len(plain), (len(lz), len(plain))
    assert bytes(_native.native_decompress(lz)) == data


def test_forced_chunk_start_at_ring_end_sweep():
    """Adversarial geometry for derive_region_arrays' bound-equals-region-
    bound and ring-end chunk-keep arguments (ops/plan_ext.py:96-107 — the
    proofs live in comments; VERDICT r03 weak #6): sweep the model position
    of a forced-RLE region so chunk starts land on every ring offset around
    the ring end, including a mid-region chunk start (run > 241) straddling
    it.  Byte parity vs the native planned committer at each offset."""
    window, literal, W = 8, 8, 256
    base = (b"q pad " * 60)[:230]
    for j in range(W - 12, W + 3):
        # ~j model positions of mixed prefix, then a >241 run so the region
        # has a mid-region chunk start, then text so matches form after
        data = (base + bytes([65]) * (j - len(base))
                + bytes([9]) * 500 + base)
        want = native_planned(data, window, literal)
        got = encode_ext_device_commit(
            [data], window=window, literal=literal, interpret=True)[0]
        assert got == want, j
        assert bytes(_native.native_decompress(got)) == data


@pytest.mark.parametrize("window,literal", [(14, 8), (15, 8), (15, 5)])
def test_window_14_15_split_field_parity(window, literal):
    """Windows 14/15 exceed the 31-bit field budget: the planner emits the
    extended header+trail and index as TWO kernel pushes (plan_ext module
    docstring).  Byte parity vs the native planned committer across data
    shapes, sized past the ring end so ext-split/ring-wrap paths fire."""
    rng = np.random.default_rng(window * 131 + literal)
    lmask = (1 << literal) - 1
    W = 1 << window
    for kind in (0, 1, 2):
        n = W + W // 2 + int(rng.integers(0, 999))
        data = _gen(rng, kind, n, lmask)
        want = native_planned(data, window, literal)
        got = encode_ext_device_commit(
            [data], window=window, literal=literal, interpret=True)[0]
        assert got == want, (window, literal, kind, n)
        assert bytes(_native.native_decompress(got)) == data


def test_reference_decoder_accepts():
    import io
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from tamp.decompressor import Decompressor as RefDecompressor
    except Exception:
        pytest.skip("reference package unavailable")
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(9)
    data = _gen(rng, 0, 4000, 255) + _gen(rng, 2, 3000, 255)
    blob = encode_ext_device_commit([data], window=10, literal=8,
                                    interpret=True)[0]
    assert bytes(RefDecompressor(io.BytesIO(blob)).read()) == data


def test_ratio_close_to_greedy_native():
    """Pinned planned-vs-greedy inflation per corpus class (round-3 sweep,
    2 MB/1 MB corpora, windows 10 and 12 — BASELINE.md round-3 ledger):

      text/docs    w10 +0.48%  w12 +0.96%   (ring-end ext splits + the
                                             no-cross-run-start rule)
      golden mix   w10 -0.02%  w12 -0.11%   (planned WINS: forced RLE)
      run-heavy    w10 -11.5%  w12 -11.9%   (planned wins big)
      periodic     w10 +3.44%  w12 +0.66%   (worst case: every epoch ends
                                             in a split of a maximal match)
      random       +-0%                     (literal-only either way)

    The bounds below pin each class at measured + a small margin so a
    planner regression trips the suite (the old single 1.02 bound hid
    everything below 2%)."""
    rng = np.random.default_rng(3)
    for kind, bound in ((2, 1.008), (0, 0.95), (1, 1.04), (3, 1.0005)):
        data = _gen(rng, kind, 40_000, 255)
        dev = encode_ext_device_commit([data], window=10, literal=8,
                                       interpret=True)[0]
        ref = _native.native_compress(data, window=10, literal=8,
                                      extended=True)
        assert len(dev) <= len(ref) * bound, (kind, len(dev), len(ref))


@pytest.mark.parametrize("window,literal,lazy", [
    (8, 8, False), (10, 8, False), (10, 8, True), (12, 8, False),
    (15, 8, False), (11, 6, True),
])
def test_greedy_device_mode_byte_equals_reference(window, literal, lazy):
    """The greedy-parity device mode (VERDICT r03 ask #1, byte-equality
    arm): device-search tables + native exact-table commit must be
    byte-identical to the REFERENCE encoder on every corpus class —
    text, golden-mix, run-heavy, periodic, random — including past window
    divergence (RLE truncations, ring-end extended writes).  CPU CI runs
    the native-table fallback; the packed device-table path is covered by
    test_greedy_device_tables_interpret and verified compiled on TPU."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from tamp.compressor import compress as ref_compress
    except Exception:
        pytest.skip("reference package unavailable")
    finally:
        sys.path.remove("/root/reference")

    from tamp_tpu.engine.pipeline_ext import encode_ext_device_greedy

    rng = np.random.default_rng(window * 57 + literal + lazy)
    lmask = (1 << literal) - 1
    shards = [_gen(rng, kind, int(rng.integers(300, (1 << window) * 3)),
                   lmask) for kind in range(4)]
    shards += [b"", bytes([0x78 & lmask]) * 3000]
    outs = encode_ext_device_greedy(shards, window=window, literal=literal,
                                    lazy_matching=lazy, device_tables=False)
    for s, o in zip(shards, outs):
        want = ref_compress(s, window=window, literal=literal,
                            extended=True, lazy_matching=lazy)
        assert o == want, (window, literal, lazy, len(s))
        assert bytes(_native.native_decompress(o)) == s


@pytest.mark.parametrize("lazy", [False, True])
def test_greedy_device_tables_interpret(lazy):
    """The packed device-table path (Pallas kernel LEXT=16 + int16 packing
    + unpack + exact-table commit) in interpret mode — the same graph the
    TPU compiles — against the native-table fallback and the reference."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from tamp.compressor import compress as ref_compress
    except Exception:
        pytest.skip("reference package unavailable")
    finally:
        sys.path.remove("/root/reference")

    from tamp_tpu.engine.pipeline_ext import encode_ext_device_greedy

    rng = np.random.default_rng(77)
    shards = [_gen(rng, 2, 900, 255) + bytes([3]) * 40 + _gen(rng, 1, 500, 255)]
    got = encode_ext_device_greedy(shards, window=10, literal=8,
                                   lazy_matching=lazy, device_tables=True,
                                   interpret=True)
    want = ref_compress(shards[0], window=10, literal=8, extended=True,
                        lazy_matching=lazy)
    assert got[0] == want


def test_excess_bits_raises():
    from tamp_tpu.exceptions import ExcessBitsError

    with pytest.raises(ExcessBitsError):
        encode_ext_device_commit([b"\xff" * 64], window=10, literal=7,
                                 interpret=True)


def test_device_tables_byte_parity(rng):
    # device-resident tables (ops/match_ext_mxu) must produce byte-identical
    # streams to the host-table path across shard shapes incl. forced-RLE
    # runs and incompressible data
    import numpy as np

    from tamp_tpu import _native
    from tamp_tpu.engine.pipeline_ext import encode_ext_device_commit

    words = [bytes(rng.randrange(97, 123) for _ in range(2 + rng.randrange(7)))
             for _ in range(32)]
    shards = [
        b" ".join(words[rng.randrange(32)] for _ in range(300)),
        b"A" * 3000,
        bytes(rng.getrandbits(8) for _ in range(1500)),
        b"",
    ]
    ref = encode_ext_device_commit(shards, window=10, literal=8,
                                   interpret=True, device_tables=False)
    got = encode_ext_device_commit(shards, window=10, literal=8,
                                   interpret=True, device_tables=True)
    assert got == ref
    if _native.available():
        for b, s in zip(got, shards):
            assert bytes(_native.native_decompress(b)) == s


def test_fused_device_stage_matches_stepwise(rng):
    """The ONE-jit fused device stage (sparse and dense rc forms) must
    reproduce the step-by-step composition exactly — this is the graph
    the TPU runs; on CPU both run with the XLA tables and the interpret
    commit kernel."""
    import jax.numpy as jnp

    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.engine.pipeline_ext import _ext_device_stage_impl
    from tamp_tpu.ops.encode_commit_pallas import _commit_fields_batch
    from tamp_tpu.ops.match_ext_mxu import ext_tables_device
    from tamp_tpu.ops.plan_ext import derive_region_arrays, plan_fields_ext

    window, literal = 10, 8
    W = 1 << window
    dict_arr = dictionary_array(W, literal=literal)
    dlast = int(dict_arr[-1])
    NP = 2048
    S = 2
    data = (b"the best of times " * 40 + bytes([9]) * 700)
    dh = np.zeros((S, NP), np.uint8)
    rc = np.zeros((S, NP), np.uint8)
    npos = np.zeros(S, np.int32)
    for i in range(S):
        arr = np.frombuffer(data[: 900 + 300 * i], np.uint8)
        dh[i, : arr.shape[0]] = arr
        npos[i] = arr.shape[0]
        # synthetic forced-RLE chunk starts (values 2..241 at sparse spots)
        for k in range(5 + i):
            rc[i, 37 + 101 * k] = 17 + 20 * k
    dict_d = jnp.asarray(dict_arr.astype(np.int32))
    npos_d = jnp.asarray(npos)
    dh_d = jnp.asarray(dh)

    # step-by-step reference composition
    rc_d = jnp.asarray(rc).astype(jnp.int32)
    bnd, rk = derive_region_arrays(rc_d, window=window)
    l16, i16, lx, ix = ext_tables_device(
        dh_d, npos_d, dict_d, window_bits=window, LEXT=133, T=256,
        n_chunks=NP // 256)
    col = jnp.arange(NP, dtype=jnp.int32)[None, :]
    dh_sent = jnp.where(col < npos_d[:, None],
                        dh_d.astype(jnp.int32), 0x1FF)
    A, B = plan_fields_ext(dh_sent, l16, i16, lx, ix, bnd, rc_d, rk,
                           window=window, literal=literal, dlast=dlast)
    out_ref, st_ref = _commit_fields_batch(
        A, B, npos_d, NP=NP, dual=True, max_out=NP + NP // 8 + 64,
        idx_bits=0, interpret=True)

    # fused stage, dense rc
    out_d, st_d = _ext_device_stage_impl(
        dh_d, jnp.asarray(rc), jnp.asarray(rc[:, :1].astype(np.int32)),
        npos_d, dict_d, window=window, literal=literal, dlast=dlast,
        lazy=False, pallas_tables=False, sparse_rc=False, NP=NP,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(st_d), np.asarray(st_ref))

    # fused stage, sparse rc sideband (padding positions NP + k, distinct)
    K = 16
    pos_s = NP + np.tile(np.arange(K, dtype=np.int32), (S, 1))
    cnt_s = np.zeros((S, K), np.int32)
    for i in range(S):
        z = np.nonzero(rc[i])[0]
        pos_s[i, : z.shape[0]] = z
        cnt_s[i, : z.shape[0]] = rc[i, z]
    out_s, st_s = _ext_device_stage_impl(
        dh_d, jnp.asarray(pos_s), jnp.asarray(cnt_s), npos_d, dict_d,
        window=window, literal=literal, dlast=dlast, lazy=False,
        pallas_tables=False, sparse_rc=True, NP=NP, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(st_s), np.asarray(st_ref))


def test_greedy_sparse_sentinel_holes():
    """Native exact-table commit with SPARSE tables: 0xFF len marks a
    position with no shipped entry and must fall back to the exact chain
    search.  Punching random holes into exact tables must not change a
    single output byte — this is the invariant the speculative-pull mode
    (ops/greedy_predict_pallas) rests on: prediction quality can only
    affect host CPU time, never the stream."""
    rng = np.random.default_rng(404)
    for window, literal, lazy in [(10, 8, False), (10, 8, True), (12, 8, False)]:
        data = (_gen(rng, 2, 1500, 255) + bytes([7]) * 30
                + _gen(rng, 1, 800, 255) + _gen(rng, 0, 700, 255))
        arr = np.frombuffer(data, np.uint8)
        dict_b = dictionary_array(1 << window, literal=literal)
        if lazy:
            l16, i16, pl, pi = _native.native_v1_tables(
                arr, window, literal, 16, dictionary=dict_b.tobytes(),
                probe=True)
        else:
            l16, i16 = _native.native_v1_tables(
                arr, window, literal, 16, dictionary=dict_b.tobytes())
            pl = pi = None
        full = MatchTables(l16, i16, l16, i16, pl, pi)
        want = _native.native_compress(
            data, window=window, literal=literal, extended=True,
            lazy_matching=lazy, tables=full, exact_tables=True)
        for frac in (0.3, 0.9, 1.0):
            hole = rng.random(arr.shape[0]) < frac
            hl = l16.copy()
            hl[hole] = 0xFF
            hp = None
            if lazy:
                hp = pl.copy()
                hp[hole] = 0xFF
            holed = MatchTables(hl, i16, hl, i16, hp, pi)
            got = _native.native_compress(
                data, window=window, literal=literal, extended=True,
                lazy_matching=lazy, tables=holed, exact_tables=True)
            assert got == want, (window, literal, lazy, frac)


@pytest.mark.parametrize("window,lazy", [(10, False), (10, True), (12, False)])
def test_greedy_sparse_pull_interpret(window, lazy):
    """The speculative-pull greedy path (cap-16 Pallas tables + scalar
    walker + sentinel-holed native commit) in interpret mode must be
    byte-equal to the dense-pull path and the reference across corpus
    classes, and its pull volume must stay in the expected band on
    text-like data (the predictor regression guard: parity can never
    break, but a broken predictor would silently re-inflate the pull)."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from tamp.compressor import compress as ref_compress
    except Exception:
        pytest.skip("reference package unavailable")
    finally:
        sys.path.remove("/root/reference")

    from tamp_tpu.engine.pipeline_ext import encode_ext_device_greedy

    rng = np.random.default_rng(window + 100 * lazy)
    shards = [_gen(rng, k, 1800, 255) for k in range(4)]
    shards.append(_gen(rng, 2, 600, 255) + bytes([9]) * 600
                  + _gen(rng, 1, 600, 255))
    got_sparse = encode_ext_device_greedy(
        shards, window=window, lazy_matching=lazy, device_tables=True,
        interpret=True, pull="sparse")
    got_dense = encode_ext_device_greedy(
        shards, window=window, lazy_matching=lazy, device_tables=True,
        interpret=True, pull="dense")
    for s, a, b in zip(shards, got_sparse, got_dense):
        want = ref_compress(s, window=window, extended=True,
                            lazy_matching=lazy)
        assert a == want and b == want, (window, lazy, len(s))


def test_greedy_predictor_pull_volume():
    """Entry-count sanity on text: the predictor must ship far fewer
    entries than one per position (that is the whole point), but enough
    to cover most token starts."""
    from tamp_tpu.engine.pipeline_ext import _greedy_sparse_stage

    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    data = _gen(rng, 2, 6000, 255)
    arr = np.frombuffer(data, np.uint8)
    n = arr.shape[0]
    MP = 8192
    dh = np.zeros((1, MP), np.uint8)
    dh[0, :n] = arr
    dict_arr = dictionary_array(1024, literal=8)
    stage = _greedy_sparse_stage()
    bm, ent, st = stage(
        jnp.asarray(dh), jnp.asarray(np.asarray([n], np.int32)),
        jnp.asarray(dict_arr.astype(np.int32)), window=10, literal=8,
        dlast=int(dict_arr[-1]), lazy=False, NP=MP, T=128, interpret=True)
    bits = np.unpackbits(np.asarray(bm).view(np.uint8), axis=1,
                         bitorder="little")[0, :n]
    ne = int(bits.sum())
    assert ne == int(np.asarray(st)[0, 0])
    # text-ish data: matchy starts well under one per 2.5 bytes, and the
    # walk cannot be empty
    assert n // 30 < ne < n // 2, ne


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("TAMP_SLOW") != "1",
                    reason="1 MB geometry leg: set TAMP_SLOW=1 "
                           "(tools/fuzz_campaign.py runs it)")
def test_ratio_close_to_greedy_native_1mb():
    """The per-class planned-vs-greedy pins at the geometry the quoted
    percentages were measured at (VERDICT r04 weak #5: the 40 KB pins
    cannot see long-range ring-epoch behavior — at w12 an epoch is 4 KiB,
    so a planner change shifting only multi-epoch behavior could pass
    them while moving the real ratio)."""
    rng = np.random.default_rng(17)
    for window, cases in ((10, ((2, 1.008), (0, 0.95), (1, 1.040))),
                          (12, ((2, 1.013), (0, 0.95), (1, 1.010)))):
        for kind, bound in cases:
            data = _gen(rng, kind, 1 << 20, 255)
            dev = encode_ext_device_commit([data], window=window, literal=8,
                                           interpret=True)[0]
            ref = _native.native_compress(data, window=window, literal=8,
                                          extended=True)
            assert len(dev) <= len(ref) * bound, \
                (window, kind, len(dev), len(ref))
