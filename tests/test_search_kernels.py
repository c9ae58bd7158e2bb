"""Differential tests for the device search kernels against the NumPy oracle
(the esp32_host differential-testing pattern from the reference, SURVEY §4).

The oracle (engine.search_np) is itself validated byte-exactly against the
reference encoder via the engine parity suites; these tests pin the XLA and
Pallas formulations to it.  On CPU the Pallas kernel runs in interpret mode
(tiny inputs only — it is compiled on real TPUs).
"""

import numpy as np
import pytest

from tamp_tpu.dictionary import dictionary_array
from tamp_tpu.engine.search_np import match_tables

FIELDS = ("len15", "idx15", "len16", "idx16", "probe_len", "probe_idx")


def _cases(rng):
    text = (b"It was the best of times, it was the worst of times, " * 30)
    return [
        b"",
        b"abc",
        text[:700],
        bytes(rng.getrandbits(8) for _ in range(900)),
        bytes(rng.choice(b"ab") for _ in range(600)),
        bytes([5]) * 400,
    ]


def _assert_equal(a, b, tag):
    for f in FIELDS:
        x, y = getattr(a, f), getattr(b, f)
        if x is None and y is None:
            continue
        x = np.asarray(x, dtype=np.int64)
        y = np.asarray(y, dtype=np.int64)
        bad = np.nonzero(x != y)[0]
        assert bad.size == 0, (tag, f, bad[:5], x[bad[:5]], y[bad[:5]])


@pytest.mark.parametrize("w", [8, 10, 12])
def test_mxu_matches_oracle(w, rng):
    from tamp_tpu.ops.match_mxu import match_tables_mxu

    d = dictionary_array(1 << w)
    for i, data in enumerate(_cases(rng)):
        arr = np.frombuffer(data, dtype=np.uint8)
        a = match_tables(arr, d, w, compute_probe=True)
        b = match_tables_mxu(arr, d, w, compute_probe=True)
        _assert_equal(a, b, (w, i))


@pytest.mark.parametrize("w", [8, 10])
def test_pallas_matches_oracle(w, rng):
    from tamp_tpu.ops.match_pallas import match_tables_pallas, pallas_available

    d = dictionary_array(1 << w)
    # Interpret mode is slow: one small mixed case unless on a real TPU.
    n = 2000 if pallas_available() else 300
    text = (b"the quick brown fox jumps over the lazy dog " * 50)[: n // 2]
    data = text + bytes(rng.getrandbits(8) for _ in range(n - len(text)))
    arr = np.frombuffer(data, dtype=np.uint8)
    a = match_tables(arr, d, w, compute_probe=True)
    b = match_tables_pallas(arr, d, w, compute_probe=True)
    _assert_equal(a, b, w)


@pytest.mark.parametrize("w,lit", [(8, 8), (10, 8), (11, 5), (13, 8)])
def test_ext_device_tables_match_oracle(w, lit, rng):
    # Both table families from the widened-cap device kernel must be
    # element-exact against their oracles (cap-16: match_tables; cap-133:
    # match_tables_ext) — the extended on-chip encode consumes these
    # without any host round-trip.
    from tamp_tpu.constants import compute_min_pattern_size
    from tamp_tpu.engine.search_np import match_tables_ext
    from tamp_tpu.ops.match_ext_mxu import ext_tables_host

    minp = compute_min_pattern_size(w, lit)
    maxpat = minp + 131
    d = dictionary_array(1 << w, literal=lit)
    n = 900
    text = (b"ababcabcd abcd abcd xyz " * 60)[: n // 2]
    data = text + bytes(rng.getrandbits(8) for _ in range(n - len(text)))
    arr = np.frombuffer(data, dtype=np.uint8)
    t16 = match_tables(arr, d, w, compute_probe=False)
    lxo, ixo = match_tables_ext(arr, d, w, maxpat)
    l16, i16, lx, ix = ext_tables_host(arr, d, w, maxpat)
    np.testing.assert_array_equal(l16, t16.len16.astype(np.int32))
    np.testing.assert_array_equal(i16, t16.idx16)
    np.testing.assert_array_equal(lx, lxo)
    np.testing.assert_array_equal(ix, ixo)
    # the lazy probe family (target p+1, cap 15, ring state at p) against
    # the NumPy oracle's compute_probe
    tp = match_tables(arr, d, w, compute_probe=True)
    _, _, _, _, pl, pi = ext_tables_host(arr, d, w, maxpat, probe=True)
    np.testing.assert_array_equal(pl, tp.probe_len.astype(np.int32))
    np.testing.assert_array_equal(pi, tp.probe_idx)


@pytest.mark.parametrize("w,lit", [(8, 8), (10, 8), (11, 5), (12, 8)])
def test_ext_pallas_tables_match_oracle(w, lit, rng):
    # The band-space Pallas formulation (VMEM-resident, the TPU production
    # path for the extended pipeline) against the same oracles — all three
    # families incl. the probe (lazy) one; w=12 runs the fori_loop band
    # path, the smaller windows the unrolled one.
    from tamp_tpu.constants import compute_min_pattern_size
    from tamp_tpu.engine.search_np import match_tables_ext
    from tamp_tpu.ops.match_ext_pallas import ext_tables_pallas_host

    minp = compute_min_pattern_size(w, lit)
    maxpat = minp + 131
    d = dictionary_array(1 << w, literal=lit)
    n = 700
    text = (b"ababcabcd abcd abcd xyz " * 60)[: n // 2]
    data = (text + bytes([7]) * 150
            + bytes(rng.getrandbits(8) for _ in range(n - len(text) - 150)))
    arr = np.frombuffer(data, dtype=np.uint8)
    t16 = match_tables(arr, d, w, compute_probe=True)
    lxo, ixo = match_tables_ext(arr, d, w, maxpat)
    l16, i16, lx, ix, pl_, pi_ = ext_tables_pallas_host(
        arr, d, w, maxpat, probe=True)
    np.testing.assert_array_equal(l16, t16.len16.astype(np.int32))
    np.testing.assert_array_equal(i16, t16.idx16)
    np.testing.assert_array_equal(lx, lxo)
    np.testing.assert_array_equal(ix, ixo)
    np.testing.assert_array_equal(pl_, t16.probe_len.astype(np.int32))
    np.testing.assert_array_equal(pi_, t16.probe_idx)


def test_ext_pallas_ring_wrap_at_production_window(rng):
    # n > W at window 10 (the production default): the ring-wrap / old-window
    # glue geometry (x_old = x_cross + W, slot wrap in mscore) must be
    # exercised IN the suite, not only by on-chip runs (ADVICE r03).  T=128
    # keeps interpret mode ~6 s.
    from tamp_tpu.engine.search_np import match_tables_ext
    from tamp_tpu.ops.match_ext_pallas import ext_tables_pallas_host

    w, maxpat = 10, 133
    d = dictionary_array(1 << w, literal=8)
    n = 1500
    text = (b"ababcabcd abcd abcd xyz " * 80)[: n // 2]
    data = (text + bytes([7]) * 300
            + bytes(rng.getrandbits(8) for _ in range(n - len(text) - 300)))
    arr = np.frombuffer(data, np.uint8)
    t16 = match_tables(arr, d, w)
    lxo, ixo = match_tables_ext(arr, d, w, maxpat)
    l16, i16, lx, ix = ext_tables_pallas_host(arr, d, w, maxpat, T=128,
                                              interpret=True)
    np.testing.assert_array_equal(l16, t16.len16.astype(np.int32))
    np.testing.assert_array_equal(i16, t16.idx16)
    np.testing.assert_array_equal(lx, lxo)
    np.testing.assert_array_equal(ix, ixo)


def test_ext_pallas_wrap_zone_bound(rng):
    # Adversarial geometry for the R >= T + LEXT + 129 wrap-zone bound
    # (match_ext_pallas module docstring): all-equal bytes make EVERY lane's
    # run maximal, so the log-doubling consumes the deepest lanes an output
    # lane can reach (r + LEXT from lane T-1) in every band and glue row —
    # if pltpu.roll's wrap corruption leaked below R - 128, some output lane
    # would differ from the oracle.  Multiple chunks cover the chunk-seam
    # runs too.
    from tamp_tpu.engine.search_np import match_tables_ext
    from tamp_tpu.ops.match_ext_pallas import ext_tables_pallas_host

    w, maxpat = 8, 133
    d = dictionary_array(1 << w, literal=8)
    arr = np.full(420, 7, np.uint8)  # > 3 chunks at T=128, spans the ring
    t16 = match_tables(arr, d, w)
    lxo, ixo = match_tables_ext(arr, d, w, maxpat)
    l16, i16, lx, ix = ext_tables_pallas_host(arr, d, w, maxpat, T=128,
                                              interpret=True)
    np.testing.assert_array_equal(l16, t16.len16.astype(np.int32))
    np.testing.assert_array_equal(i16, t16.idx16)
    np.testing.assert_array_equal(lx, lxo)
    np.testing.assert_array_equal(ix, ixo)


def test_rcummin_matches_associative_scan(rng):
    # _rcummin exists because lax.associative_scan's lowering stalls the
    # remote TPU compiler (BASELINE.md round-3 ledger); it must stay a
    # drop-in semantic replacement.
    import jax.numpy as jnp
    from jax import lax

    from tamp_tpu.ops.plan_ext import _rcummin

    for mp in (1, 7, 64, 1000):
        x = np.array(
            [[rng.randrange(0, mp + 300) for _ in range(mp)]
         for _ in range(3)], np.int32)
        want = lax.associative_scan(
            jnp.minimum, jnp.asarray(x), reverse=True, axis=1)
        got = _rcummin(jnp.asarray(x), jnp.int32(mp + 300))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("w", [9, 10, 12])
def test_ext_pallas_swar_kernel_match_oracle(w, rng):
    # The quarter-lane packed-word kernel (round 5: SWAR mismatch masks +
    # word-level suffix-min scan + phase-major scores, peeled blocks and
    # glue in byte space) against the oracles — both families, n > W so
    # ring wrap, glue diagonals and the old-window zone all fire.
    from tamp_tpu.constants import compute_min_pattern_size
    from tamp_tpu.engine.search_np import match_tables_ext
    from tamp_tpu.ops.match_ext_pallas import ext_tables_pallas_host

    minp = compute_min_pattern_size(w, 8)
    maxpat = minp + 131
    d = dictionary_array(1 << w, literal=8)
    n = (1 << w) + 600
    text = (b"ababcabcd abcd abcd xyz " * 200)[: n // 2]
    data = (text + bytes([7]) * 150
            + bytes(rng.getrandbits(8) for _ in range(n - len(text) - 150)))
    arr = np.frombuffer(data, dtype=np.uint8)
    t16 = match_tables(arr, d, w)
    lxo, ixo = match_tables_ext(arr, d, w, maxpat)
    l16, i16, lx, ix = ext_tables_pallas_host(
        arr, d, w, maxpat, probe=False, swar=True)
    np.testing.assert_array_equal(l16, t16.len16.astype(np.int32))
    np.testing.assert_array_equal(i16, t16.idx16)
    np.testing.assert_array_equal(lx, lxo)
    np.testing.assert_array_equal(ix, ixo)
