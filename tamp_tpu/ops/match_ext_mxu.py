"""Device (XLA/MXU) match tables for the extended format — both families.

Same global-coordinate formulation as :mod:`tamp_tpu.ops.match_mxu` (one-hot
MXU matmul for the equality matrix, leading-run log-doubling, head-crossing
side diagonals) with the run cap widened from 16 to ``maxpat`` (= min_pattern
+ 131, the extended format's longest match).  One E/runs computation yields
BOTH table families — cap-16 (basic-match candidates) and cap-``maxpat``
(one-shot extended search) — entirely on device, batched over shards, so the
extended on-chip encode pipeline never moves a table across the host link
(the tables feed ops/plan_ext.plan_fields_ext directly; 4 int32 tables per
position would otherwise dominate the transfer budget).

Inputs arrive as raw uint8 model-history bytes; sentinelization happens on
device (index masks), so the wire cost is ~1 byte per position.

Semantics: identical to the NumPy oracles ``engine.search_np.match_tables``
(cap-16 family) and ``match_tables_ext`` (cap-maxpat family) — longest
match, lowest ring slot among ties, linear-buffer cap ``W - x``, write-head
wrap candidates via glue diagonals (reference search semantics:
BrianPugh/tamp compressor.py:432-447 and the planned committer's one-shot
extended search, tampnative.cpp emit_ext_planned).  Element parity is pinned
by tests/test_search_kernels.py::test_ext_device_tables_match_oracle.

Key geometry facts that make one kernel serve both families:

- A cap-16 candidate on a diagonal with ``delta = W - band >= 16`` can never
  cross the write head (length <= 16 <= delta), so the cap-16 main band
  extends to ``band <= W - 16`` even though runs were doubled to maxpat.
- Likewise the cap-maxpat main band is ``band <= W - maxpat`` and its side
  table covers ``delta = 1 .. maxpat-1``; the cap-16 family reuses the first
  15 side columns.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["ext_tables_device", "ext_tables_host"]

_F = jnp.float32


def _shift2(M, k):
    R, Q = M.shape
    return jnp.pad(lax.slice(M, (k, k), (R, Q)), ((0, k), (0, k)))


def _shift_rows(M, k):
    R, D = M.shape
    return jnp.pad(lax.slice(M, (k, 0), (R, D)), ((0, k), (0, 0)))


def _runs(E, shift, cap: int):
    """Leading-ones run lengths along the shift direction, exact to >= cap.

    Accumulates in E's dtype: bf16 is integer-exact through 256 >= 2*LEXT,
    and the doubling rounds over the (R, Q) matrices are the kernel's
    dominant elementwise cost — half-width halves it.  Callers cast to f32
    before mixing with W-scale score terms."""
    L = E
    k = 1
    while k < cap:
        L = L + jnp.where(L == k, shift(L, k), jnp.zeros((), E.dtype))
        k *= 2
    return L


def _ext_chunk(C, d, t0, window_bits: int, T: int, LEXT: int,
               probe: bool = False):
    """Both table families for positions [t0, t0+T) of one shard.

    ``C``: dict||dh (int32, -1 sentinel past the valid end); ``d``: dh
    (int32, 0x1FF sentinel).  Returns (len16, idx16, lenx, idxx), (T,)
    each — plus (plen, pidx) when ``probe``: the lazy-matching probe
    (target d[r+1:], cap 15, against the ring state at r — same
    formulation as ops/match_mxu.mxu_chunk's probe: shifted target rows,
    unshifted ring geometry, side-diagonal column j+1)."""
    W = 1 << window_bits
    R = T + LEXT
    Q = T + W + LEXT

    seg = lax.dynamic_slice(C, (t0,), (Q,))
    dd_ = lax.dynamic_slice(d, (t0,), (R,))

    # ---- E via one-hot MXU matmul ------------------------------------
    sym = lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    oh_d = (dd_[:, None] == sym).astype(jnp.bfloat16)
    oh_s = (seg[:, None] == sym).astype(jnp.bfloat16)
    E = lax.dot_general(
        oh_d, oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )  # (R, Q): E[r, q] = (d[t0+r] == seg[q]); 0/1 exact in bf16

    runx = _runs(E, _shift2, LEXT)  # bf16, exact run lengths to >= LEXT

    # ---- ring geometry ------------------------------------------------
    tau = ((t0 + lax.broadcasted_iota(jnp.int32, (T, 1), 0)) % W).astype(_F)
    xq = ((t0 + lax.broadcasted_iota(jnp.int32, (1, Q), 1)) % W).astype(_F)
    capq = W - xq
    ri = lax.broadcasted_iota(jnp.int32, (T, Q), 0)
    qi = lax.broadcasted_iota(jnp.int32, (T, Q), 1)
    band = qi - ri
    slot_term = capq - 1.0  # = W - 1 - x(q)

    u = jnp.minimum(runx[:T].astype(_F), capq)
    mask16 = (band >= 0) & (band <= W - 16)
    maskx = (band >= 0) & (band <= W - LEXT)
    s16_big = jnp.max(
        jnp.where(mask16, jnp.minimum(u, 16.0) * W + slot_term, -1.0), axis=1)
    sx_big = jnp.max(
        jnp.where(maskx, jnp.minimum(u, float(LEXT)) * W + slot_term, -1.0),
        axis=1)

    # ---- head-crossing side diagonals delta = 1 .. LEXT-1 -------------
    # ebit[r, dd-1] = (d[r] == seg[r + W - dd]): the candidate-row run;
    # gbit[r, dd-1] = (d[r + dd] == seg[r]): the post-head continuation.
    nd = LEXT - 1
    ebit = jnp.stack(
        [(dd_ == lax.dynamic_slice(C, (t0 + W - k,), (R,)))
         .astype(jnp.bfloat16) for k in range(1, nd + 1)], axis=1)
    gbit = jnp.stack(
        [(lax.dynamic_slice(d, (t0 + k,), (R,)) == seg[:R])
         .astype(jnp.bfloat16) for k in range(1, nd + 1)], axis=1)
    v = _runs(ebit, _shift_rows, LEXT)
    gv = _runs(gbit, _shift_rows, LEXT)

    delta = lax.broadcasted_iota(jnp.int32, (T, nd), 1).astype(_F) + 1.0
    tau_ge = tau >= delta
    x_cross = tau - delta
    x_old = x_cross + W
    cap_cross = W - x_cross
    cap_old = W - x_old

    def mini_scores(vv, contin, dlt, t_ge, xc, xo, cc, co, cap_pat):
        glued = dlt + jnp.minimum(contin, cap_pat - dlt)
        val_cross = jnp.minimum(jnp.where(vv >= dlt, glued, vv), cc)
        val_old = jnp.minimum(vv, co)
        val = jnp.minimum(jnp.where(t_ge, val_cross, val_old), cap_pat)
        x = jnp.where(t_ge, xc, xo)
        return jnp.max(val * W + (W - 1.0 - x), axis=1)

    v_main = v[:T].astype(_F)
    g_main = gv[:T].astype(_F)
    sx_mini = mini_scores(v_main, g_main, delta, tau_ge, x_cross, x_old,
                          cap_cross, cap_old, float(LEXT))
    k16 = 15
    s16_mini = mini_scores(
        v_main[:, :k16], g_main[:, :k16], delta[:, :k16], tau_ge[:, :k16],
        x_cross[:, :k16], x_old[:, :k16], cap_cross[:, :k16],
        cap_old[:, :k16], 16.0)

    def finish(sa, sb):
        s = jnp.maximum(sa, sb)
        ln = jnp.floor(s / W)
        x = W - 1.0 - (s - ln * W)
        return ln.astype(jnp.int32), x.astype(jnp.int32)

    len16, idx16 = finish(s16_big, s16_mini)
    lenx, idxx = finish(sx_big, sx_mini)
    if not probe:
        return len16, idx16, lenx, idxx

    # ---- lazy probe: target d[r+1:], ring state at r -----------------
    # Main band: candidates with delta = W - band >= 15 cannot cross the
    # head for cap-15 lengths, so the cap-16 band mask (band <= W - 16)
    # plus the delta-15 side column covers everything (ops/match_mxu).
    u_p = jnp.minimum(runx[1 : T + 1], capq)
    pb15 = jnp.max(
        jnp.where(mask16, jnp.minimum(u_p, 15.0) * W + slot_term, -1.0),
        axis=1)
    # Probe head-crossing delta dd: target row r+1, source seg[r + W - dd]
    # = seg[(r+1) + W - (dd+1)] -> side column dd+1 shifted one row up.
    k15 = 15
    v_probe = v[1 : T + 1, 1 : k15 + 1].astype(_F)
    g_probe = gv[:T, 1 : k15 + 1].astype(_F)
    pm15 = mini_scores(
        v_probe, g_probe, delta[:, :k15], tau_ge[:, :k15],
        x_cross[:, :k15], x_old[:, :k15], cap_cross[:, :k15],
        cap_old[:, :k15], 15.0)
    plen, pidx = finish(pb15, pm15)
    return len16, idx16, lenx, idxx, plen, pidx


@functools.partial(
    jax.jit,
    static_argnames=("window_bits", "LEXT", "T", "n_chunks", "probe"))
def ext_tables_device(dh_b, npos, dict_arr, *, window_bits: int, LEXT: int,
                      T: int = 256, n_chunks: int = 1, probe: bool = False):
    """Both match-table families for S shards, on device.

    ``dh_b``: (S, MP) uint8 model-history bytes (MP = n_chunks * T);
    ``npos``: (S,) int32 valid lengths; ``dict_arr``: (W,) int32 initialized
    window.  Returns (len16, idx16, lenx, idxx), each (S, MP) int32 —
    plus (plen, pidx) when ``probe`` (lazy matching) — positions >= npos
    hold garbage (the planner masks by npos).
    """
    W = 1 << window_bits
    MP = dh_b.shape[1]
    pad = W + 3 * LEXT

    def per_shard(dh, n):
        # device-side sentinelization keeps the h2d at 1 byte/position
        ci = jnp.arange(W + MP + pad, dtype=jnp.int32)
        C = jnp.concatenate([
            dict_arr.astype(jnp.int32), dh.astype(jnp.int32),
            jnp.zeros(pad, jnp.int32)])
        C = jnp.where(ci < W + n, C, -1)
        di = jnp.arange(MP + pad, dtype=jnp.int32)
        d = jnp.concatenate([dh.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
        d = jnp.where(di < n, d, 0x1FF)

        def step(_, i):
            return None, _ext_chunk(C, d, i * T, window_bits, T, LEXT,
                                    probe=probe)

        _, outs = lax.scan(step, None, jnp.arange(n_chunks, dtype=jnp.int32))
        return tuple(o.reshape(-1) for o in outs)

    return jax.vmap(per_shard)(dh_b, npos)


def ext_tables_host(data: np.ndarray, dictionary: np.ndarray,
                    window_bits: int, maxpat: int, T: int = 256,
                    probe: bool = False):
    """Host convenience wrapper (pads one shard, pulls results) — used by the
    oracle-parity tests; production use keeps the outputs on device."""
    data = np.ascontiguousarray(data, np.uint8)
    N = data.shape[0]
    n_chunks = max(1, -(-N // T))
    MP = n_chunks * T
    dh_b = np.zeros((1, MP), np.uint8)
    dh_b[0, :N] = data
    outs = ext_tables_device(
        jnp.asarray(dh_b), jnp.asarray(np.asarray([N], np.int32)),
        jnp.asarray(np.ascontiguousarray(dictionary, np.uint8).astype(np.int32)),
        window_bits=window_bits, LEXT=maxpat, T=T, n_chunks=n_chunks,
        probe=probe)
    return tuple(np.asarray(o)[0, :N] for o in outs)
