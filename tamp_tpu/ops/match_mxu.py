"""MXU-based parallel match search — the TPU compute path for encoding.

The key reformulation versus :mod:`tamp_tpu.engine.search_np` (the NumPy
oracle, same results): work in *global source coordinates*.  With
``C = dictionary || data``, the window of position ``p`` is exactly
``C[p : p+W)``, so every candidate is a pair ``(r, q)`` with source
``C[t0+q]``, ``q - r in [0, W)``.  Then

    E[r, q] = (data[t0+r] == C[t0+q])

is a *plain outer equality* — computed on the MXU as a one-hot matmul
(``onehot(d) @ onehot(seg).T``), with no toeplitz/gather construction at
all — and match lengths are leading-ones runs along diagonals of ``E``,
computed with log-doubling (4 shifted selects instead of 15 ANDs).

Ring geometry is column/row separable in these coordinates:

- ring slot of source q: ``x(q) = (t0 + q) mod W``   (per-column vector)
- write head at row r:  ``tau(r) = (t0 + r) mod W``  (per-row vector)
- linear-buffer cap:     ``cap(q) = W - x(q)``

A candidate's run crosses the write head iff ``delta = W - (q - r) <= 15``
(the last 15 diagonals of the band); past the head the in-C continuation
compares against not-yet-written bytes, so those diagonals are excluded
from the main reduction and re-scored from two tiny 16-column side tables
(``d[r] == seg[r + W - dd]`` and ``d[r + dd] == seg[r]``) that capture the
reference's wrap-glue semantics (search_np glue patch; ultimately
BrianPugh/tamp's linear ``bytes.find`` window search, compressor.py:432).

Scores pack the reference tie-break (longest match, then lowest ring slot)
into one f32: ``score = len * W + (W - 1 - x)``; all values < 2^24 so f32
arithmetic is exact.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..engine.search_np import LMAX, MatchTables
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["match_tables_mxu", "mxu_chunk"]

_F = jnp.float32


def _shift2(M, k):
    """M[r+k, q+k] zero-padded back to M's shape."""
    R, Q = M.shape
    return jnp.pad(lax.slice(M, (k, k), (R, Q)), ((0, k), (0, k)))


def _shift_rows(M, k):
    R, D = M.shape
    return jnp.pad(lax.slice(M, (k, 0), (R, D)), ((0, k), (0, 0)))


def _runs16(E, shift):
    """Leading-ones run lengths (cap 16) along the shift direction."""
    L = E
    for k in (1, 2, 4, 8):
        L = L + jnp.where(L == k, shift(L, k), 0.0)
    return L


def mxu_chunk(C, data_rows, t0, window_bits: int, T: int, compute_probe: bool):
    """Search results for positions [t0, t0+T) — MXU formulation.

    ``C`` is dict||data (int16, sentinel -1 padding); ``data_rows`` is data
    (int16, sentinel 0x1FF padding).  Sentinels one-hot to zero rows, so
    padded regions can never match.
    """
    W = 1 << window_bits
    R = T + LMAX          # E rows: run starts [0, T] + 15 look-ahead
    Q = T + W + LMAX      # source columns

    seg = lax.dynamic_slice(C, (t0,), (Q,))
    d = lax.dynamic_slice(data_rows, (t0,), (R + LMAX,))

    # ---- E via one-hot MXU matmul ------------------------------------
    sym = lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    oh_d = (d[:R, None].astype(jnp.int32) == sym).astype(jnp.bfloat16)
    oh_s = (seg[:, None].astype(jnp.int32) == sym).astype(jnp.bfloat16)
    E = lax.dot_general(
        oh_d, oh_s, (((1,), (1,)), ((), ())), preferred_element_type=_F
    )  # (R, Q): E[r, q] = (d[r] == seg[q])

    run16 = _runs16(E, _shift2)  # diagonal leading-runs, rows [0, T] valid

    # ---- per-row / per-column ring geometry --------------------------
    tau = ((t0 + lax.broadcasted_iota(jnp.int32, (T, 1), 0)) % W).astype(_F)
    xq = ((t0 + lax.broadcasted_iota(jnp.int32, (1, Q), 1)) % W).astype(_F)
    capq = W - xq                                    # (1, Q)
    ri = lax.broadcasted_iota(jnp.int32, (T, Q), 0)
    qi = lax.broadcasted_iota(jnp.int32, (T, Q), 1)
    band = qi - ri
    mask_big = (band >= 0) & (band <= W - LMAX)      # head-crossing diags out
    slot_term = capq - 1.0                           # = W - 1 - x(q)

    def big_scores(u):
        u = jnp.minimum(u, capq)
        s16 = jnp.where(mask_big, jnp.minimum(u, 16.0) * W + slot_term, -1.0)
        s15 = jnp.where(mask_big, jnp.minimum(u, 15.0) * W + slot_term, -1.0)
        return jnp.max(s15, axis=1), jnp.max(s16, axis=1)

    sb15, sb16 = big_scores(run16[:T])

    # ---- side tables for the 15 head-crossing diagonals --------------
    # ebit[r, dd-1] = (d[r] == seg[r + W - dd]);  vertical runs v16.
    ebit = jnp.stack(
        [(d[:R] == seg[W - dd : W - dd + R]).astype(_F) for dd in range(1, LMAX + 1)],
        axis=1,
    )
    v16 = _runs16(ebit, _shift_rows)
    # gbit[r, dd-1] = (d[r + dd] == seg[r]); gv = glue continuations gd[dd].
    gbit = jnp.stack(
        [(d[dd : dd + R] == seg[:R]).astype(_F) for dd in range(1, LMAX + 1)],
        axis=1,
    )
    gv = _runs16(gbit, _shift_rows)

    delta = lax.broadcasted_iota(jnp.int32, (T, LMAX - 1), 1).astype(_F) + 1.0
    tau_ge = tau >= delta                   # head-crossing possible
    x_cross = tau - delta
    x_old = x_cross + W                     # delta > tau: old-region slot
    cap_cross = W - x_cross
    cap_old = W - x_old

    def mini_scores(v, contin, cap_pat):
        # v: lin run from the candidate row; contin: post-head continuation.
        glued = delta + jnp.minimum(contin, cap_pat - delta)
        val_cross = jnp.minimum(jnp.where(v >= delta, glued, v), cap_cross)
        val_old = jnp.minimum(v, cap_old)
        val = jnp.minimum(jnp.where(tau_ge, val_cross, val_old), cap_pat)
        x = jnp.where(tau_ge, x_cross, x_old)
        return jnp.max(val * W + (W - 1.0 - x), axis=1)

    v_main = v16[:T, : LMAX - 1]
    g_main = gv[:T, : LMAX - 1]
    sm15 = mini_scores(v_main, g_main, 15.0)
    sm16 = mini_scores(v_main, g_main, 16.0)

    def finish(sa, sb):
        s = jnp.maximum(sa, sb)
        ln = jnp.floor(s / W)
        x = W - 1.0 - (s - ln * W)
        return ln.astype(jnp.int32), x.astype(jnp.int32)

    len15, idx15 = finish(sb15, sm15)
    len16, idx16 = finish(sb16, sm16)

    if not compute_probe:
        return len15, idx15, len16, idx16

    # ---- probe (lazy matching): target d[r+1:], same ring state ------
    pb15, _ = big_scores(run16[1 : T + 1])
    # Head-crossing diagonal delta of the probe: target row r+1, source
    # seg[r + W - delta] = seg[(r+1) + W - (delta+1)] -> ebit column delta+1.
    v_probe = v16[1 : T + 1, 1:LMAX]
    g_probe = gv[:T, 1:LMAX]                # continuation diagonal delta+1
    pm15 = mini_scores(v_probe, g_probe, 15.0)
    plen, pidx = finish(pb15, pm15)
    return len15, idx15, len16, idx16, plen, pidx


@functools.partial(
    jax.jit, static_argnames=("window_bits", "T", "compute_probe", "n_chunks")
)
def _search_scan(C, data_rows, window_bits, T, compute_probe, n_chunks):
    def step(_, i):
        return None, mxu_chunk(C, data_rows, i * T, window_bits, T, compute_probe)

    _, outs = lax.scan(step, None, jnp.arange(n_chunks, dtype=jnp.int32))
    return outs


def _chunk_rows(W: int) -> int:
    # E is (T+16, T+W+16) f32; keep it ~VMEM-sized for XLA's benefit and
    # balance MXU work (~(T+16)(T+W+16)*512/T flops/byte, minimized for
    # small T) against per-chunk launch overhead.
    return 256 if W <= 4096 else 128


def match_tables_mxu(
    data: np.ndarray,
    dictionary: np.ndarray,
    window_bits: int,
    compute_probe: bool = False,
    chunk_rows: int | None = None,
) -> MatchTables:
    """Host wrapper: pad, run the scanned MXU kernel, unpad to MatchTables."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dictionary = np.ascontiguousarray(dictionary, dtype=np.uint8)
    W = 1 << window_bits
    if dictionary.shape[0] != W:
        raise ValueError("dictionary size must equal window size")
    N = data.shape[0]
    if N == 0:
        e8, e32 = np.zeros(0, np.uint8), np.zeros(0, np.int32)
        p = (e8, e32) if compute_probe else (None, None)
        return MatchTables(e8, e32, e8, e32, *p)

    T = chunk_rows or _chunk_rows(W)
    n_chunks = -(-N // T)
    Npad = n_chunks * T
    extra = W + 3 * LMAX  # in-kernel slices: seg needs T+W+16, d needs T+32

    C = np.full(W + Npad + extra, -1, dtype=np.int16)
    C[:W] = dictionary
    C[W : W + N] = data
    data_rows = np.full(Npad + extra, 0x1FF, dtype=np.int16)
    data_rows[:N] = data

    outs = _search_scan(
        jnp.asarray(C), jnp.asarray(data_rows), window_bits, T, compute_probe, n_chunks
    )
    outs = [np.asarray(o).reshape(-1)[:N] for o in outs]
    len15, idx15, len16, idx16 = outs[:4]
    if compute_probe:
        return MatchTables(
            len15.astype(np.uint8), idx15, len16.astype(np.uint8), idx16,
            outs[4].astype(np.uint8), outs[5],
        )
    return MatchTables(len15.astype(np.uint8), idx15, len16.astype(np.uint8), idx16)
