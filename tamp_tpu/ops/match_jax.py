"""JAX/XLA parallel match search — the TPU compute path for encoding.

Same candidate geometry as the NumPy oracle (tamp_tpu.engine.search_np):
equality diagonals over ``C = dictionary || data`` with ring-linearity caps,
wrap-glue patch columns, lowest-ring-slot tie-break, and the optional exact
lazy-probe table.

TPU-shaped implementation notes:

- **No gathers.** The toeplitz matrix ``M[r, j] = C[t0+r+j]`` is built with a
  flip/tile/reshape trick (a length-(L+1) vector tiled R times and reshaped
  to (R, L) yields all shifts), which XLA lowers to cheap reshapes — TPU
  gathers would serialize.
- Everything else is VPU element-wise work: 16 shifted ANDs down the position
  axis for run lengths, min/where for ring caps and wrap-glue patches, and an
  argmax over the window axis with the tie-break packed into the score.
- A ``lax.scan`` over fixed-size chunks keeps one compiled program for any
  input length; per-chunk memory is ~(T+17) x (W+T) bytes.
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

__all__ = ["match_tables_jax", "chunk_kernel"]

# Target elements for the (rows x window) chunk matrix.
CHUNK_ELEMS = 1 << 22


def _chunk_rows(W: int) -> int:
    return min(1 << 14, max(256, CHUNK_ELEMS // W))


def _toeplitz(seg, R: int, L0: int):
    """M[k, i] = seg[k + i] for k in [0, R), i in [0, L0 - R]; gather-free.

    ``seg`` must have length L0 = R + columns - 1 (callers slice M[:, :cols]).
    Row k of tile(concat(flip(seg), s), R)[:R*L0].reshape(R, L0) is
    flip(seg) shifted right by k; flipping lanes back yields seg[k + i].
    """
    z = jnp.concatenate([seg[::-1], jnp.full((1,), -32768, seg.dtype)])
    tiled = jnp.tile(z, R)[: R * L0].reshape(R, L0)
    return tiled[:, ::-1]


@functools.partial(
    jax.jit, static_argnames=("window_bits", "T", "compute_probe", "n_chunks")
)
def _search_scan(C, data_rows, window_bits, T, compute_probe, n_chunks):
    def step(_, i):
        t0 = i * T
        out = chunk_kernel(C, data_rows, t0, window_bits, T, compute_probe)
        return None, out

    _, outs = lax.scan(step, None, jnp.arange(n_chunks, dtype=jnp.int32))
    return outs


def chunk_kernel(C, data_rows, t0, window_bits: int, T: int, compute_probe: bool):
    """Search results for positions [t0, t0+T).

    ``C`` is dict||data (int16) padded with -1; ``data_rows`` is data (int16)
    padded with 0x1FF sentinels so padded rows never match.
    """
    W = 1 << window_bits
    R = T + LMAX  # eq rows 0..T+15; run rows 0..T (probe needs row T)
    nrows = T + 1

    L0 = R + W  # toeplitz lane width; valid columns [0, W) for all R rows
    seg = lax.dynamic_slice(C, (t0,), (L0,))
    M = _toeplitz(seg, R, L0)[:, :W]  # M[r, j] = C[t0+r+j]
    drow = lax.dynamic_slice(data_rows, (t0,), (R,))
    eq = (M == drow[:, None]).astype(jnp.int8)

    # Run lengths down each column, rows 0..T, capped at LMAX.
    run = eq[:nrows]
    length = run.astype(jnp.int32)
    for k in range(1, LMAX):
        run = run & lax.dynamic_slice_in_dim(eq, k, nrows, axis=0)
        length = length + run

    # Wrap-glue tail diagonals gd[:, d-1][r] = run of (data[t0+r+d] == C[t0+r]).
    grows = nrows + LMAX
    dext = lax.dynamic_slice(data_rows, (t0,), (grows + LMAX + 1,))
    cseg = lax.dynamic_slice(C, (t0,), (grows,))
    gbits = jnp.stack(
        [dext[d : d + grows] for d in range(1, LMAX + 1)], axis=1
    )  # (grows, 16)
    gbits = (gbits == cseg[:, None]).astype(jnp.int8)
    grun = gbits[:nrows]
    glen = grun.astype(jnp.int32)
    for k in range(1, LMAX):
        grun = grun & lax.dynamic_slice_in_dim(gbits, k, nrows, axis=0)
        glen = glen + grun
    # glen[r, d-1] = gd[d][r], rows 0..T

    tau = (t0 + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)) % W
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    x = (tau + cols) % W
    cap = W - x

    n_glue = min(LMAX, W) - 1

    def glue_patch(u, gd_col_base):
        for delta in range(1, n_glue + 1):
            j = W - delta
            col = u[:, j]
            tail = jnp.minimum(glen[:T, gd_col_base + delta - 1], LMAX - delta)
            glued = jnp.where((tau[:, 0] >= delta) & (col >= delta), delta + tail, col)
            u = u.at[:, j].set(glued)
        return u

    def reduce(u):
        score = u * W + (cap - 1)  # max length, then min ring slot
        best = jnp.argmax(score, axis=1)
        sc = jnp.max(score, axis=1)
        return (sc // W).astype(jnp.int32), W - 1 - (sc % W)

    usable = jnp.minimum(glue_patch(length[:T], 0), cap)
    len15, idx15 = reduce(jnp.minimum(usable, 15))
    len16, idx16 = reduce(usable)

    if not compute_probe:
        return len15, idx15, len16, idx16

    # Probe: target data[t+1:] vs ring_t.  Column j>=1 = main run at
    # (row r+1, col j-1); column 0 = the write-head slot, tail diagonal d=1.
    pu = jnp.concatenate([glen[:T, 0:1], length[1 : T + 1, : W - 1]], axis=1)
    pu = glue_patch(pu, 1)  # tails use diagonal delta+1, rows r
    pu = jnp.minimum(jnp.minimum(pu, cap), 15)
    plen, pidx = reduce(pu)
    return len15, idx15, len16, idx16, plen, pidx


def _pad_sizes(T: int) -> int:
    """Extra padding beyond the last chunk needed by in-kernel slices."""
    return 3 * LMAX + W_SLACK


W_SLACK = 2


def match_tables_jax(
    data: np.ndarray,
    dictionary: np.ndarray,
    window_bits: int,
    compute_probe: bool = False,
    chunk_rows: int | None = None,
) -> MatchTables:
    """Host wrapper: pad, run the scanned kernel, unpad into MatchTables."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dictionary = np.ascontiguousarray(dictionary, dtype=np.uint8)
    W = 1 << window_bits
    N = data.shape[0]
    if N == 0:
        e8, e32 = np.zeros(0, np.uint8), np.zeros(0, np.int32)
        p = (e8, e32) if compute_probe else (None, None)
        return MatchTables(e8, e32, e8, e32, *p)

    T = chunk_rows or _chunk_rows(W)
    n_chunks = -(-N // T)
    Npad = n_chunks * T
    extra = _pad_sizes(T)

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
