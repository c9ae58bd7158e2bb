"""Pallas TPU kernel for the parallel match search.

Same mathematics as :mod:`tamp_tpu.ops.match_mxu` (verified equal to the
NumPy oracle, itself verified byte-exact against the reference encoder), but
the whole per-chunk working set — the one-hot operands, the equality matrix
from the MXU, and the log-doubling run/score passes — lives in VMEM, so HBM
traffic is just the int16 byte streams in and the (T,) tables out.

Geometry recap (see match_mxu for the derivation):

    E[q, r]    = (C[t0+q] == data[t0+r])        via one-hot MXU matmul
    candidates = band q - r in [0, W-16]         (head-crossing diags in a
                                                  16-row side table)
    score      = len * W + (W - 1 - ring_slot)   packed reference tie-break,
                                                  reduced with a plain max

Mosaic-driven layout decisions:

- **Transposed layout**: source positions q on sublanes, stream positions r
  on lanes.  Byte streams are (1, L) row vectors, DMA'd with 128-aligned
  lane offsets/lengths; every per-chunk output is a (1, T) row DMA'd back.
- **Rolls, not pads**: diagonal shifts use ``pltpu.roll``; the circular
  wrap zones land only in rows/cols no consumer reads (padding margins).
- **Strided rolls** build the 16-diagonal side tables: row u of a broadcast
  byte row rolled by ``shift + stride*u`` yields all 16 shears at once.
- The main/probe side tables share one (16, R) matrix pair: main row u is
  glue diagonal ``delta = u+1`` (row 15 masked), probe row u is ``delta = u``
  (row 0 masked) — no sublane slicing anywhere.

The reference semantics being reproduced: greedy longest-match with lowest
ring index (BrianPugh/tamp tamp/compressor.py:432-447) including the
linear-buffer cap and the write-head wrap candidates of its ring layout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.search_np import LMAX, MatchTables
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["match_tables_pallas", "pallas_available"]

_F = jnp.float32

# Megablock grid sizes (chunks per device call); see match_tables_pallas.
_GRID_TIERS = (64, 1024, 8192)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _runs16(E, shift):
    """Leading-ones runs via log-doubling (4 shifted selects, not 15 ANDs).

    f32 throughout: Mosaic's rotate only handles 32-bit vectors, and the MXU
    hands us f32 anyway; run values <= 16 are exact."""
    L = E
    for k in (1, 2, 4, 8):
        L = L + jnp.where(L == k, shift(L, k), 0.0)
    return L


def _kernel_body(seg, d, t0, window_bits, T, tables):
    """Requested tables for one chunk.

    ``seg``: (1, Qseg) int16 = C[t0 : t0+Qseg]; ``d``: (1, Rd) int16.
    Returns dict of (len, idx) (1, T) int32 pairs.
    """
    W = 1 << window_bits
    R = T + LMAX            # stream positions with look-ahead (lanes)
    Qs = T + W + LMAX       # source positions (sublanes)
    Qseg = seg.shape[1]
    Rd = d.shape[1]

    # ---- E via one-hot MXU matmul ------------------------------------
    sym = lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    oh_s = (seg[:, :Qs] == sym).astype(jnp.bfloat16)  # (256, Qs)
    oh_d = (d[:, :R] == sym).astype(jnp.bfloat16)     # (256, R)
    E = lax.dot_general(
        oh_s, oh_d, (((0,), (0,)), ((), ())), preferred_element_type=_F
    )  # (Qs, R) f32: E[q, r] = (seg[q] == d[r])

    def shift2(M, k):  # M[q+k, r+k]; wrap zones unread (padding margins)
        return pltpu.roll(pltpu.roll(M, Qs - k, 0), R - k, 1)

    run16 = _runs16(E, shift2)

    # ---- ring geometry ------------------------------------------------
    tau = (t0 + lax.broadcasted_iota(jnp.int32, (1, Rd), 1)) % W
    xq = (t0 + lax.broadcasted_iota(jnp.int32, (Qs, 1), 0)) % W
    capq = W - xq                                     # (Qs, 1) int32
    qi = lax.broadcasted_iota(jnp.int32, (Qs, R), 0)
    ri = lax.broadcasted_iota(jnp.int32, (Qs, R), 1)
    mask_big = (qi >= ri) & (qi - ri <= W - LMAX)
    # Integer packed score: len * W + (W - 1 - x); values < 2^20.
    slot_term = (capq - 1).astype(_F)                 # = W - 1 - x(q)
    capf = jnp.minimum(capq, LMAX).astype(_F)         # run cap is <= 16

    def big_score(u, cap_pat):
        u = jnp.minimum(jnp.minimum(u, capf), float(cap_pat))
        s = jnp.where(mask_big, u * W + slot_term, -1.0)
        return jnp.max(s, axis=0, keepdims=True).astype(jnp.int32)  # (1, R)

    # ---- 16-diagonal side tables via strided rolls -------------------
    # ebit[u, r] = (d[r] == seg[r + W - 1 - u])  (glue diagonal dd = u+1)
    # gbit[u, r] = (d[r + u + 1] == seg[r])  (continuation diagonal dd = u+1)
    # Assembled row-by-row: one lane-roll + compare per diagonal, merged
    # with a row-index select (strided rotates only allow tiny strides).
    urows = lax.broadcasted_iota(jnp.int32, (LMAX, Rd), 0)
    seg_r = seg[:, :Rd]
    ebit = jnp.zeros((LMAX, Rd), _F)
    gbit = jnp.zeros((LMAX, Rd), _F)
    for u in range(LMAX):
        seg_sh = pltpu.roll(seg, (Qseg - (W - 1 - u)) % Qseg, 1)[:, :Rd]
        e_row = (d == seg_sh).astype(_F)
        d_sh = pltpu.roll(d, Rd - (u + 1), 1)
        g_row = (d_sh == seg_r).astype(_F)
        ebit = jnp.where(urows == u, e_row, ebit)
        gbit = jnp.where(urows == u, g_row, gbit)

    def shift_lanes(M, k):
        return pltpu.roll(M, Rd - k, 1)

    v16 = _runs16(ebit, shift_lanes)   # lin runs along the stream
    gv = _runs16(gbit, shift_lanes)    # glue continuations gd[u+1]

    urow = lax.broadcasted_iota(jnp.int32, (LMAX, 1), 0)

    def mini_score(v, contin, delta, row_ok, cap_pat):
        v = v.astype(jnp.int32)
        tau_ge = tau >= delta
        x_cross = tau - delta
        x_old = x_cross + W
        glued = delta + jnp.minimum(contin.astype(jnp.int32), cap_pat - delta)
        val_cross = jnp.minimum(jnp.where(v >= delta, glued, v), W - x_cross)
        val_old = jnp.minimum(v, W - x_old)
        val = jnp.minimum(jnp.where(tau_ge, val_cross, val_old), cap_pat)
        x = jnp.where(tau_ge, x_cross, x_old)
        s = jnp.where(row_ok, val * W + (W - 1 - x), -1)
        return jnp.max(s, axis=0, keepdims=True)      # (1, Rd) int32

    def finish(s):  # (1, T) packed int32 score -> ((1, T) len, (1, T) slot)
        ln = s // W
        return ln, W - 1 - (s - ln * W)

    out = {}
    # Main: row u is glue diagonal delta = u + 1 (u = 15 is not a glue case).
    delta_m = urow + 1
    ok_m = urow < LMAX - 1
    if "15" in tables:
        s = jnp.maximum(
            big_score(run16, 15)[:, :T],
            mini_score(v16, gv, delta_m, ok_m, 15)[:, :T],
        )
        out["15"] = finish(s)
    if "16" in tables:
        s = jnp.maximum(
            big_score(run16, 16)[:, :T],
            mini_score(v16, gv, delta_m, ok_m, 16)[:, :T],
        )
        out["16"] = finish(s)
    if "probe" in tables:
        # Probe: lin run starts one position later (lane roll); row u is
        # delta = u with continuation gd[u+1] = gv row u (row 0 masked).
        run_p = pltpu.roll(run16, R - 1, 1)
        v_p = pltpu.roll(v16, Rd - 1, 1)
        delta_p = urow
        ok_p = urow >= 1
        s = jnp.maximum(
            big_score(run_p, 15)[:, :T],
            mini_score(v_p, gv, delta_p, ok_p, 15)[:, :T],
        )
        out["probe"] = finish(s)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("window_bits", "T", "tables", "n_chunks", "interpret"),
)
def _search_pallas(C2, d2, base, window_bits, T, tables, n_chunks, interpret):
    """``n_chunks`` fixed-size chunks for each of S independent shards.

    ``C2``/``d2`` are (S, L); ``base`` is (S,) — each shard's absolute
    stream offset (ring slots depend on it).  The megablock host path uses
    S=1 with a nonzero base; the fused device-encode path batches whole
    shards (each base 0) through grid=(S, n_chunks).  A handful of
    (window, T, tables, n_chunks) programs serve any input."""
    W = 1 << window_bits
    Qseg = _round_up(T + W + 2 * LMAX, 128)
    Rd = _round_up(T + 2 * LMAX, 128)
    n_out = 2 * len(tables)
    S = C2.shape[0]

    def kernel(base_ref, C_ref, d_ref, *rest):
        out_refs = rest[:n_out]
        seg_buf, d_buf, res_buf, in_sem, out_sem = rest[n_out:]
        s = pl.program_id(0)
        i = pl.program_id(1)
        t0 = i * T
        slot = lax.rem(i, 2)
        nxt = 1 - slot

        # Revolving input buffers: chunk i+1's DMA flies during i's compute
        # (within a shard; the first chunk of each shard pays one stall).
        def in_copies(sl, sh, idx):
            t = idx * T
            return (
                pltpu.make_async_copy(
                    C_ref.at[sh, :, pl.ds(t, Qseg)], seg_buf.at[sl],
                    in_sem.at[sl, 0]
                ),
                pltpu.make_async_copy(
                    d_ref.at[sh, :, pl.ds(t, Rd)], d_buf.at[sl],
                    in_sem.at[sl, 1]
                ),
            )

        @pl.when(i == 0)
        def _():
            for cp in in_copies(slot, s, i):
                cp.start()

        @pl.when(i + 1 < n_chunks)
        def _():
            for cp in in_copies(nxt, s, i + 1):
                cp.start()

        for cp in in_copies(slot, s, i):
            cp.wait()

        res = _kernel_body(
            seg_buf[slot], d_buf[slot], base_ref[s] + t0, window_bits, T,
            tables
        )

        # Previous step's output DMAs must land before reusing the buffers.
        @pl.when(i > 0)
        def _():
            for k in range(n_out):
                pltpu.make_async_copy(
                    res_buf.at[k],
                    out_refs[k].at[s, :, pl.ds((i - 1) * T, T)],
                    out_sem.at[k],
                ).wait()

        k = 0
        for key in ("15", "16", "probe"):
            if key in res:
                ln, ix = res[key]
                res_buf[k] = ln
                res_buf[k + 1] = ix
                k += 2
        for k in range(n_out):
            pltpu.make_async_copy(
                res_buf.at[k], out_refs[k].at[s, :, pl.ds(t0, T)],
                out_sem.at[k]
            ).start()

        @pl.when(i == n_chunks - 1)
        def _():
            for k in range(n_out):
                pltpu.make_async_copy(
                    res_buf.at[k], out_refs[k].at[s, :, pl.ds(t0, T)],
                    out_sem.at[k]
                ).wait()

    outs = pl.pallas_call(
        kernel,
        grid=(S, n_chunks),
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, n_chunks * T), jnp.int32)
            for _ in range(n_out)
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)],
        scratch_shapes=[
            pltpu.VMEM((2, 1, Qseg), jnp.int32),
            pltpu.VMEM((2, 1, Rd), jnp.int32),
            pltpu.VMEM((n_out, 1, T), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((n_out,)),
        ],
        interpret=interpret,
    )(
        base.reshape(-1).astype(jnp.int32),
        C2.reshape(S, 1, -1),
        d2.reshape(S, 1, -1),
    )
    return [o.reshape(S, -1) for o in outs]


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    """Whether the compiled Pallas path is usable (TPU backend present)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def match_tables_pallas(
    data: np.ndarray,
    dictionary: np.ndarray,
    window_bits: int,
    compute_probe: bool = False,
    chunk_rows: int | None = None,
    tables: tuple = ("15", "16"),
    interpret: bool | None = None,
) -> MatchTables:
    """Host wrapper: pad, run the Pallas kernel, unpad into MatchTables.

    ``tables`` selects which main tables to compute ("15"/"16"); the probe
    pair is appended automatically when ``compute_probe``.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dictionary = np.ascontiguousarray(dictionary, dtype=np.uint8)
    W = 1 << window_bits
    if dictionary.shape[0] != W:
        raise ValueError("dictionary size must equal window size")
    N = data.shape[0]
    tables = tuple(tables)
    if compute_probe and "probe" not in tables:
        tables = tables + ("probe",)
    if N == 0:
        e8, e32 = np.zeros(0, np.uint8), np.zeros(0, np.int32)
        p = (e8, e32) if compute_probe else (None, None)
        return MatchTables(e8, e32, e8, e32, *p)
    if interpret is None:
        interpret = not pallas_available()

    T = chunk_rows or 256
    assert T % 128 == 0, "chunk_rows must be lane-aligned"
    Qseg = _round_up(T + W + 2 * LMAX, 128)

    # Fixed-grid megablocks: the kernel compiles per (window, T, tables,
    # tier) only — compiles take minutes on the remote service, so the grid
    # size must not depend on the input length.  The absolute stream offset
    # is a traced scalar (ring geometry needs it).
    n_chunks_total = -(-N // T)
    NC = next((t for t in _GRID_TIERS if n_chunks_total <= t), _GRID_TIERS[-1])
    B = NC * T
    n_blocks = -(-n_chunks_total // NC)
    Npad = n_blocks * B

    C = np.full(W + Npad + Qseg, -1, dtype=np.int32)
    C[:W] = dictionary
    C[W : W + N] = data
    data_rows = np.full(Npad + Qseg, 0x1FF, dtype=np.int32)
    data_rows[:N] = data

    parts = [[] for _ in range(2 * len(tables))]
    for m in range(n_blocks):
        off = m * B
        C_sl = C[off : off + B + Qseg]
        d_sl = data_rows[off : off + B + Qseg]
        # The remote TPU compile service occasionally 500s; retry transient
        # failures (the jit cache retriggers compilation).
        for attempt in range(3):
            try:
                outs = _search_pallas(
                    jnp.asarray(C_sl[None, :]),
                    jnp.asarray(d_sl[None, :]),
                    jnp.int32(off),
                    window_bits,
                    T,
                    tables,
                    NC,
                    interpret,
                )
                break
            except Exception as e:  # jax.errors.JaxRuntimeError and friends
                if attempt == 2 or "remote_compile" not in str(e):
                    raise
                import time

                time.sleep(1.0 + attempt)
        for k, o in enumerate(outs):
            parts[k].append(np.asarray(o).reshape(-1))
    outs = [np.concatenate(p)[:N] if len(p) > 1 else p[0][:N] for p in parts]

    res = {}
    k = 0
    for key in ("15", "16", "probe"):
        if key in tables:
            res[key] = (outs[k], outs[k + 1])
            k += 2

    def pair(key):
        if key not in res:
            return None, None
        ln, ix = res[key]
        return ln.astype(np.uint8), ix

    l15, i15 = pair("15")
    l16, i16 = pair("16")
    pl_, pi = pair("probe")
    if l15 is None:
        l15, i15 = l16, i16  # committer only reads the cap it asked for
    if l16 is None:
        l16, i16 = l15, i15
    return MatchTables(l15, i15, l16, i16, pl_, pi)
