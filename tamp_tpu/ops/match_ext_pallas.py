"""Band-space Pallas TPU kernel for the extended match tables.

Produces BOTH table families — cap-16 (basic-match candidates) and
cap-``LEXT`` (the planned walk's one-shot extended search) — for S shards
in one kernel, element-exact vs :mod:`tamp_tpu.ops.match_ext_mxu` (itself
element-exact vs the NumPy oracles, which encode the reference search
semantics: BrianPugh/tamp compressor.py:432-447 and the planned
committer's one-shot extended search).

Why a second device formulation exists (measured, v5e, 8 x 1 MB shards):
the XLA formulation materializes every log-doubling round of its (R, Q)
run matrix through HBM — ~70 GB of traffic per input MB — and runs at
~90 ms/MB.  Here the working set lives in VMEM and the equality matrix
is stored **diagonal-major** ("band space"):

    Eb[b, r] = (C[t0 + r + b] == data[t0 + r]),    b = candidate band

so a match run follows a ROW (its band is constant along the run) and
every log-doubling round is a lane-only ``pltpu.roll`` + select — no
(k, k) diagonal shifts, no relayouts.  Band space also removes the
one-hot MXU matmul: row b of Eb is the byte stream sheared by b, built
with two-level lane rolls (8 base shears of the segment row, then one
roll per 8-row group).  Rows are processed in 128-band blocks — runs
never leave their row, so only the final score max-reduce crosses
blocks — keeping peak VMEM under ~4 MB (v5e VMEM is ~16 MB/core).

Exactness notes:

- Lane r of chunk t0 is stream position t0 + r; the ring slot of
  candidate (b, r) is (t0 + r + b) mod W and its linear-buffer cap is
  W - slot (same geometry as the XLA kernel).
- ``pltpu.roll`` WRAPS: a roll by k corrupts lanes [R-k, R).  Runs at
  output lanes r < T chain reads at most LEXT lanes ahead (the L == k
  gate only fires on true run prefixes), so R >= T + LEXT + 129 keeps
  every consumed lane clear of the deepest wrap zone (R - 128).
- f32 run arithmetic: Mosaic's roll handles 32-bit vectors only, and
  every packed score stays below 2^24 (LEXT*W + W < 2^23 at W = 2^15).

The head-crossing glue diagonals (delta = 1..LEXT-1) reuse the top
``_ND`` band rows for their candidate runs (stashed while the main
blocks stream by); their post-head continuation runs come from a small
(_ND, R) matrix built directly from the rolled data row.

Probe (lazy-matching) tables are not implemented here; the extended
pipeline routes ``lazy_matching=True`` through the XLA formulation.
Element parity: tests/test_search_kernels.py::test_ext_pallas_tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["ext_tables_pallas", "ext_pallas_available"]

_F = jnp.float32

_ND = 136  # glue-diagonal rows: >= LEXT - 1 (= 133 max), multiple of 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _runs(L, R: int, cap: int):
    """Leading-ones run lengths along lanes via log-doubling."""
    k = 1
    while k < cap:
        L = L + jnp.where(L == k, pltpu.roll(L, R - k, 1), 0.0)
        k *= 2
    return L


def _kernel(C_ref, d_ref, o16l, o16i, oxl, oxi,
            seg_buf, d_buf, a8, ebb, vst, gb, res, in_sem, out_sem,
            *, window_bits: int, LEXT: int, T: int, R: int, LSEG: int,
            n_chunks: int):
    W = 1 << window_bits
    BLK = 128
    n_blk = W // BLK
    s = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * T
    slot = lax.rem(i, 2)
    nxt = 1 - slot

    def in_copies(sl, sh, idx):
        t = idx * T
        return (
            pltpu.make_async_copy(
                C_ref.at[sh, :, pl.ds(t, LSEG)], seg_buf.at[sl],
                in_sem.at[sl, 0]),
            pltpu.make_async_copy(
                d_ref.at[sh, :, pl.ds(t, R)], d_buf.at[sl],
                in_sem.at[sl, 1]),
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

    seg = seg_buf[slot]          # (1, LSEG) int32
    d = d_buf[slot]              # (1, R) int32

    # ---- base shears ---------------------------------------------------
    for j0 in range(8):
        a8[j0 : j0 + 1, :] = pltpu.roll(seg, (LSEG - j0) % LSEG, 1)
    a8v = a8[:, :]
    dbc = jnp.broadcast_to(d, (8, R))

    # ---- main bands in 128-row blocks ---------------------------------
    ri_b = lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
    bi_b = lax.broadcasted_iota(jnp.int32, (BLK, R), 0)
    neg1 = jnp.full((1, R), -1.0, _F)
    s16_main = neg1
    sx_main = neg1
    for blk in range(n_blk):
        for a in range(BLK // 8):
            sh = blk * BLK + 8 * a
            g = pltpu.roll(a8v, (LSEG - sh) % LSEG, 1)
            ebb[8 * a : 8 * a + 8, :] = (g[:, :R] == dbc).astype(_F)
        lrb = _runs(ebb[:, :], R, LEXT)       # (BLK, R) f32

        band = bi_b + blk * BLK
        x = (t0 + ri_b + band) & (W - 1)
        capq = (W - x).astype(_F)
        slot_term = capq - 1.0

        def mscore(cap_pat, acc):
            u = jnp.minimum(jnp.minimum(lrb, float(cap_pat)), capq)
            sc = jnp.where(band <= W - cap_pat, u * W + slot_term, -1.0)
            return jnp.maximum(acc, jnp.max(sc, axis=0, keepdims=True))

        s16_main = mscore(16, s16_main)
        sx_main = mscore(LEXT, sx_main)

        # stash the glue-candidate runs (bands >= W - _ND)
        lo = max(blk * BLK, W - _ND)
        hi = (blk + 1) * BLK
        if hi > lo:
            vst[lo - (W - _ND) : hi - (W - _ND), :] = (
                lrb[lo - blk * BLK : hi - blk * BLK, :])

    # ---- glue diagonals delta = 1 .. LEXT-1 ---------------------------
    # vst row i: candidate run on band W - dd, dd = _ND - i.
    # gb row i: continuation bits (d[r + dd + j] == C[t0 + r + j]).
    segR = seg[:, :R]
    for irow in range(_ND):
        dd = _ND - irow
        d_sh = pltpu.roll(d, (R - dd) % R, 1)
        gb[irow : irow + 1, :] = (d_sh == segR).astype(_F)
    gv = _runs(gb[:, :], R, LEXT).astype(jnp.int32)
    v = vst[:, :].astype(jnp.int32)

    ri_g = lax.broadcasted_iota(jnp.int32, (_ND, R), 1)
    dd = _ND - lax.broadcasted_iota(jnp.int32, (_ND, R), 0)
    tau = (t0 + ri_g) & (W - 1)
    tau_ge = tau >= dd
    x_cross = tau - dd
    x_old = x_cross + W

    def gscore(cap_pat, dd_max):
        glued = dd + jnp.minimum(gv, cap_pat - dd)
        val_cross = jnp.minimum(
            jnp.where(v >= dd, glued, v), W - x_cross)
        val_old = jnp.minimum(v, W - x_old)
        val = jnp.minimum(jnp.where(tau_ge, val_cross, val_old), cap_pat)
        xx = jnp.where(tau_ge, x_cross, x_old)
        ok = (dd >= 1) & (dd <= dd_max)
        sc = jnp.where(ok, val * W + (W - 1 - xx), -1)
        return jnp.max(sc, axis=0, keepdims=True)  # (1, R) int32

    s16 = jnp.maximum(s16_main.astype(jnp.int32), gscore(16, 15))
    sx = jnp.maximum(sx_main.astype(jnp.int32), gscore(LEXT, LEXT - 1))

    # ---- finish & stream out ------------------------------------------
    @pl.when(i > 0)
    def _():
        for k in range(4):
            pltpu.make_async_copy(
                res.at[k], _out_at(o16l, o16i, oxl, oxi, k, s, (i - 1) * T, T),
                out_sem.at[k]).wait()

    wb = window_bits
    res[0] = (s16 >> wb)[:, :T]
    res[1] = ((W - 1) - (s16 & (W - 1)))[:, :T]
    res[2] = (sx >> wb)[:, :T]
    res[3] = ((W - 1) - (sx & (W - 1)))[:, :T]
    for k in range(4):
        pltpu.make_async_copy(
            res.at[k], _out_at(o16l, o16i, oxl, oxi, k, s, t0, T),
            out_sem.at[k]).start()

    @pl.when(i == n_chunks - 1)
    def _():
        for k in range(4):
            pltpu.make_async_copy(
                res.at[k], _out_at(o16l, o16i, oxl, oxi, k, s, t0, T),
                out_sem.at[k]).wait()


def _out_at(o16l, o16i, oxl, oxi, k, s, t, T):
    ref = (o16l, o16i, oxl, oxi)[k]
    return ref.at[s, :, pl.ds(t, T)]


@functools.partial(
    jax.jit,
    static_argnames=("window_bits", "LEXT", "T", "n_chunks", "interpret"))
def ext_tables_pallas(dh_b, npos, dict_arr, *, window_bits: int, LEXT: int,
                      T: int = 1024, n_chunks: int = 1,
                      interpret: bool = False):
    """Both match-table families for S shards (same contract as
    ops.match_ext_mxu.ext_tables_device, probe unsupported).

    ``dh_b``: (S, MP) uint8 model-history bytes (MP = n_chunks * T);
    ``npos``: (S,) int32 valid lengths; ``dict_arr``: (W,) int32.
    Returns (len16, idx16, lenx, idxx), each (S, MP) int32; positions
    >= npos hold garbage (the planner masks by npos).
    """
    W = 1 << window_bits
    if W < 256 or T % 128:
        raise ValueError("ext_tables_pallas needs W >= 256, T % 128 == 0")
    MP = dh_b.shape[1]
    R = _round_up(T + LEXT + 129, 128)
    LSEG = _round_up(R + W, 128)
    S = dh_b.shape[0]

    ci = jnp.arange(W + MP + LSEG, dtype=jnp.int32)
    di = jnp.arange(MP + R, dtype=jnp.int32)

    def build(dh, n):
        C = jnp.concatenate([
            dict_arr.astype(jnp.int32), dh.astype(jnp.int32),
            jnp.zeros(LSEG, jnp.int32)])
        C = jnp.where(ci < W + n, C, -1)
        d = jnp.concatenate([dh.astype(jnp.int32), jnp.zeros(R, jnp.int32)])
        d = jnp.where(di < n, d, 0x1FF)
        return C, d

    C2, d2 = jax.vmap(build)(dh_b, npos)

    kern = functools.partial(
        _kernel, window_bits=window_bits, LEXT=LEXT, T=T, R=R, LSEG=LSEG,
        n_chunks=n_chunks)
    outs = pl.pallas_call(
        kern,
        grid=(S, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, MP), jnp.int32) for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, LSEG), jnp.int32),
            pltpu.VMEM((2, 1, R), jnp.int32),
            pltpu.VMEM((8, LSEG), jnp.int32),
            pltpu.VMEM((128, R), _F),
            pltpu.VMEM((_ND, R), _F),
            pltpu.VMEM((_ND, R), _F),
            pltpu.VMEM((4, 1, T), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(C2.reshape(S, 1, -1), d2.reshape(S, 1, -1))
    return tuple(o.reshape(S, MP) for o in outs)


def ext_tables_pallas_host(data, dictionary, window_bits: int, maxpat: int,
                           T: int = 128, interpret: bool | None = None):
    """Host convenience wrapper (pads one shard, pulls results) — used by
    the oracle-parity tests; production use keeps the outputs on device."""
    import numpy as np

    data = np.ascontiguousarray(data, np.uint8)
    N = data.shape[0]
    n_chunks = max(1, -(-N // T))
    MP = n_chunks * T
    dh_b = np.zeros((1, MP), np.uint8)
    dh_b[0, :N] = data
    if interpret is None:
        interpret = not ext_pallas_available()
    outs = ext_tables_pallas(
        jnp.asarray(dh_b), jnp.asarray(np.asarray([N], np.int32)),
        jnp.asarray(np.ascontiguousarray(dictionary, np.uint8)
                    .astype(np.int32)),
        window_bits=window_bits, LEXT=maxpat, T=T, n_chunks=n_chunks,
        interpret=interpret)
    return tuple(np.asarray(o)[0, :N] for o in outs)


@functools.lru_cache(maxsize=1)
def ext_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
