"""Band-space Pallas TPU kernel for the extended match tables.

Produces the table families the extended pipeline consumes — cap-16
(basic-match candidates), cap-``LEXT`` (the planned walk's one-shot
extended search), and optionally the cap-15 *probe* family (lazy
matching: target ``data[t+1:]`` against the ring state at ``t``) — for S
shards in one kernel, element-exact vs :mod:`tamp_tpu.ops.match_ext_mxu`
(itself element-exact vs the NumPy oracles, which encode the reference
search semantics: BrianPugh/tamp compressor.py:432-447 and the planned
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
one-hot MXU matmul: the 128 band rows of a block are the byte stream
sheared by b, built from a per-block (1, R + 128) SLAB of C with
two-level lane rolls (8 base shears, then one roll per 8-row group) —
the shear cost is independent of W.  Blocks are processed by ONE
``lax.fori_loop`` whose body reuses the same VMEM scratch (the round-3
Python-unrolled form made Mosaic hold every block's temporaries live:
scoped-VMEM OOM from window 12 up and W-linear compile cost); only the
last two blocks are peeled so the glue-diagonal stash stays a static
store.  Runs never leave their row, so only the final score max-reduce
crosses blocks, carried as four (1, R) rows.

Exactness notes:

- Lane r of chunk t0 is stream position t0 + r; the ring slot of
  candidate (b, r) is (t0 + r + b) mod W and its linear-buffer cap is
  W - slot (same geometry as the XLA kernel).
- ``pltpu.roll`` WRAPS: a roll by k corrupts lanes [R-k, R).  The
  next-zero suffix-min run scan (_runs) reads ``_scan_window(LEXT)``
  lanes ahead UNGATED, and the deepest consumed glue row shifts another
  LEXT-1 lanes, so R carries slack for both (see the wrapper's R
  formula) to keep every consumed lane clear of the wrap zones.
- f32 run arithmetic: Mosaic's roll handles 32-bit vectors only, and
  every packed score stays below 2^24 (LEXT*W + W < 2^23 at W = 2^15).

The head-crossing glue diagonals (delta = 1..LEXT-1) reuse the top
``_ND`` band rows for their candidate runs (stashed from the two peeled
blocks); their post-head continuation runs come from a small (_ND, R)
matrix built directly from the rolled data row.

Probe (lazy-matching) family: the probe candidate at band b is the MAIN
run at band b-1, lane r+1 (same source byte ``C[t + j]``, target moved
one ahead) — one lane roll plus one sublane roll of the block's run
matrix, with the previous block's last row carried across the seam; the
write-head slot (j = 0) comes from the dd = 1 glue row and the probe
glue zone (dd = 1..14) reuses the stash shifted by one band.  Element
parity for all three families:
tests/test_search_kernels.py::test_ext_pallas_tables_match_oracle.

Round 5 added a second formulation, ``_kernel_swar`` (the default for
non-probe configs): the fori band blocks work on 4-bytes-per-int32 WORD
lanes — measured, the per-round ``pltpu.roll`` is the byte kernel's
dominant cost, so quartering the rolled lanes (packed-word group rolls,
carry-free SWAR mismatch masks, a word-level next-mismatch scan, exact
per-phase byte reassembly, phase-major score carries interleaved by one
XLA transpose) bought w10 31->21, w12 91->52, w15 680->510 ms/MB with
element parity held on chip.  The peeled blocks and glue diagonals stay
in byte space in both kernels.
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


def _scan_window(cap: int) -> int:
    """Lane read-depth of _runs: the suffix-min covers 2^K - 1 >= cap."""
    w = 1
    while w < cap + 1:
        w *= 2
    return w - 1


def _runs(E, R: int, cap: int):
    """Leading-ones run lengths along lanes via a next-zero suffix-min
    scan: Z[r] = lane index of the first zero at >= r, run = Z - r.

    Replaces the round-3/4 gated log-doubling
    (``L + where(L == k, roll(L, k), 0)``, 4 vector ops per round) with
    2 ops per round.  Measured on-chip (w15): ~10% — the roll itself,
    not the elementwise ops, is the dominant per-round cost, so halving
    the cheap ops moves less than the op count suggests; the next level
    (rolling quarter-width SWAR-packed lanes) is parked in BASELINE.md.
    The price here is UNGATED read depth: every lane reads
    ``_scan_window(cap)`` lanes ahead regardless of data (the doubling's
    ``L == k`` gate bounded reads by the true run length), so the
    wrapper's R slack must cover the full window plus the deepest
    consumed glue row.  Values with no mismatch inside the window
    saturate at >= cap and every consumer caps with ``min(., cap_pat)``.
    """
    rows = E.shape[0]
    # Mosaic's tpu.iota is integer-only: build int32, cast
    ri = lax.broadcasted_iota(jnp.int32, (rows, R), 1).astype(_F)
    z = jnp.where(E == 0.0, ri, 65536.0)
    k = 1
    while k <= cap:
        z = jnp.minimum(z, pltpu.roll(z, R - k, 1))
        k *= 2
    return z - ri


def _kernel(C_ref, d_ref, *refs,
            window_bits: int, LEXT: int, T: int, R: int, LSEG: int,
            n_chunks: int, probe: bool, unroll: bool, ext_family: bool):
    n_out = (4 if ext_family else 2) + (2 if probe else 0)
    outs = refs[:n_out]
    (seg_buf, d_buf, a8, ebb, vst, gb, res, in_sem, out_sem) = refs[n_out:]
    W = 1 << window_bits
    BLK = 128
    RB = R + BLK  # slab width: bands [B0, B0+128) need C[t0+B0 .. +R+128)
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

    d = d_buf[slot]              # (1, R) int32
    dbc = jnp.broadcast_to(d, (8, R))

    # base shears once per chunk: a8[j0][l] = C[t0 + l + j0] over the whole
    # segment (narrow (1, LSEG) rolls are poor VPU shapes — don't repeat
    # them per block)
    seg = seg_buf[slot]          # (1, LSEG) int32
    for j0 in range(8):
        a8[j0: j0 + 1, :] = pltpu.roll(seg, (LSEG - j0) % LSEG, 1)

    ri_b = lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
    bi_b = lax.broadcasted_iota(jnp.int32, (BLK, R), 0)
    neg1 = jnp.full((1, R), -1.0, _F)

    # ---- one 128-band block: shear slab -> eq -> runs -> scores ----------
    def block(blk, s16, sx, sp, prev):
        """blk may be traced (fori_loop) or static (the two peeled blocks);
        returns the updated carries plus this block's run matrix."""
        slab8 = a8[:, pl.ds(blk * BLK, RB)]             # (8, RB)
        for a in range(BLK // 8):
            g = pltpu.roll(slab8, (RB - 8 * a) % RB, 1)
            ebb[8 * a: 8 * a + 8, :] = (g[:, :R] == dbc).astype(_F)
        lrb = _runs(ebb[:, :], R, LEXT)       # (BLK, R) f32

        band = bi_b + blk * BLK
        x = (t0 + ri_b + band) & (W - 1)
        capq = (W - x).astype(_F)
        slot_term = capq - 1.0

        def mscore(u_rows, cap_pat, acc, bmax, pre_capped=False):
            u = u_rows if pre_capped else jnp.minimum(u_rows, capq)
            u = jnp.minimum(u, float(cap_pat))
            sc = jnp.where(band <= bmax, u * W + slot_term, -1.0)
            return jnp.maximum(acc, jnp.max(sc, axis=0, keepdims=True))

        uq = jnp.minimum(lrb, capq)  # shared room cap for s16/sx
        s16 = mscore(uq, 16, s16, W - 16, pre_capped=True)
        if ext_family:
            sx = mscore(uq, LEXT, sx, W - LEXT, pre_capped=True)
        if probe:
            # probe run at (band b, lane r) = main run at (b-1, r+1); the
            # block's row 0 takes the previous block's carried last row
            sh = pltpu.roll(lrb, R - 1, 1)              # lane r -> r+1 value
            pm = pltpu.roll(sh, 1, 0)                   # band b -> b-1's row
            pm = jnp.where(bi_b == 0, jnp.broadcast_to(prev, (BLK, R)), pm)
            sp = mscore(pm, 15, sp, W - 15)
            prev = sh[BLK - 1: BLK, :]
        return s16, sx, sp, prev, lrb

    def body(blk, carry):
        s16, sx, sp, prev = carry
        s16, sx, sp, prev, _ = block(blk, s16, sx, sp, prev)
        return s16, sx, sp, prev

    # probe init: a zero row scores 0*W + slot_term at band 0, exactly what
    # the j = 0 special (below) also scores when its run is 0 — absorbed.
    carry = (neg1, neg1, neg1, jnp.zeros((1, R), _F))
    if unroll:
        # straight-line blocks software-pipeline markedly better in Mosaic
        # (measured ~4x at w=10); used for small windows where the unrolled
        # graph stays cheap to compile
        for blk in range(n_blk - 2):
            carry = body(blk, carry)
    else:
        carry = lax.fori_loop(0, n_blk - 2, body, carry)

    # last two blocks peeled: they own the glue-candidate stash
    # (bands >= W - _ND, _ND = 136 <= 2 * BLK), which must be a static store
    s16_m, sx_m, sp_m, prev = carry
    for blk in (n_blk - 2, n_blk - 1):
        s16_m, sx_m, sp_m, prev, lrb = block(blk, s16_m, sx_m, sp_m, prev)
        lo = max(blk * BLK, W - _ND)
        hi = (blk + 1) * BLK
        if hi > lo:
            vst[lo - (W - _ND): hi - (W - _ND), :] = (
                lrb[lo - blk * BLK: hi - blk * BLK, :])

    # ---- glue diagonals delta = 1 .. LEXT-1 ---------------------------
    # vst row i: candidate run on band W - dd, dd = _ND - i.
    # gb row i: continuation bits (d[r + dd + j] == C[t0 + r + j]).
    # Two-level build like the band shears: row irow needs d[r + _ND-irow],
    # consecutive rows step the shift by -1, so 8 REVERSED base shears
    # (db8[j][r] = d[r + 7 - j]) + one (8, R) roll per 8-row group replace
    # 136 narrow (1, R) rolls (1/8 VPU shapes).
    segR = seg[:, :R]
    sg8 = jnp.broadcast_to(segR, (8, R))
    for j in range(8):
        a8[j: j + 1, :R] = pltpu.roll(d, (R - (7 - j)) % R, 1)
    db8 = a8[:, :R]
    for a_g in range(_ND // 8):
        # rows 8*a_g + j (j=0..7): shift _ND - 8*a_g - j = (7-j) + base
        base = _ND - 8 * a_g - 7
        g = pltpu.roll(db8, (R - base) % R, 1)
        gb[8 * a_g: 8 * a_g + 8, :] = (g == sg8).astype(_F)
    gv = _runs(gb[:, :], R, LEXT).astype(jnp.int32)
    v = vst[:, :].astype(jnp.int32)

    ri_g = lax.broadcasted_iota(jnp.int32, (_ND, R), 1)
    dd = _ND - lax.broadcasted_iota(jnp.int32, (_ND, R), 0)
    tau = (t0 + ri_g) & (W - 1)
    tau_ge = tau >= dd
    x_cross = tau - dd
    x_old = x_cross + W

    def gscore(vv, gg, cap_pat, dd_max):
        glued = dd + jnp.minimum(gg, cap_pat - dd)
        val_cross = jnp.minimum(
            jnp.where(vv >= dd, glued, vv), W - x_cross)
        val_old = jnp.minimum(vv, W - x_old)
        val = jnp.minimum(jnp.where(tau_ge, val_cross, val_old), cap_pat)
        xx = jnp.where(tau_ge, x_cross, x_old)
        ok = (dd >= 1) & (dd <= dd_max)
        sc = jnp.where(ok, val * W + (W - 1 - xx), -1)
        return jnp.max(sc, axis=0, keepdims=True)  # (1, R) int32

    s16 = jnp.maximum(s16_m.astype(jnp.int32), gscore(v, gv, 16, 15))
    if ext_family:
        sx = jnp.maximum(sx_m.astype(jnp.int32),
                         gscore(v, gv, LEXT, LEXT - 1))
    if probe:
        # probe glue: candidate run = main band W-dd-1 at lane r+1 (the
        # stash rolled one band down, one lane left); continuation uses the
        # dd+1 glue row.  Garbage rolled into row 0 (dd = _ND) is masked.
        vp = pltpu.roll(pltpu.roll(vst[:, :], R - 1, 1), 1, 0)
        vp = vp.astype(jnp.int32)
        gvp = pltpu.roll(gv, 1, 0)
        spg = gscore(vp, gvp, 15, 14)
        # j = 0: the write-head slot (x = tau, source C[t]): run = dd=1 glue
        tau1 = (t0 + lax.broadcasted_iota(jnp.int32, (1, R), 1)) & (W - 1)
        g1 = gv[_ND - 1: _ND, :]
        val0 = jnp.minimum(jnp.minimum(g1, 15), W - tau1)
        sp = jnp.maximum(sp_m.astype(jnp.int32), spg)
        sp = jnp.maximum(sp, val0 * W + (W - 1 - tau1))

    # ---- finish & stream out ------------------------------------------
    @pl.when(i > 0)
    def _():
        for k in range(n_out):
            pltpu.make_async_copy(
                res.at[k], outs[k].at[s, :, pl.ds((i - 1) * T, T)],
                out_sem.at[k]).wait()

    wb = window_bits
    res[0] = (s16 >> wb)[:, :T]
    res[1] = ((W - 1) - (s16 & (W - 1)))[:, :T]
    k_res = 2
    if ext_family:
        res[2] = (sx >> wb)[:, :T]
        res[3] = ((W - 1) - (sx & (W - 1)))[:, :T]
        k_res = 4
    if probe:
        res[k_res] = (sp >> wb)[:, :T]
        res[k_res + 1] = ((W - 1) - (sp & (W - 1)))[:, :T]
    for k in range(n_out):
        pltpu.make_async_copy(
            res.at[k], outs[k].at[s, :, pl.ds(t0, T)],
            out_sem.at[k]).start()

    @pl.when(i == n_chunks - 1)
    def _():
        for k in range(n_out):
            pltpu.make_async_copy(
                res.at[k], outs[k].at[s, :, pl.ds(t0, T)],
                out_sem.at[k]).wait()


_M7F = 0x7F7F7F7F
_M80 = -0x7F7F7F80  # 0x80808080 as int32


def _kernel_swar(C_ref, d_ref, Cp_ref, dp_ref, n_ref, *refs,
                 window_bits: int, LEXT: int, T: int, R: int, R4: int,
                 LSEG: int, LSEG4: int, n_chunks: int, ext_family: bool):
    """SWAR quarter-lane variant of _kernel for the fori band blocks.

    The round-5 ledger's roll-dominance finding: each scan round's
    ``pltpu.roll`` over (128, R) byte lanes is the kernel's dominant
    cost.  Here the fori blocks work on 4-bytes-per-int32 WORD lanes
    (128, R4 ~= R/4): per 8-band group ONE packed-word roll + a SWAR
    nonzero-byte mask (the per-byte add never carries across byte
    boundaries) yields the mismatch bits for 4 positions at once; the
    next-mismatch suffix-min scan runs its 6 rounds on quarter-width
    lanes; per-phase assembly rebuilds exact byte-resolution runs from
    the in-word mismatch bits plus the word-level scan.  Scores
    accumulate PHASE-MAJOR (4 rows per family) and the XLA wrapper
    interleaves them back (one cheap transpose+reshape) before merging
    with the byte-resolution plane that the two peeled blocks + glue
    diagonals still produce with the original code (they own the stash
    and are a fixed ~2-block cost).  No probe family: lazy configs keep
    the byte kernel.
    """
    n_out = 2 if ext_family else 1
    outs_ph = refs[:n_out]          # (S, 4, MP4) phase-major scores
    outs_b = refs[n_out: 2 * n_out]  # (S, 1, MP) peeled+glue byte scores
    (seg_buf, d_buf, seg4_buf, d4_buf, a8, cb8, ebb, mmb, vst, gb,
     res_ph, res_b, in_sem, out_sem) = refs[2 * n_out:]
    W = 1 << window_bits
    wb = window_bits
    BLK = 128
    RB = R + BLK
    n_blk = W // BLK
    s = pl.program_id(0)
    i = pl.program_id(1)
    t0 = i * T
    T4 = T // 4
    slot = lax.rem(i, 2)
    nxt = 1 - slot
    npos = n_ref[0, 0, 0]

    def in_copies(sl, sh, idx):
        # word offsets as idx * (T // 4): Mosaic must PROVE the dynamic
        # slice offset divisible by the 128-lane tiling, which a literal
        # multiplication by a static multiple shows and (idx * T) // 4
        # does not
        t = idx * T
        return (
            pltpu.make_async_copy(
                C_ref.at[sh, :, pl.ds(t, LSEG)], seg_buf.at[sl],
                in_sem.at[sl, 0]),
            pltpu.make_async_copy(
                d_ref.at[sh, :, pl.ds(t, R)], d_buf.at[sl],
                in_sem.at[sl, 1]),
            pltpu.make_async_copy(
                Cp_ref.at[sh, :, pl.ds(idx * (T // 4), LSEG4)],
                seg4_buf.at[sl], in_sem.at[sl, 2]),
            pltpu.make_async_copy(
                dp_ref.at[sh, :, pl.ds(idx * (T // 4), R4)],
                d4_buf.at[sl], in_sem.at[sl, 3]),
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

    # ---- packed base rows: cb8[j0][q] = words of C at byte offset
    # t0 + 4q + j0 (j0 = 0..7), from 4 byte-phase pre-shifts ------------
    segp = seg4_buf[slot]            # (1, LSEG4) packed
    nxtw = pltpu.roll(segp, LSEG4 - 1, 1)
    c4 = [segp]
    for sft in (1, 2, 3):
        lo = (segp >> (8 * sft)) & ((1 << (32 - 8 * sft)) - 1)
        c4.append(lo | (nxtw << (32 - 8 * sft)))
    for j0 in range(8):
        row = c4[j0 % 4]
        if j0 >= 4:
            row = pltpu.roll(row, LSEG4 - 1, 1)
        cb8[j0: j0 + 1, :] = row
    dbc4 = jnp.broadcast_to(d4_buf[slot], (8, R4))

    # invalid-target bytes (t0 + 4q + c >= npos) force MISMATCH bits
    PH_BITS = (0x80, 0x8000, 0x800000, -0x80000000)  # byte-c flag bits
    qi1 = lax.broadcasted_iota(jnp.int32, (1, R4), 1)
    base_abs = t0 + 4 * qi1
    iv = jnp.zeros((1, R4), jnp.int32)
    for c in range(4):
        iv = iv | jnp.where(base_abs + c >= npos,
                            jnp.int32(PH_BITS[c]), 0)

    qi = lax.broadcasted_iota(jnp.int32, (BLK, R4), 1)
    bi4 = lax.broadcasted_iota(jnp.int32, (BLK, R4), 0)
    i4 = 4 * qi
    BIG = jnp.int32(1 << 20)

    # slab width: group rolls read slab[q + 2a], q < R4, a < 16; LSEG4
    # >= R4 + 32 always holds (W >= 256), so the slice never clips
    R4P = R4 + 32
    # Two group-roll strategies (the dynamic word offset bb//4 is not
    # 128-aligned, so a pl.ds slice cannot pre-narrow the segment): at
    # big windows ONE full-width roll + 16 narrow slab rolls wins (the
    # segment is ~W/4 words; 16 full-width rolls per block measured
    # +11% at w15); at small windows the extra materialized slab costs
    # more than the narrow rolls save (w12 measured the reverse).
    slab_mode = LSEG4 > 4 * R4P

    def swar_block(blk, acc):
        bb = blk * BLK
        if slab_mode:
            slab = pltpu.roll(cb8[:, :], (LSEG4 - (bb // 4)) % LSEG4,
                              1)[:, :R4P]
        for a in range(BLK // 8):
            if slab_mode:
                g8 = pltpu.roll(slab, (R4P - 2 * a) % R4P, 1)
            else:
                g8 = pltpu.roll(cb8[:, :],
                                (LSEG4 - (bb // 4 + 2 * a)) % LSEG4, 1)
            x = g8[:, :R4] ^ dbc4
            nz = (((x & _M7F) + _M7F) | x) & _M80
            mmb[8 * a: 8 * a + 8, :] = nz | iv
        mmf = mmb[:, :]
        # per-phase mismatch flags; G = first mismatch byte in each word
        zs = [jnp.where((mmf & PH_BITS[p]) != 0, i4 + p, BIG)
              for p in range(4)]
        G = jnp.minimum(jnp.minimum(zs[0], zs[1]),
                        jnp.minimum(zs[2], zs[3]))
        k = 1
        while k <= (LEXT + 3) // 4:   # suffix-min window >= LEXT bytes
            G = jnp.minimum(G, pltpu.roll(G, R4 - k, 1))
            k *= 2
        Gs1 = pltpu.roll(G, R4 - 1, 1)
        Sp = [None] * 4
        Sp[3] = jnp.minimum(zs[3], Gs1)
        for p in (2, 1, 0):
            Sp[p] = jnp.minimum(zs[p], Sp[p + 1])
        band = bi4 + bb
        xb = t0 + i4 + band
        rows16, rowsx = [], []
        for p in range(4):
            run = Sp[p] - (i4 + p)
            xp = (xb + p) & (W - 1)
            capq = W - xp
            u = jnp.minimum(run, capq)
            st = capq - 1
            sc16 = jnp.where(band <= W - 16,
                             (jnp.minimum(u, 16) << wb) + st, -1)
            rows16.append(jnp.max(sc16, axis=0, keepdims=True))
            if ext_family:
                scx = jnp.where(band <= W - LEXT,
                                (jnp.minimum(u, LEXT) << wb) + st, -1)
                rowsx.append(jnp.max(scx, axis=0, keepdims=True))
        upd = jnp.concatenate(rows16 + rowsx, axis=0)  # (4*n_out, R4)
        return jnp.maximum(acc, upd)

    acc0 = jnp.full((4 * n_out, R4), -1, jnp.int32)
    acc = lax.fori_loop(0, n_blk - 2, swar_block, acc0)

    # ---- the two peeled blocks + glue: original byte-space code --------
    # (they own the glue stash; fixed ~2-block cost at any window)
    d = d_buf[slot]
    dbc = jnp.broadcast_to(d, (8, R))
    seg = seg_buf[slot]
    for j0 in range(8):
        a8[j0: j0 + 1, :] = pltpu.roll(seg, (LSEG - j0) % LSEG, 1)
    ri_b = lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
    bi_b = lax.broadcasted_iota(jnp.int32, (BLK, R), 0)
    neg1 = jnp.full((1, R), -1.0, _F)
    s16_m = sx_m = neg1
    for blk in (n_blk - 2, n_blk - 1):
        slab8 = a8[:, pl.ds(blk * BLK, RB)]
        for a in range(BLK // 8):
            g = pltpu.roll(slab8, (RB - 8 * a) % RB, 1)
            ebb[8 * a: 8 * a + 8, :] = (g[:, :R] == dbc).astype(_F)
        lrb = _runs(ebb[:, :], R, LEXT)
        band = bi_b + blk * BLK
        x = (t0 + ri_b + band) & (W - 1)
        capq = (W - x).astype(_F)
        slot_term = capq - 1.0
        uq = jnp.minimum(lrb, capq)
        sc = jnp.where(band <= W - 16,
                       jnp.minimum(uq, 16.0) * W + slot_term, -1.0)
        s16_m = jnp.maximum(s16_m, jnp.max(sc, axis=0, keepdims=True))
        if ext_family:
            sc = jnp.where(band <= W - LEXT,
                           jnp.minimum(uq, float(LEXT)) * W + slot_term,
                           -1.0)
            sx_m = jnp.maximum(sx_m, jnp.max(sc, axis=0, keepdims=True))
        lo = max(blk * BLK, W - _ND)
        hi = (blk + 1) * BLK
        if hi > lo:
            vst[lo - (W - _ND): hi - (W - _ND), :] = (
                lrb[lo - blk * BLK: hi - blk * BLK, :])

    segR = seg[:, :R]
    sg8 = jnp.broadcast_to(segR, (8, R))
    for j in range(8):
        a8[j: j + 1, :R] = pltpu.roll(d, (R - (7 - j)) % R, 1)
    db8 = a8[:, :R]
    for a_g in range(_ND // 8):
        base = _ND - 8 * a_g - 7
        g = pltpu.roll(db8, (R - base) % R, 1)
        gb[8 * a_g: 8 * a_g + 8, :] = (g == sg8).astype(_F)
    gv = _runs(gb[:, :], R, LEXT).astype(jnp.int32)
    v = vst[:, :].astype(jnp.int32)
    ri_g = lax.broadcasted_iota(jnp.int32, (_ND, R), 1)
    dd = _ND - lax.broadcasted_iota(jnp.int32, (_ND, R), 0)
    tau = (t0 + ri_g) & (W - 1)
    tau_ge = tau >= dd
    x_cross = tau - dd
    x_old = x_cross + W

    def gscore(vv, gg, cap_pat, dd_max):
        glued = dd + jnp.minimum(gg, cap_pat - dd)
        val_cross = jnp.minimum(
            jnp.where(vv >= dd, glued, vv), W - x_cross)
        val_old = jnp.minimum(vv, W - x_old)
        val = jnp.minimum(jnp.where(tau_ge, val_cross, val_old), cap_pat)
        xx = jnp.where(tau_ge, x_cross, x_old)
        ok = (dd >= 1) & (dd <= dd_max)
        sc = jnp.where(ok, val * W + (W - 1 - xx), -1)
        return jnp.max(sc, axis=0, keepdims=True)

    s16_b = jnp.maximum(s16_m.astype(jnp.int32), gscore(v, gv, 16, 15))
    if ext_family:
        sx_b = jnp.maximum(sx_m.astype(jnp.int32),
                           gscore(v, gv, LEXT, LEXT - 1))

    # ---- stream out -----------------------------------------------------
    @pl.when(i > 0)
    def _():
        for k in range(n_out):
            pltpu.make_async_copy(
                res_ph.at[k], outs_ph[k].at[s, :, pl.ds((i - 1) * T4, T4)],
                out_sem.at[k]).wait()
            pltpu.make_async_copy(
                res_b.at[k], outs_b[k].at[s, :, pl.ds((i - 1) * T, T)],
                out_sem.at[n_out + k]).wait()

    res_ph[0] = acc[0:4, :T4]
    res_b[0] = s16_b[:, :T]
    if ext_family:
        res_ph[1] = acc[4:8, :T4]
        res_b[1] = sx_b[:, :T]
    for k in range(n_out):
        pltpu.make_async_copy(
            res_ph.at[k], outs_ph[k].at[s, :, pl.ds(i * T4, T4)],
            out_sem.at[k]).start()
        pltpu.make_async_copy(
            res_b.at[k], outs_b[k].at[s, :, pl.ds(t0, T)],
            out_sem.at[n_out + k]).start()

    @pl.when(i == n_chunks - 1)
    def _():
        for k in range(n_out):
            pltpu.make_async_copy(
                res_ph.at[k], outs_ph[k].at[s, :, pl.ds(i * T4, T4)],
                out_sem.at[k]).wait()
            pltpu.make_async_copy(
                res_b.at[k], outs_b[k].at[s, :, pl.ds(t0, T)],
                out_sem.at[n_out + k]).wait()


@functools.partial(
    jax.jit,
    static_argnames=("window_bits", "LEXT", "T", "n_chunks", "probe",
                     "unroll", "interpret", "families", "swar"))
def ext_tables_pallas(dh_b, npos, dict_arr, *, window_bits: int, LEXT: int,
                      T: int = 1024, n_chunks: int = 1, probe: bool = False,
                      unroll: bool | None = None, interpret: bool = False,
                      families: str = "both", swar: bool | None = None):
    """Match-table families for S shards (same contract as
    ops.match_ext_mxu.ext_tables_device).

    ``dh_b``: (S, MP) uint8 model-history bytes (MP = n_chunks * T);
    ``npos``: (S,) int32 valid lengths; ``dict_arr``: (W,) int32.
    Returns (len16, idx16, lenx, idxx[, probe_len, probe_idx]), each
    (S, MP) int32; positions >= npos hold garbage (the planner masks by
    npos).

    ``families="f16"`` computes only the cap-16 (+probe) family and
    returns (len16, idx16[, probe_len, probe_idx]) — the greedy-parity
    device mode needs no cap-LEXT plane, and at LEXT == 16 the ext family
    would be a byte-for-byte duplicate of the cap-16 one (two wasted
    mscore reductions and two wasted output planes per chunk).

    ``swar`` selects the quarter-lane packed-word kernel for the fori
    band blocks (_kernel_swar; default: windows >= 12 without the probe
    family).  Identical outputs; the per-band work runs on R/4 word
    lanes instead of R byte lanes.
    """
    if families not in ("both", "f16"):
        raise ValueError("families must be 'both' or 'f16'")
    ext_family = families == "both"
    W = 1 << window_bits
    if W < 256 or T % 128:
        raise ValueError("ext_tables_pallas needs W >= 256, T % 128 == 0")
    if swar is None:
        # measured uniformly faster at every window (w10 20.8 vs 31.4
        # ms/MB, w12 52 vs 91, w15 510 vs 680); the probe family keeps
        # the byte kernel
        swar = not probe
    if swar and probe:
        raise ValueError("the swar kernel has no probe family; "
                         "use swar=False for lazy configs")
    if swar and T % 512 and not interpret:
        raise ValueError("swar needs T % 512 == 0 (word-chunk DMA offsets "
                         "must be provably 128-aligned)")
    MP = dh_b.shape[1]
    # R slack: the glue rows consume runs at dd <= LEXT-1, each reading
    # the full suffix-min window past its shifted lane (see _runs)
    R = _round_up(T + max(LEXT + 129,
                          LEXT - 1 + _scan_window(LEXT) + 10), 128)
    LSEG = _round_up(R + W, 128)
    R4 = 0
    if swar:
        R4 = _round_up(T // 4 + 128, 128)
        # word-segment constraints: the slab reads up to R4 + 32 words
        # past any block base, and the packed DMA slice SIZE (LSEG // 4)
        # must itself be 128-word aligned — round LSEG up to 512 bytes
        LSEG = _round_up(max(LSEG, 4 * (R4 + 32)), 512)
    S = dh_b.shape[0]
    n_out = (4 if ext_family else 2) + (2 if probe else 0)

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

    if swar:
        LSEG4 = LSEG // 4
        MP4 = MP // 4
        T4 = T // 4
        du8 = dict_arr.astype(jnp.uint8)

        def buildp(dh):
            cb = jnp.concatenate([du8, dh, jnp.zeros(LSEG, jnp.uint8)])
            Cp = lax.bitcast_convert_type(cb.reshape(-1, 4), jnp.int32)
            db = jnp.concatenate([dh, jnp.zeros(4 * R4, jnp.uint8)])
            dp = lax.bitcast_convert_type(db.reshape(-1, 4), jnp.int32)
            return Cp, dp

        Cp2, dp2 = jax.vmap(buildp)(dh_b)
        n_in = jnp.zeros((S, 1, 8), jnp.int32).at[:, 0, 0].set(npos)
        n_fam = 2 if ext_family else 1
        kern = functools.partial(
            _kernel_swar, window_bits=window_bits, LEXT=LEXT, T=T, R=R,
            R4=R4, LSEG=LSEG, LSEG4=LSEG4, n_chunks=n_chunks,
            ext_family=ext_family)
        outs = pl.pallas_call(
            kern,
            grid=(S, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, 8), lambda s, i: (s, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)
                       for _ in range(2 * n_fam)],
            out_shape=(
                [jax.ShapeDtypeStruct((S, 4, MP4), jnp.int32)
                 for _ in range(n_fam)]
                + [jax.ShapeDtypeStruct((S, 1, MP), jnp.int32)
                   for _ in range(n_fam)]),
            scratch_shapes=[
                pltpu.VMEM((2, 1, LSEG), jnp.int32),
                pltpu.VMEM((2, 1, R), jnp.int32),
                pltpu.VMEM((2, 1, LSEG4), jnp.int32),
                pltpu.VMEM((2, 1, R4), jnp.int32),
                pltpu.VMEM((8, LSEG), jnp.int32),
                pltpu.VMEM((8, LSEG4), jnp.int32),
                pltpu.VMEM((128, R), _F),
                pltpu.VMEM((128, R4), jnp.int32),
                pltpu.VMEM((_ND, R), _F),
                pltpu.VMEM((_ND, R), _F),
                pltpu.VMEM((n_fam, 4, T4), jnp.int32),
                pltpu.VMEM((n_fam, 1, T), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.SemaphoreType.DMA((2 * n_fam,)),
            ],
            interpret=interpret,
        )(C2.reshape(S, 1, -1), d2.reshape(S, 1, -1),
          Cp2.reshape(S, 1, -1), dp2.reshape(S, 1, -1), n_in)
        res = []
        for k in range(n_fam):
            full = outs[k].transpose(0, 2, 1).reshape(S, MP)
            sc = jnp.maximum(full, outs[n_fam + k].reshape(S, MP))
            res.append(sc >> window_bits)
            res.append((W - 1) - (sc & (W - 1)))
        return tuple(res)

    if unroll is None:
        # straight-line blocks pipeline slightly better (w10: 31.1 vs 32.4
        # ms/MB) but Mosaic keeps every unrolled block's temporaries live
        # (scoped-VMEM OOM from w=11 up in this structure)
        unroll = window_bits <= 10
    kern = functools.partial(
        _kernel, window_bits=window_bits, LEXT=LEXT, T=T, R=R, LSEG=LSEG,
        n_chunks=n_chunks, probe=probe, unroll=unroll,
        ext_family=ext_family)
    outs = pl.pallas_call(
        kern,
        grid=(S, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out)],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, MP), jnp.int32)
            for _ in range(n_out)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, LSEG), jnp.int32),
            pltpu.VMEM((2, 1, R), jnp.int32),
            pltpu.VMEM((8, LSEG), jnp.int32),
            pltpu.VMEM((128, R), _F),
            pltpu.VMEM((_ND, R), _F),
            pltpu.VMEM((_ND, R), _F),
            pltpu.VMEM((n_out, 1, T), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((n_out,)),
        ],
        interpret=interpret,
    )(C2.reshape(S, 1, -1), d2.reshape(S, 1, -1))
    return tuple(o.reshape(S, MP) for o in outs)


def ext_tables_pallas_host(data, dictionary, window_bits: int, maxpat: int,
                           T: int = 128, probe: bool = False,
                           interpret: bool | None = None,
                           swar: bool | None = None):
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
        probe=probe, interpret=interpret, swar=swar)
    return tuple(np.asarray(o)[0, :N] for o in outs)


@functools.lru_cache(maxsize=1)
def ext_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
