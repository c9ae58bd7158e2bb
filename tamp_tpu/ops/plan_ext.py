"""VPU field planning for the extended-format (planned-mode) commit walk.

The planned model history is *exact* (engine/plan.py builds ring-end-aware
keeps; the native committer's planned-mode ring-end policies — RLE split,
extended-match split/shorten, one-shot extended search — never let the
true ring diverge from C-hat).  Every decision of the planned walk is then
a pure function of the position:

    arrival at model position p  ->  (bit field, bit count, advance)

computed elementwise here from the match tables, the run structure of the
model stream, and the ring position ``p mod W``.  The scalar-core kernel
(ops/encode_commit_pallas._kernel_fields, dual mode) just pushes fields
and jumps — identical to the v1 planned-fields walk, with 8-bit advances
(RLE chunks advance up to 8 kept bytes, extended matches up to 133).

Semantics anchor: _native/tampnative.cpp step() (planned branches) —
byte parity with the native planned committer is asserted by
tests/test_encode_ext_device.py.

Field widths (flag included in HUFFMAN_LENGTHS):
  literal               1 + literal                 <= 9
  fused literal pair    2 * (1 + literal)           <= 18
  basic match           len(sym) + window           <= 9 + 15
  RLE                   9 + (len(sec) - 1) + 4      <= 21
  extended match        7 + (len(sec) - 1) + 3 + window = 18 + window

Every field except the extended match fits 31 bits at any window.  For
window <= 13 the extended field (<= 31 bits) is emitted whole; for window
14/15 it is SPLIT into two pushes — the <= 18-bit header+trail in the A
stream, and the window-bit index carried in the B stream's free high bits
(flag bit 15, index bits 16..30 — 15 bits, exactly window 15's reach).
The commit kernel (ops/encode_commit_pallas._kernel_fields, idx_bits > 0)
performs the second push; bit order on the wire is identical.

Structure: the computation is decomposed into three stages —
``_plan_stage1`` (run-structure scan), ``_plan_stage2`` (decisions +
fields, the elementwise bulk), ``_plan_stage3`` (literal-pair fuse + B
pack) — composed and jitted whole by ``plan_fields_ext`` on EVERY
backend.  The whole-graph jit used to choke the remote TPU compiler
(>17 min, rounds 2-3, forcing an eager op-by-op fallback there); the
culprit was ``lax.associative_scan``'s lowering, not graph size — with
``_rcummin``'s flat formulation the fused graph compiles on the TPU in
~13 s and runs in ~5 ms at the bench geometry (measured round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import (
    EXTENDED_MATCH_SYMBOL,
    HUFFMAN_CODES,
    HUFFMAN_LENGTHS,
    RLE_SYMBOL,
    compute_min_pattern_size,
)

__all__ = ["plan_fields_ext", "derive_region_arrays", "MAX_PLAN_WINDOW"]

MAX_PLAN_WINDOW = 15  # full lattice: >31-bit ext fields split (see above)
SPLIT_WINDOW = 14     # first window needing the two-push extended field


def _rcummin(x, fill):
    """Reverse cumulative minimum along axis 1 via log-doubling with
    STATIC shifts (concat of a slice and a ``fill`` pad).

    Semantically identical to ``lax.associative_scan(jnp.minimum, x,
    reverse=True, axis=1)`` — but that lowering (recursive odd/even
    deinterleave, 20 levels of strided slices at MP = 1M) drove the
    remote TPU compiler into the tens of minutes, where this flat ~60-op
    graph of static slices compiles in seconds (measured round 3).
    """
    S, MP = x.shape
    k = 1
    while k < MP:
        pad = jnp.full((S, min(k, MP)), fill, x.dtype)
        x = jnp.minimum(x, jnp.concatenate([x[:, k:], pad], axis=1))
        k <<= 1
    return x


@functools.partial(jax.jit, static_argnames=("window",))
def derive_region_arrays(rc, *, window: int):
    """(bound, rle_k) derived on device from the chunk-count stream alone.

    ``rc``: (S, MP) int32, the forced-RLE chunk's input run count at each
    chunk's MODEL start, 0 elsewhere — the only region data that has to
    cross the host link (1 byte/position; ``bound`` and ``rle_k`` used to
    ship as two more dense uint8 planes).

    - ``bound[m]`` = distance to the next chunk start strictly after m,
      clipped to 255 (an infinity: the planner only compares match lengths
      <= maxpat < 255 against it).  At every position the planned walk
      visits *outside* a forced region this equals the distance to the next
      region start (a region's first chunk start IS the region start, and
      mid-region chunk starts are only visited with rc >= 2 where the
      forced branch overrides ``bound``), so the planner's decisions are
      unchanged vs the host-computed region bound.
    - ``rle_k[m]`` = min(8, rc, W - m%W): the exact ring-end-aware chunk
      keep rule (engine/plan._chunk_keep_mask — keeps never wrap the ring),
      evaluated at the chunk's model position m.
    """
    MP = rc.shape[1]
    big = jnp.int32(MP + 256)
    p_i = lax.broadcasted_iota(jnp.int32, rc.shape, 1)
    nxt = jnp.where(rc > 0, p_i, big)
    ncs = _rcummin(nxt, big)
    after = jnp.roll(ncs, -1, axis=1).at[:, -1].set(big)
    bound = jnp.minimum(after - p_i, 255)
    rk = jnp.minimum(jnp.minimum(rc, 8), (1 << window) - (p_i & ((1 << window) - 1)))
    return bound, rk


def _select(table, idx):
    """Elementwise table lookup via compare-select (no gather: XLA TPU
    gathers run ~14 ns/element serial — a 15-way vselect chain is free)."""
    out = jnp.zeros_like(idx)
    for i, v in enumerate(table):
        out = jnp.where(idx == i, v, out)
    return out


def _sec_lookup(sec, trail: int):
    """(code, nbits) of the secondary huffman + trail form for secondary
    symbol ``sec`` (0..14) — ONE packed 15-way select (code | nbits << 16)
    instead of two, halving the lookup's op count."""
    packed = []
    for sym in range(15):
        code = int(HUFFMAN_CODES[sym])
        bits = int(HUFFMAN_LENGTHS[sym]) - 1 + trail
        packed.append(code | (bits << 16))
    p = _select(packed, sec)
    return p & 0xFFFF, p >> 16


def _rle_field(count, window: int):
    """(value, nbits) of an RLE token for run length ``count`` (>= 2)."""
    v = count - 2
    sec = v >> 4
    trail = v & 15
    scode, sbits = _sec_lookup(sec, 4)
    head = int(HUFFMAN_CODES[RLE_SYMBOL])
    hb = int(HUFFMAN_LENGTHS[RLE_SYMBOL])
    value = (((head << (sbits - 4)) | scode) << 4) | trail
    return value, hb + sbits


def _ext_field(m, idx, minp: int, window: int):
    """(value, nbits) of an extended-match token of size ``m`` at ``idx``.

    ``idx=None`` returns the header+trail portion only (<= 18 bits) — the
    split form for window >= SPLIT_WINDOW, where the kernel pushes the
    window-bit index as a second field."""
    v = m - minp - 12
    sec = v >> 3
    trail = v & 7
    scode, sbits = _sec_lookup(sec, 3)
    head = int(HUFFMAN_CODES[EXTENDED_MATCH_SYMBOL])
    hb = int(HUFFMAN_LENGTHS[EXTENDED_MATCH_SYMBOL])
    value = ((((head << (sbits - 3)) | scode) << 3) | trail)
    if idx is None:
        return value, hb + sbits
    value = (value << window) | idx
    return value, hb + sbits + window


def _plan_stage1(dh, *, dlast: int):
    """Run structure: previous byte and run availability (the scan)."""
    MP = dh.shape[1]
    p_i = lax.broadcasted_iota(jnp.int32, dh.shape, 1)
    last = jnp.roll(dh, 1, axis=1).at[:, 0].set(dlast)
    chg = (dh != last) | (dh > 255)
    nxt = jnp.where(chg, p_i, MP)
    # next change strictly after p: reverse cummin of change positions,
    # shifted one left
    nch = _rcummin(nxt, jnp.int32(MP))
    nch_after = jnp.roll(nch, -1, axis=1).at[:, -1].set(MP)
    avail = jnp.where(chg, 0, jnp.minimum(nch_after, MP) - p_i)
    avail = jnp.minimum(avail, 16)  # pend cap (steady state)
    return last, avail


def _plan_stage2(dh, last, avail, len16, idx16, lenx, idxx, bound, rle_c,
                 rle_k, plen, pidx, *, window: int, literal: int,
                 lazy: bool):
    """Per-position decision + field values (the elementwise bulk).

    Returns pre-fuse (A, nb, adv, err, use_ev)."""
    minp = compute_min_pattern_size(window, literal)
    W = 1 << window
    lit_flag = 1 << literal
    lit_limit = 256 if literal == 8 else lit_flag
    nbl = literal + 1
    p_i = lax.broadcasted_iota(jnp.int32, dh.shape, 1)
    posring = p_i & (W - 1)
    room = W - posring

    # ---- first-search result (boundary-capped, table idx kept) ----------
    size1 = jnp.minimum(jnp.minimum(len16, bound), 16)

    total = avail
    use_pattern = (total >= 2) & (total <= 6) & (size1 > total)
    do_rle = (total >= 2) & ~use_pattern

    # ---- RLE action (with ring-end split) --------------------------------
    split = total > room  # total <= 7 < 8 in steady state
    rle_cnt = jnp.where(split, room, total)
    lit1 = split & (room == 1)  # 1-byte remainder crosses the ring end

    # ---- pattern action ---------------------------------------------------
    is_match = size1 >= minp

    # ---- lazy deferral ----------------------------------------------------
    # Planned-mode lazy is PURE-POSITION (native step() planned branch,
    # byte parity pinned in tests/test_encode_ext_device.py): a basic
    # match of size <= 8 defers to a literal when the NEXT position
    # matches strictly longer (probe table: target p+1, cap 15, ring
    # state at p) and the probe's source range does not contain the write
    # head.  The deferral fires only in the steady state (bound >= 16,
    # where the cap-15 table equals the exact probe search bit-for-bit),
    # and nothing is cached — the walk at p+1 re-decides from fresh
    # tables.  (Reference CACHE semantics are impure: the cached size
    # propagates into later decisions; they live on the host engines.)
    if lazy:
        overlap = (pidx <= posring) & (posring < pidx + plen)
        go_lazy = (is_match & (size1 <= 8) & (bound >= 16)
                   & (plen > size1) & ~overlap)
    else:
        go_lazy = jnp.zeros(dh.shape, bool)
    ext_entry = is_match & (size1 > minp + 11)
    m = jnp.minimum(lenx, bound)
    # avoid-divergence policy
    ext_fits = m <= room
    ext_short = (~ext_fits) & (room >= minp + 12)
    ext_basic = (~ext_fits) & (room < minp + 12)
    m_emit = jnp.where(ext_fits, m, room)
    splitw = window >= SPLIT_WINDOW  # two-push extended field (31-bit cap)
    ev, en = _ext_field(jnp.maximum(m_emit, minp + 12),
                        None if splitw else idxx, minp, window)
    # basic-match field (covers both the plain match and the ext fallback)
    bm_len = jnp.where(ext_entry, minp + 11, size1)
    bm_idx = jnp.where(ext_entry, idxx, idx16)
    sym = jnp.clip(bm_len - minp, 0, 11)
    hsel = jnp.zeros_like(dh)
    for sy in range(12):
        code = (int(HUFFMAN_CODES[sy]) << window) | (
            int(HUFFMAN_LENGTHS[sy]) + window) << 25
        hsel = jnp.where(sym == sy, code, hsel)
    bv = (hsel & 0x1FFFFFF) | bm_idx
    bn = (hsel >> 25) & 31

    # ---- literal ----------------------------------------------------------
    lv = lit_flag | (dh & 0xFF)
    lerr = dh >= lit_limit
    # the RLE split literal repeats `last` (== dh[p] inside a run)
    lsv = lit_flag | (last & 0xFF)
    lserr = last >= lit_limit

    # ---- RLE field: forced chunk starts and the dynamic action are
    # mutually exclusive A/nb writers (fr overrides below), so ONE lookup
    # on the merged count serves both
    fr = rle_c >= 2
    rcnt = jnp.where(fr, rle_c, rle_cnt)
    rv, rn = _rle_field(jnp.maximum(rcnt, 2), window)

    # ---- compose ----------------------------------------------------------
    # priority: forced-RLE chunk start > dynamic RLE > lazy literal >
    # pattern > literal
    is_lit = ~do_rle & (~is_match | go_lazy)
    A = jnp.where(is_lit, lv, 0)
    nb = jnp.where(is_lit, nbl, 0)
    adv = jnp.where(is_lit, 1, 0)
    err = jnp.where(is_lit, lerr, False)

    use_bm = is_match & ~go_lazy & (~ext_entry | ext_basic) & ~do_rle
    use_ev = is_match & ext_entry & ~ext_basic & ~do_rle
    A = jnp.where(use_bm, bv, A)
    nb = jnp.where(use_bm, bn, nb)
    adv = jnp.where(use_bm, bm_len, adv)
    A = jnp.where(use_ev, ev, A)
    nb = jnp.where(use_ev, en, nb)
    adv = jnp.where(use_ev, jnp.where(ext_short, room, m), adv)

    A = jnp.where(do_rle & ~lit1, rv, A)
    nb = jnp.where(do_rle & ~lit1, rn, nb)
    adv = jnp.where(do_rle & ~lit1, rle_cnt, adv)
    A = jnp.where(do_rle & lit1, lsv, A)
    nb = jnp.where(do_rle & lit1, nbl, nb)
    adv = jnp.where(do_rle & lit1, 1, adv)
    err = jnp.where(do_rle, jnp.where(lit1, lserr, False), err)

    # forced-RLE chunk starts override everything (walk inside regions)
    A = jnp.where(fr, rv, A)
    nb = jnp.where(fr, rn, nb)
    adv = jnp.where(fr, rle_k, adv)
    err = jnp.where(fr, False, err)
    return A, nb, adv, err, use_ev


def _plan_stage3(A, nb, adv, err, use_ev, idxx, *, window: int,
                 literal: int):
    """Fuse literal pairs and pack the B stream."""
    nbl = literal + 1
    is_lit_all = (nb == nbl) & (adv == 1)  # any single-literal action
    nxt_lit = jnp.roll(is_lit_all, -1, axis=1).at[:, -1].set(False)
    pair = is_lit_all & nxt_lit
    A2 = jnp.roll(A, -1, axis=1)
    e2 = jnp.roll(err, -1, axis=1)
    A = jnp.where(pair, (A << nbl) | A2, A)
    nb = jnp.where(pair, 2 * nbl, nb)
    adv = jnp.where(pair, 2, adv)
    err = jnp.where(pair, err | e2, err)

    B = nb | (adv << 6) | (err.astype(jnp.int32) << 14)
    if window >= SPLIT_WINDOW:
        # the literal-pair fuse can never involve an ext position (use_ev
        # implies adv >= minp+12 > 2), so use_ev survives the fuse untouched
        B = B | jnp.where(use_ev, (1 << 15) | (idxx << 16), 0)
    return A, B


def _plan_fields_ext_impl(dh, len16, idx16, lenx, idxx, bound, rle_c, rle_k,
                          *, window: int, literal: int, dlast: int,
                          plen=None, pidx=None, lazy: bool = False):
    """Per-position fields for the planned extended walk.

    All arrays (S, MP) int32 in MODEL space (positions of C-hat minus the
    dictionary): ``dh`` model bytes (padding value > 255); ``len16/idx16``
    cap-16 match table; ``lenx/idxx`` cap-maxpat table; ``bound`` distance
    to the next forced-RLE *chunk* start (large when none) — this equals
    the region bound at every visited non-forced position, because a
    region's first chunk start IS the region start and mid-region chunk
    starts are only visited with rc >= 2 where the forced branch overrides
    it (see derive_region_arrays for the equivalence argument); ``rle_c``
    > 0 at forced-RLE chunk starts = the chunk's input run count, with
    ``rle_k`` its kept (model) length.  ``dlast``: the dictionary's last
    byte (ring byte behind model position 0).

    Returns (A, B): field values and ``nb | adv << 6 | err << 14`` meta.
    """
    last, avail = _plan_stage1(dh, dlast=dlast)
    A, nb, adv, err, use_ev = _plan_stage2(
        dh, last, avail, len16, idx16, lenx, idxx, bound, rle_c, rle_k,
        plen, pidx, window=window, literal=literal, lazy=lazy)
    return _plan_stage3(A, nb, adv, err, use_ev, idxx,
                        window=window, literal=literal)


plan_fields_ext = functools.partial(
    jax.jit, static_argnames=("window", "literal", "dlast", "lazy"))(
    _plan_fields_ext_impl)
