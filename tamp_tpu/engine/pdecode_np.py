"""Parallel Tamp decode — NumPy oracle of the device algorithm.

The token-sequential decoders (``_native``, ``ops/decode_jax``) walk the
bitstream one token at a time.  This module implements the *parallel*
formulation that maps onto a TPU, in NumPy, as the semantics oracle for the
device port (:mod:`tamp_tpu.ops.decode_wavefront`):

1. **Speculative per-bit parse** — for every bit offset ``b`` of the payload,
   decode the token that *would* start at ``b`` (pure table lookups over
   dense arrays; no data dependence on the window).  Yields per-bit token
   records and a jump pointer ``next[b]``.
2. **Boundary resolution** — the real token starts are the orbit of
   ``next`` from bit 0.  Computed either by a sequential chase (ground
   truth) or by block-local pointer doubling + a per-block scan (the
   device-shaped variant; both are implemented and must agree).
3. **Placement** — per-token output counts -> exclusive prefix sum.
4. **Window-write modeling** — the ring is the tail of the *window-write
   stream*; slot ``s`` before token ``j`` holds stream byte
   ``a = A_j-1 - ((A_j-1-s) mod W)`` where ``A_j`` counts writes including
   the ``W``-byte dictionary prefill.  RLE truncation (<= 8 bytes, no wrap)
   and extended-match truncation (no wrap) are per-token write counts
   folded by a short scan (reference behavior: tamp/_c_src/tamp/
   decompressor.c decode_rle / decode_extended_match).
5. **Value resolution** — every output byte's source is a literal, a
   dictionary slot, or an earlier output byte; the source links form a
   forest resolved in ``log2`` rounds of pointer doubling.

Double-FLUSH dictionary resets (``more_header`` streams) re-seed the ring
mid-stream; those segments are handled by restarting the write-stream
arithmetic per segment.

Parity contract: byte-identical to ``_native.native_decompress`` on any
stream (including the permissive decode of trailing zero padding — external
framing is the format's contract, reference specification.rst "Flushing").
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    EXTENDED_MATCH_TRAILING_BITS,
    FLUSH_SYMBOL,
    HUFFMAN_CODES,
    HUFFMAN_LENGTHS,
    RLE_MAX_WINDOW_WRITE,
    RLE_SYMBOL,
    RLE_TRAILING_BITS,
    EXTENDED_MATCH_SYMBOL,
    compute_min_pattern_size,
)
from ..dictionary import dictionary_array
from ..exceptions import OutOfBoundsError

__all__ = ["pdecode", "pdecode_payload"]

# token kinds
K_LIT, K_MATCH, K_RLE, K_EXT, K_FLUSH = 0, 1, 2, 3, 4

_SYM = None
_LEN = None


def _tables():
    global _SYM, _LEN
    if _SYM is None:
        sym = np.full(256, -1, np.int32)
        ln = np.zeros(256, np.int32)
        for s in range(15):
            nb = HUFFMAN_LENGTHS[s] - 1  # code bits after the flag
            base = HUFFMAN_CODES[s] << (8 - nb)
            sym[base : base + (1 << (8 - nb))] = s
            ln[base : base + (1 << (8 - nb))] = nb
        _SYM, _LEN = sym, ln
    return _SYM, _LEN


def _bits_at(payload: np.ndarray, b: np.ndarray, m: int) -> np.ndarray:
    """m bits (<=32) starting at bit offset b (MSB-first), zero-padded."""
    # 40-bit windows per byte index cover any (b & 7) + m <= 39.
    p = payload.astype(np.int64)
    pad = np.zeros(5, np.int64)
    pp = np.concatenate([p, pad])
    w40 = (
        (pp[:-4] << 32) | (pp[1:-3] << 24) | (pp[2:-2] << 16)
        | (pp[3:-1] << 8) | pp[4:]
    )
    sh = 40 - (b & 7) - m
    return ((w40[b >> 3] >> sh) & ((1 << m) - 1)).astype(np.int64)


def _speculative_parse(payload: np.ndarray, window: int, literal: int,
                       extended: bool):
    """Per-bit token parse.  Returns dense per-bit arrays:

    next[b]   : bit offset of the following token (sentinels below)
    kind[b]   : K_*
    f_cnt[b]  : output byte count
    f_idx[b]  : window index (matches) / literal value (literals)
    invalid[b]: True where the bits at b are not a decodable token
    """
    SYM, LEN = _tables()
    L = int(payload.shape[0])
    nb_total = 8 * L
    minp = compute_min_pattern_size(window, literal)

    b = np.arange(nb_total, dtype=np.int64)
    flag = _bits_at(payload, b, 1)

    # literal
    lit_end = b + 1 + literal
    lit_val = _bits_at(payload, np.minimum(b + 1, nb_total - 1), literal)

    # token symbol 1 (8-bit zero-padded peek is safe: codes are a complete
    # prefix set and trailing zeros decode as symbol 0)
    pk1 = _bits_at(payload, np.minimum(b + 1, nb_total - 1), 8)
    s1 = SYM[pk1]
    n1 = LEN[pk1]
    after1 = b + 1 + n1

    is_flush = s1 == FLUSH_SYMBOL
    if extended:
        is_rle = s1 == RLE_SYMBOL
        is_ext = s1 == EXTENDED_MATCH_SYMBOL
    else:
        is_rle = np.zeros(nb_total, bool)
        is_ext = np.zeros(nb_total, bool)
    is_basic = (flag == 0) & ~is_flush & ~is_rle & ~is_ext

    # secondary symbol (RLE / extended)
    pk2 = _bits_at(payload, np.minimum(after1, nb_total - 1), 8)
    s2 = SYM[pk2]
    n2 = LEN[pk2]
    after2 = after1 + n2

    rle_cnt = (s2 << RLE_TRAILING_BITS) + _bits_at(
        payload, np.minimum(after2, nb_total - 1), RLE_TRAILING_BITS) + 2
    rle_end = after2 + RLE_TRAILING_BITS

    ext_sz = (s2 << EXTENDED_MATCH_TRAILING_BITS) + _bits_at(
        payload, np.minimum(after2, nb_total - 1),
        EXTENDED_MATCH_TRAILING_BITS) + minp + 12
    ext_idx = _bits_at(
        payload,
        np.minimum(after2 + EXTENDED_MATCH_TRAILING_BITS, nb_total - 1),
        window)
    ext_end = after2 + EXTENDED_MATCH_TRAILING_BITS + window

    bm_idx = _bits_at(payload, np.minimum(after1, nb_total - 1), window)
    bm_end = after1 + window
    bm_sz = s1 + minp

    flush_end = ((after1 + 7) >> 3) << 3  # byte-align discard

    kind = np.where(flag == 1, K_LIT,
            np.where(is_flush, K_FLUSH,
             np.where(is_rle, K_RLE,
              np.where(is_ext, K_EXT, K_MATCH)))).astype(np.int32)
    end = np.where(flag == 1, lit_end,
           np.where(is_flush, flush_end,
            np.where(is_rle, rle_end,
             np.where(is_ext, ext_end, bm_end))))
    f_cnt = np.where(flag == 1, 1,
             np.where(is_flush, 0,
              np.where(is_rle, rle_cnt,
               np.where(is_ext, ext_sz, bm_sz)))).astype(np.int64)
    f_idx = np.where(flag == 1, lit_val,
             np.where(is_rle, 0,
              np.where(is_ext, ext_idx, bm_idx))).astype(np.int64)

    invalid = ((flag == 0) & (s1 < 0)) | ((is_rle | is_ext) & (s2 < 0))
    # FLUSH consumes n1 bits then discards to the byte boundary; everything
    # else must fit entirely.  A token running past the payload is
    # "incomplete": the sequential decoders roll back and stop there.
    incomplete = np.where(is_flush, after1 > nb_total, end > nb_total)
    nxt = np.where(invalid | incomplete, nb_total, end)
    return nxt, kind, f_cnt, f_idx, invalid, incomplete


def _chase_sequential(nxt: np.ndarray, nb_total: int) -> np.ndarray:
    """Ground-truth boundary resolution: the orbit of next from bit 0."""
    starts = []
    b = 0
    while b < nb_total:
        starts.append(b)
        nb = int(nxt[b])
        if nb <= b:  # invalid/incomplete sentinel landing backwards
            break
        b = nb
    return np.asarray(starts, dtype=np.int64)


def _chase_blocked(nxt: np.ndarray, nb_total: int, block_bits: int = 512):
    """Device-shaped boundary resolution: block-local pointer doubling for
    block exits, a sequential scan over block entries, then block-local
    token enumeration.  Must equal :func:`_chase_sequential`."""
    nblk = (nb_total + block_bits - 1) // block_bits
    padded = nblk * block_bits
    nxt_p = np.full(padded, nb_total, np.int64)
    nxt_p[:nb_total] = nxt
    # clamp stalls (sentinel) so doubling is monotone
    b_idx = np.arange(padded, dtype=np.int64)
    stalled = nxt_p <= b_idx
    jump = np.where(stalled, padded, nxt_p)  # stalled -> jump clean out

    # exit[b] = first position >= end-of-b's-block on the orbit of b
    blk = jump.reshape(nblk, block_bits)
    blk_end = (np.arange(nblk, dtype=np.int64)[:, None] + 1) * block_bits
    ex = blk.copy()
    for _ in range(int(np.ceil(np.log2(max(block_bits, 2))))):
        inside = ex < blk_end  # still within the home block
        local = np.clip(ex - (blk_end - block_bits), 0, block_bits - 1)
        ex = np.where(inside, np.take_along_axis(ex, local, axis=1), ex)
    exits = ex  # (nblk, block_bits)

    # entries: scan block-by-block
    entry = np.full(nblk, -1, np.int64)
    b = 0
    for i in range(nblk):
        if b >= nb_total or b >= padded:
            break
        bi = b // block_bits
        if bi != i:
            entry[i] = -1
            if bi > i:
                continue
        entry[i] = b
        b = int(exits[i, b - i * block_bits])

    # token starts: per block, walk next from the entry (bounded by the
    # shortest token: >= 2 bits)
    starts = []
    for i in range(nblk):
        e = entry[i]
        if e < 0:
            continue
        lim = min((i + 1) * block_bits, nb_total)
        while e < lim:
            starts.append(e)
            ne = int(nxt[e]) if e < nb_total else nb_total
            if ne <= e:
                e = padded
            else:
                e = ne
    return np.asarray(sorted(starts), dtype=np.int64)


def pdecode_payload(payload: bytes | np.ndarray, *, window: int, literal: int,
                    extended: bool, more: bool,
                    dict_init: np.ndarray,
                    dict_reset: np.ndarray | None = None,
                    use_blocked_chase: bool = False) -> bytes:
    """Decode a header-less Tamp payload with the parallel formulation."""
    payload = np.frombuffer(bytes(payload), np.uint8)
    W = 1 << window
    minp = compute_min_pattern_size(window, literal)
    nb_total = 8 * int(payload.shape[0])
    if nb_total == 0:
        return b""

    nxt, kind, f_cnt, f_idx, invalid, incomplete = _speculative_parse(
        payload, window, literal, extended)

    starts = (_chase_blocked if use_blocked_chase else _chase_sequential)(
        nxt, nb_total)
    if starts.size == 0:
        return b""
    # drop the trailing incomplete token (sequential decoders roll it back);
    # an *invalid* reachable token is an error.
    ok = ~(invalid[starts] | incomplete[starts])
    if np.any(invalid[starts]):
        first_bad = starts[invalid[starts]][0]
        # tokens before the invalid one still decode; the native decoder
        # raises after producing them.  Match the exception-first contract.
        raise ValueError(f"invalid token at payload bit {int(first_bad)}")
    starts = starts[ok]
    if starts.size == 0:
        return b""

    tk = kind[starts]
    tcnt = f_cnt[starts]
    tidx = f_idx[starts]
    T = int(starts.size)

    # OOB security check (reference decompressor.c:536-544)
    is_m = tk == K_MATCH
    is_e = tk == K_EXT
    if np.any((is_m | is_e) & (tidx + tcnt > W)):
        raise OutOfBoundsError("window reference out of bounds")

    # --- segments: double-FLUSH dictionary reset (more_header streams) ----
    if more:
        prev_flush = np.concatenate([[False], (tk == K_FLUSH)[:-1]])
        resets = (tk == K_FLUSH) & prev_flush
    else:
        resets = np.zeros(T, bool)
    seg = np.cumsum(resets)  # segment id per token

    # --- placement ---------------------------------------------------------
    out_start = np.concatenate([[0], np.cumsum(tcnt)[:-1]])
    out_len = int(out_start[-1] + tcnt[-1]) if T else 0
    if out_len == 0:
        return b""

    # --- window-write counts (short sequential fold; device: blocked) -----
    wr = np.zeros(T, np.int64)
    A = np.zeros(T, np.int64)  # absolute write-stream position before token
    pos = 0
    acc = W  # includes the dictionary prefill
    for j in range(T):
        if resets[j]:
            pos = 0
            acc = W
        A[j] = acc
        k = tk[j]
        if k == K_LIT:
            w = 1
        elif k == K_MATCH:
            w = tcnt[j]
        elif k == K_RLE:
            w = min(tcnt[j], RLE_MAX_WINDOW_WRITE, W - pos)
        elif k == K_EXT:
            w = min(tcnt[j], W - pos)
        else:
            w = 0
        wr[j] = w
        pos = int((pos + w) % W)
        acc += w

    # --- per-output-byte sources ------------------------------------------
    # value := -(v+1) when resolved; else an earlier output position
    src = np.zeros(out_len, np.int64)
    tok_of = np.repeat(np.arange(T), tcnt)  # token of each output byte
    off = np.arange(out_len) - out_start[tok_of]

    kb = tk[tok_of]
    a = np.zeros(out_len, np.int64)  # absolute window-stream source
    # literal: resolved immediately
    lit_b = kb == K_LIT
    src[lit_b] = -(tidx[tok_of[lit_b]] + 1)
    # rle: previous window byte
    rle_b = kb == K_RLE
    a[rle_b] = A[tok_of[rle_b]] - 1
    # matches: slot idx+off, most recent write-stream byte at that slot
    m_b = (kb == K_MATCH) | (kb == K_EXT)
    s_slot = tidx[tok_of[m_b]] + off[m_b]
    Am1 = A[tok_of[m_b]] - 1
    a[m_b] = Am1 - ((Am1 - s_slot) % W)

    # map absolute a -> value (dictionary, pre-segment base) or output pos
    need = rle_b | m_b
    if np.any(need):
        an = a[need]
        seg_of_byte = seg[tok_of[need]]
        # dictionary bytes: a < W *within the byte's segment* (A resets to
        # W).  A double-FLUSH reset re-seeds from the DEFAULT dictionary
        # even when the stream opened with a custom one (reference
        # tamp/_c_src/tamp/decompressor.c double-FLUSH path).
        if dict_reset is None:
            dict_reset = dict_init
        from_dict = an < W
        vals = np.zeros(an.shape[0], np.int64)
        fd_seg0 = from_dict & (seg_of_byte == 0)
        fd_segN = from_dict & (seg_of_byte > 0)
        vals[fd_seg0] = -(dict_init[an[fd_seg0]].astype(np.int64) + 1)
        vals[fd_segN] = -(dict_reset[an[fd_segN]].astype(np.int64) + 1)
        # output-sourced: owning token via searchsorted over A (A is global
        # monotone even across resets: acc only grows... it does not — acc
        # resets to W).  Search within the segment instead.
        if np.any(~from_dict):
            ao = an[~from_dict]
            so = seg_of_byte[~from_dict]
            # per-segment searchsorted: offset A by segment to restore
            # global monotonicity
            SEGOFF = np.int64(1) << 40
            A_key = A + seg * SEGOFF
            ao_key = ao + so * SEGOFF
            own = np.searchsorted(A_key, ao_key, side="right") - 1
            vals[~from_dict] = out_start[own] + (ao - A[own])
        sv = src[need]
        sv[:] = vals
        src[need] = sv

    # --- pointer-doubling value resolution --------------------------------
    rounds = max(1, int(np.ceil(np.log2(max(out_len, 2)))) + 1)
    for _ in range(rounds):
        unresolved = src >= 0
        if not np.any(unresolved):
            break
        src = np.where(unresolved, src[np.clip(src, 0, out_len - 1)], src)
    if np.any(src >= 0):
        raise AssertionError("pointer doubling failed to resolve")
    return (-src - 1).astype(np.uint8).tobytes()


def pdecode(stream: bytes, *, dictionary: bytes | None = None,
            use_blocked_chase: bool = False) -> bytes:
    """Decode a complete Tamp stream (header included)."""
    data = bytes(stream)
    if not data:
        raise ValueError("empty stream")
    h = data[0]
    window = (h >> 5) + 8
    literal = ((h >> 3) & 3) + 5
    custom = (h >> 2) & 1
    extended = bool((h >> 1) & 1)
    more = bool(h & 1)
    skip = 1
    if more:
        if len(data) < 2:
            raise ValueError("truncated header")
        if data[1] != 0:
            raise ValueError("reserved header byte must be zero")
        skip = 2
    W = 1 << window
    default_dict = dictionary_array(
        W, literal=literal if extended else 8).astype(np.int64)
    if custom:
        if dictionary is None:
            raise ValueError("stream requires a custom dictionary")
        d = np.frombuffer(bytes(dictionary), np.uint8)
        if d.shape[0] < W:
            raise ValueError("dictionary smaller than the window")
        dict_init = d[:W].astype(np.int64)  # oversized: first W bytes used
    else:
        dict_init = default_dict
    return pdecode_payload(
        data[skip:], window=window, literal=literal, extended=extended,
        more=more, dict_init=dict_init, dict_reset=default_dict,
        use_blocked_chase=use_blocked_chase)
