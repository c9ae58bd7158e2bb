"""Wavefront (fully parallel) device Tamp decoder.

Device port of the parallel-decode formulation whose semantics oracle is
:mod:`tamp_tpu.engine.pdecode_np` (byte-parity with the native decoder is
pinned there; this module is pinned element-exact against the oracle and
byte-exact against the native decoder by ``tests/test_decode_wavefront.py``).

Unlike :mod:`tamp_tpu.ops.decode_jax` (a ``vmap``-ed token-serial
``while_loop``: one scalar token per step), every stage here is a dense,
static-shaped array op over the whole payload, so XLA tiles it onto the
VPU and the wall-clock scales with payload size, not token count:

1. **Speculative per-bit parse** — for all ``8*L`` bit offsets at once,
   decode the token that *would* start there (pure table gathers; reference
   token grammar: tamp/_c_src/tamp/decompressor.c decode_huffman /
   decode_rle / decode_extended_match).
2. **Boundary resolution** — the real token starts are the orbit of the
   per-bit jump pointer from bit 0, computed with log2 rounds of
   scatter-OR pointer doubling (``reach |= reach @ J;  J = J[J]``).
3. **Placement** — per-token output counts -> exclusive prefix sum.
4. **Window-write fold** — per-token window-write counts are loop-carried
   only through the *truncation* of RLE (<= 8 bytes, no ring wrap) and
   extended-match (no wrap) writes.  The fold is recast as: untruncated
   prefix sums + a ``while_loop`` over only the RLE/extended tokens
   accumulating truncation deficits — near-zero sequential work on
   typical (match/literal-dominated) streams.
5. **Value resolution** — per-output-byte source links (literal value,
   dictionary slot, or earlier output byte) resolved in log2 rounds of
   pointer doubling.

Double-FLUSH dictionary resets (``more_header`` streams, reference
specification.rst "Custom Dictionaries" / decompressor.c:501-514) segment
the stream; write-stream arithmetic restarts per segment via keyed
searchsorted.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import (
    EXTENDED_MATCH_SYMBOL,
    EXTENDED_MATCH_TRAILING_BITS,
    FLUSH_SYMBOL,
    HUFFMAN_CODES,
    HUFFMAN_LENGTHS,
    RLE_MAX_WINDOW_WRITE,
    RLE_SYMBOL,
    RLE_TRAILING_BITS,
    compute_min_pattern_size,
)
from ..dictionary import dictionary_array
from ..exceptions import OutOfBoundsError
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["decode_shards_wavefront", "wavefront_decode_payload"]

# token kinds (match engine/pdecode_np)
K_LIT, K_MATCH, K_RLE, K_EXT, K_FLUSH, K_PAD = 0, 1, 2, 3, 4, 5

# error codes returned by the kernel
ERR_OK, ERR_INVALID, ERR_OOB, ERR_OVERFLOW, ERR_SEGKEY = 0, 1, 2, 3, 4

I32MAX = np.int32(2**31 - 1)


@functools.lru_cache(maxsize=1)
def _peek_tables():
    sym = np.full(256, -1, np.int32)
    ln = np.zeros(256, np.int32)
    for s in range(15):
        nb = HUFFMAN_LENGTHS[s] - 1  # code bits after the 1-bit flag
        base = HUFFMAN_CODES[s] << (8 - nb)
        sym[base : base + (1 << (8 - nb))] = s
        ln[base : base + (1 << (8 - nb))] = nb
    return sym, ln  # numpy: converted per-trace at the use site


def _bits_at(pp32, b, m: int):
    """m (static, <=16) bits at bit offset ``b`` (MSB-first), zero-padded.

    ``pp32``: payload bytes as uint32, padded with >=8 zero bytes so byte
    gathers stay in-array for every peek offset reachable from b < 8*L.
    """
    i = b >> 3
    r = (b & 7).astype(jnp.uint32)
    w32 = (
        (pp32[i] << 24) | (pp32[i + 1] << 16) | (pp32[i + 2] << 8) | pp32[i + 3]
    )
    # left-align bit b at the MSB; (byte >> 8) == 0 covers the r == 0 lane
    hi = (w32 << r) | (pp32[i + 4] >> (jnp.uint32(8) - r))
    return (hi >> jnp.uint32(32 - m)).astype(jnp.int32)


def _speculative_parse(pp32, nb_valid, NBP: int, window: int, literal: int,
                       extended: bool):
    """Per-bit token parse over all NBP bit offsets (dense gathers)."""
    sym_np, len_np = _peek_tables()
    SYM, LEN = jnp.asarray(sym_np), jnp.asarray(len_np)
    minp = compute_min_pattern_size(window, literal)

    b = jnp.arange(NBP, dtype=jnp.int32)
    flag = _bits_at(pp32, b, 1)

    lit_end = b + 1 + literal
    lit_val = _bits_at(pp32, b + 1, literal)

    pk1 = _bits_at(pp32, b + 1, 8)
    s1 = SYM[pk1]
    n1 = LEN[pk1]
    after1 = b + 1 + n1

    is_flush = s1 == FLUSH_SYMBOL
    if extended:
        is_rle = s1 == RLE_SYMBOL
        is_ext = s1 == EXTENDED_MATCH_SYMBOL
    else:
        is_rle = jnp.zeros(NBP, bool)
        is_ext = jnp.zeros(NBP, bool)

    pk2 = _bits_at(pp32, after1, 8)
    s2 = SYM[pk2]
    n2 = LEN[pk2]
    after2 = after1 + n2

    rle_cnt = (s2 << RLE_TRAILING_BITS) + _bits_at(pp32, after2, RLE_TRAILING_BITS) + 2
    rle_end = after2 + RLE_TRAILING_BITS

    ext_sz = (
        (s2 << EXTENDED_MATCH_TRAILING_BITS)
        + _bits_at(pp32, after2, EXTENDED_MATCH_TRAILING_BITS)
        + minp + 12
    )
    ext_idx = _bits_at(pp32, after2 + EXTENDED_MATCH_TRAILING_BITS, window)
    ext_end = after2 + EXTENDED_MATCH_TRAILING_BITS + window

    bm_idx = _bits_at(pp32, after1, window)
    bm_end = after1 + window
    bm_sz = s1 + minp

    flush_end = ((after1 + 7) >> 3) << 3  # byte-align discard

    lit = flag == 1
    kind = jnp.where(lit, K_LIT,
            jnp.where(is_flush, K_FLUSH,
             jnp.where(is_rle, K_RLE,
              jnp.where(is_ext, K_EXT, K_MATCH)))).astype(jnp.int32)
    end = jnp.where(lit, lit_end,
           jnp.where(is_flush, flush_end,
            jnp.where(is_rle, rle_end,
             jnp.where(is_ext, ext_end, bm_end))))
    f_cnt = jnp.where(lit, 1,
             jnp.where(is_flush, 0,
              jnp.where(is_rle, rle_cnt,
               jnp.where(is_ext, ext_sz, bm_sz)))).astype(jnp.int32)
    f_idx = jnp.where(lit, lit_val,
             jnp.where(is_rle, 0,
              jnp.where(is_ext, ext_idx, bm_idx))).astype(jnp.int32)

    invalid = (~lit & (s1 < 0)) | ((is_rle | is_ext) & (s2 < 0))
    incomplete = jnp.where(is_flush, after1 > nb_valid, end > nb_valid)
    incomplete = incomplete | (b >= nb_valid)
    nxt = jnp.where(invalid | incomplete, NBP, end).astype(jnp.int32)
    return nxt, kind, f_cnt, f_idx, invalid, incomplete


def _reach_from_zero(nxt, NBP: int):
    """Boolean orbit of ``nxt`` from bit 0 via scatter-OR pointer doubling."""
    J = jnp.concatenate([nxt, jnp.asarray([NBP], jnp.int32)])
    reach = jnp.zeros(NBP + 1, jnp.int32).at[0].set(1)
    rounds = max(1, int(math.ceil(math.log2(max(NBP, 2)))) + 1)

    def body(_, carry):
        J, reach = carry
        hop = jnp.zeros_like(reach).at[J].max(reach, mode="drop")
        return J[J], jnp.maximum(reach, hop)

    J, reach = lax.fori_loop(0, rounds, body, (J, reach))
    return reach[:NBP] > 0


def _seg_base(values, resets, seg, n_seg_max: int):
    """Per-token segment-relative exclusive values: values - base-of-segment.

    ``values`` is a global exclusive cumsum; each segment's base is its value
    at the segment's first token (the reset FLUSH).
    """
    base = jnp.zeros(n_seg_max, values.dtype).at[
        jnp.where(resets, seg, n_seg_max)
    ].set(values, mode="drop")
    return values - base[jnp.minimum(seg, n_seg_max - 1)]


def _wavefront_kernel(pp32, nbytes, dict_init, dict_reset, *, NBP: int,
                      window: int, literal: int, extended: bool, more: bool,
                      max_out: int):
    """Decode one padded payload. Returns (out[max_out] int32, out_len, err)."""
    W = 1 << window
    nb_valid = nbytes * 8
    T_max = NBP // (1 + literal) + 2

    nxt, kind_b, cnt_b, idx_b, invalid_b, incomplete_b = _speculative_parse(
        pp32, nb_valid, NBP, window, literal, extended)

    reach = _reach_from_zero(nxt, NBP)
    b_iota = jnp.arange(NBP, dtype=jnp.int32)
    reach = reach & (b_iota < nb_valid)

    err = jnp.where(jnp.any(reach & invalid_b), ERR_INVALID, ERR_OK)

    # token starts, compacted into a T_max table (incomplete tail dropped —
    # the sequential decoders roll it back)
    is_start = reach & ~invalid_b & ~incomplete_b
    tok_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    T = jnp.sum(is_start.astype(jnp.int32))
    starts = jnp.zeros(T_max, jnp.int32).at[
        jnp.where(is_start, tok_id, T_max)
    ].set(b_iota, mode="drop")

    active = jnp.arange(T_max, dtype=jnp.int32) < T
    tk = jnp.where(active, kind_b[starts], K_PAD)
    tcnt = jnp.where(active, cnt_b[starts], 0)
    tidx = jnp.where(active, idx_b[starts], 0)

    # OOB security check (reference decompressor.c:536-544)
    is_m = (tk == K_MATCH) | (tk == K_EXT)
    err = jnp.where(
        (err == ERR_OK) & jnp.any(is_m & (tidx + tcnt > W)), ERR_OOB, err)

    # segments: double-FLUSH dictionary reset (more_header streams only)
    fl = tk == K_FLUSH
    if more:
        prev_fl = jnp.concatenate([jnp.asarray([False]), fl[:-1]])
        resets = fl & prev_fl
    else:
        resets = jnp.zeros(T_max, bool)
    seg = jnp.cumsum(resets.astype(jnp.int32))
    n_seg_max = T_max  # worst case: every token a reset

    # placement
    cs_cnt = jnp.cumsum(tcnt)
    out_start = cs_cnt - tcnt  # exclusive
    out_len = cs_cnt[T_max - 1]
    err = jnp.where((err == ERR_OK) & (out_len > max_out), ERR_OVERFLOW, err)
    out_len = jnp.minimum(out_len, max_out)

    # ---- window-write fold: untruncated sums + deficit while_loop ---------
    w_unc = jnp.where(tk == K_LIT, 1,
             jnp.where(tk == K_MATCH, tcnt,
              jnp.where(tk == K_RLE, jnp.minimum(tcnt, RLE_MAX_WINDOW_WRITE),
               jnp.where(tk == K_EXT, tcnt, 0)))).astype(jnp.int32)
    csw = jnp.cumsum(w_unc) - w_unc  # global exclusive
    S_seg = _seg_base(csw, resets, seg, n_seg_max)

    trunc = (tk == K_RLE) | (tk == K_EXT)
    tr_id = jnp.cumsum(trunc.astype(jnp.int32)) - 1
    n_tr = jnp.sum(trunc.astype(jnp.int32))
    tr_tok = jnp.zeros(T_max, jnp.int32).at[
        jnp.where(trunc, tr_id, T_max)
    ].set(jnp.arange(T_max, dtype=jnp.int32), mode="drop")

    def tr_cond(st):
        return st[0] < n_tr

    def tr_body(st):
        i, D, cur_seg, defs = st
        t = tr_tok[i]
        sg = seg[t]
        D = jnp.where(sg != cur_seg, 0, D)
        a_mod = jnp.remainder(S_seg[t] - D, W)  # A = W + S - D; W == 0 (mod W)
        room = W - a_mod
        d = jnp.maximum(0, w_unc[t] - room)
        return i + 1, D + d, sg, defs.at[t].set(d)

    _, _, _, defs = lax.while_loop(
        tr_cond, tr_body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.zeros(T_max, jnp.int32)),
    )
    csd = jnp.cumsum(defs) - defs
    D_seg = _seg_base(csd, resets, seg, n_seg_max)
    A = W + S_seg - D_seg       # absolute write-stream position before token
    wr = w_unc - defs           # actual per-token window writes (unused below
    del wr                      # but defines the semantics; A already folds it)

    # keyed (per-segment) monotone write positions for ownership searches.
    # int32 budget: keys must stay below 2**31 even with many resets.
    BIG = W + max_out + 2
    n_seg = seg[T_max - 1] + 1
    err = jnp.where(
        (err == ERR_OK) & ((n_seg.astype(jnp.float32) + 1.0) * float(BIG) >= 2.0**31),
        ERR_SEGKEY, err)
    A_key = jnp.where(active, A + seg * BIG, I32MAX)

    # ---- per-output-byte source links -------------------------------------
    obyte = jnp.arange(max_out, dtype=jnp.int32)
    valid_b = obyte < out_len
    # out_start for padded tokens == final cumsum >= out_len, so the
    # 'right'-1 search lands on the emitting token for every valid byte
    tok_of = jnp.searchsorted(out_start, obyte, side="right").astype(jnp.int32) - 1
    tok_of = jnp.clip(tok_of, 0, T_max - 1)
    off = obyte - out_start[tok_of]
    kb = tk[tok_of]

    src = jnp.zeros(max_out, jnp.int32)
    lit_b = kb == K_LIT
    src = jnp.where(lit_b, -(tidx[tok_of] + 1), src)

    rle_b = kb == K_RLE
    m_b = (kb == K_MATCH) | (kb == K_EXT)
    Am1 = A[tok_of] - 1
    s_slot = tidx[tok_of] + off
    a = jnp.where(rle_b, Am1,
         jnp.where(m_b, Am1 - jnp.remainder(Am1 - s_slot, W), 0))

    need = rle_b | m_b
    seg_of = seg[tok_of]
    from_dict = need & (a < W)
    a_dict = jnp.clip(a, 0, W - 1)
    dict_val = jnp.where(seg_of == 0, dict_init[a_dict], dict_reset[a_dict])
    src = jnp.where(from_dict, -(dict_val.astype(jnp.int32) + 1), src)

    from_out = need & (a >= W)
    a_key = jnp.where(from_out, a + seg_of * BIG, jnp.int32(0))
    own = jnp.searchsorted(A_key, a_key, side="right").astype(jnp.int32) - 1
    own = jnp.clip(own, 0, T_max - 1)
    src = jnp.where(from_out, out_start[own] + (a - A[own]), src)

    # ---- pointer-doubling value resolution ---------------------------------
    rounds = max(1, int(math.ceil(math.log2(max(max_out, 2)))) + 1)

    def pd_body(_, src):
        tgt = src[jnp.clip(src, 0, max_out - 1)]
        return jnp.where(src >= 0, tgt, src)

    src = lax.fori_loop(0, rounds, pd_body, src)
    out = jnp.where(valid_b, -src - 1, 0)
    return out, out_len, err


@functools.partial(
    jax.jit,
    static_argnames=("NBP", "window", "literal", "extended", "more", "max_out"),
)
def _wavefront_batch(blobs, nbytes, dict_init, dict_reset, *, NBP, window,
                     literal, extended, more, max_out):
    fn = functools.partial(
        _wavefront_kernel, NBP=NBP, window=window, literal=literal,
        extended=extended, more=more, max_out=max_out)
    return jax.vmap(lambda b, n: fn(b, n, dict_init, dict_reset))(blobs, nbytes)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pow2_bucket(n: int, lo: int) -> int:
    """Next power of two >= max(n, lo): quantizes the kernel's static shapes
    so distinct payload/output sizes share compiled programs."""
    return 1 << max(n - 1, lo - 1, 1).bit_length()


def wavefront_decode_payload(payload: bytes, *, window: int, literal: int,
                             extended: bool, more: bool,
                             dict_init: np.ndarray,
                             dict_reset: np.ndarray | None = None,
                             max_out: int) -> bytes:
    """Decode one header-less Tamp payload with the wavefront kernel."""
    if dict_reset is None:
        dict_reset = dict_init
    outs, lens, errs = _decode_group(
        [bytes(payload)], window=window, literal=literal, extended=extended,
        more=more, dict_init=dict_init, dict_reset=dict_reset, max_out=max_out)
    _raise_err(int(errs[0]))
    return outs[0, : int(lens[0])].tobytes()


def _raise_err(e: int) -> None:
    if e == ERR_OK:
        return
    if e == ERR_OOB:
        raise OutOfBoundsError("window reference out of bounds")
    if e == ERR_OVERFLOW:
        raise ValueError("decoded output exceeds max_out")
    if e == ERR_SEGKEY:
        raise ValueError("stream exceeds wavefront segment budget")
    raise ValueError("invalid tamp stream")


def _decode_group(payloads, *, window, literal, extended, more, dict_init,
                  dict_reset, max_out):
    S = len(payloads)
    L = _pow2_bucket(max(len(p) for p in payloads), 64)
    max_out = _pow2_bucket(max_out, 1024)
    # parse peeks up to ~22 bits past a start at bit 8L -> pad 8 bytes
    blobs = np.zeros((S, L + 8), np.uint32)
    nbytes = np.zeros(S, np.int32)
    for i, p in enumerate(payloads):
        blobs[i, : len(p)] = np.frombuffer(p, np.uint8)
        nbytes[i] = len(p)
    outs, lens, errs = _wavefront_batch(
        jnp.asarray(blobs), jnp.asarray(nbytes),
        jnp.asarray(np.asarray(dict_init, np.int32)),
        jnp.asarray(np.asarray(dict_reset, np.int32)),
        NBP=8 * L, window=window, literal=literal, extended=extended,
        more=more, max_out=max_out)
    return np.asarray(outs).astype(np.uint8), np.asarray(lens), np.asarray(errs)


def decode_shards_wavefront(shards, *, dictionary=None, max_out: int,
                            group_payload_bytes: int = 1 << 23) -> list[bytes]:
    """Decode same-config Tamp streams with the wavefront device kernel.

    All shards must share one header configuration (the TTPU container
    guarantees this); ``max_out`` bounds the decoded size per shard.  Shards
    are batched into device calls bounded by ``group_payload_bytes`` to cap
    the per-bit working set (~16 bytes of HBM per payload *bit*).
    """
    if not shards:
        return []
    h = shards[0][0]
    window = (h >> 5) + 8
    literal = ((h >> 3) & 3) + 5
    custom = (h >> 2) & 1
    extended = bool((h >> 1) & 1)
    more = bool(h & 1)
    skip = 2 if more else 1
    W = 1 << window
    default_dict = dictionary_array(W, literal=literal if extended else 8)
    if custom:
        if dictionary is None:
            raise ValueError("stream requires a custom dictionary")
        d = np.frombuffer(bytes(dictionary), np.uint8)
        if d.shape[0] < W:
            raise ValueError("dictionary smaller than the window")
        dict_init = d[:W]
    else:
        dict_init = default_dict

    payloads = []
    for s in shards:
        if s[0] != h:
            raise ValueError("shards must share one header configuration")
        if more and (len(s) < 2 or s[1] != 0):
            raise ValueError("reserved header byte must be zero")
        payloads.append(bytes(s[skip:]))

    out: list[bytes] = []
    i = 0
    while i < len(payloads):
        j = i + 1
        budget = len(payloads[i])
        while j < len(payloads) and budget + len(payloads[j]) <= group_payload_bytes:
            budget += len(payloads[j])
            j += 1
        group = payloads[i:j]
        if all(len(p) == 0 for p in group):
            out.extend(b"" for _ in group)
            i = j
            continue
        outs, lens, errs = _decode_group(
            group, window=window, literal=literal, extended=extended,
            more=more, dict_init=dict_init, dict_reset=default_dict,
            max_out=max_out)
        for k in range(len(group)):
            _raise_err(int(errs[k]))
            out.append(outs[k, : int(lens[k])].tobytes())
        i = j
    return out
