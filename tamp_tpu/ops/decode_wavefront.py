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
   decode the token that *would* start there, gather-free: 64-bit windows
   per offset from static slices, variable vector shifts for the fields,
   and 15 prefix compares for the (complete) Huffman code (reference token
   grammar: tamp/_c_src/tamp/decompressor.c decode_huffman / decode_rle /
   decode_extended_match).
2. **Boundary resolution** — the real token starts are the orbit of the
   per-bit jump pointer from bit 0: blocked pointer doubling computes each
   bit's block exit in ~5 rounds of flat 1-D gathers, a length-``nblk``
   scan chains block entries, and two short lockstep walks enumerate each
   block's tokens into a compact table (see ``_token_table``).
3. **Placement** — per-token output counts -> exclusive prefix sum; the
   emitting token per output byte via scatter + running max.
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


def _bit_windows(pp32, NBP: int):
    """(w0, w1): bits [b, b+32) and [b+32, b+64) for every bit offset b.

    Gather-free: built from static byte-array slices and an 8-way static
    unroll over the sub-byte phase, so XLA lowers it to pure elementwise
    VPU work (TPU gathers are the expensive op to avoid).  ``pp32`` is the
    payload as uint32 with >= 8 zero pad bytes (length L + 8).
    """
    L = NBP // 8
    V = (
        (pp32[0 : L + 4] << 24) | (pp32[1 : L + 5] << 16)
        | (pp32[2 : L + 6] << 8) | pp32[3 : L + 7]
    )
    tail0 = pp32[4 : L + 4]   # byte just past w0's aligned word, per i < L
    V4 = V[4 : L + 4]         # aligned word 4 bytes later (bits [b+32, ...))
    tail1 = pp32[8 : L + 8]
    w0_phases = []
    w1_phases = []
    for r in range(8):
        if r == 0:
            w0_phases.append(V[:L])
            w1_phases.append(V4)
        else:
            w0_phases.append((V[:L] << r) | (tail0 >> (8 - r)))
            w1_phases.append((V4 << r) | (tail1 >> (8 - r)))
    w0 = jnp.stack(w0_phases, axis=1).reshape(NBP)
    w1 = jnp.stack(w1_phases, axis=1).reshape(NBP)
    return w0, w1


def _field(w0, w1, k, m: int):
    """m (static, <=16) bits at relative bit offset ``k`` (vector, 0..31)
    within the 64-bit window (w0, w1) — variable vector shifts, no gathers."""
    k = k.astype(jnp.uint32)
    aligned = (w0 << k) | ((w1 >> jnp.uint32(1)) >> (jnp.uint32(31) - k))
    return (aligned >> jnp.uint32(32 - m)).astype(jnp.int32)


def _decode_symbol(pk):
    """Symbol + code length from an 8-bit MSB-aligned peek, arithmetically.

    The shipped table is a complete prefix code (Kraft sum 1), so exactly
    one codeword prefixes any 8-bit value; 15 vector compares beat a table
    gather on TPU."""
    s_out = jnp.zeros_like(pk)
    n_out = jnp.zeros_like(pk)
    for s in range(15):
        nb = HUFFMAN_LENGTHS[s] - 1
        hit = (pk >> (8 - nb)) == HUFFMAN_CODES[s]
        s_out = jnp.where(hit, s, s_out)
        n_out = jnp.where(hit, nb, n_out)
    return s_out, n_out


def _speculative_parse(pp32, nb_valid, NBP: int, window: int, literal: int,
                       extended: bool):
    """Per-bit token parse over all NBP bit offsets — gather-free.

    Every token field lives within 41 bits of its start (flag + 9-bit
    symbol + 9-bit symbol + 4 trailing + 15-bit offset), so a 64-bit
    window per bit offset (built once, gather-free) plus variable vector
    shifts decodes everything elementwise.
    """
    minp = compute_min_pattern_size(window, literal)
    w0, w1 = _bit_windows(pp32, NBP)
    b = jnp.arange(NBP, dtype=jnp.int32)

    flag = (w0 >> jnp.uint32(31)).astype(jnp.int32)
    k0 = jnp.zeros(NBP, jnp.int32)

    lit_end = b + 1 + literal
    lit_val = _field(w0, w1, k0 + 1, literal)

    pk1 = _field(w0, w1, k0 + 1, 8)
    s1, n1 = _decode_symbol(pk1)
    after1 = b + 1 + n1
    k_after1 = 1 + n1

    is_flush = s1 == FLUSH_SYMBOL
    if extended:
        is_rle = s1 == RLE_SYMBOL
        is_ext = s1 == EXTENDED_MATCH_SYMBOL
    else:
        is_rle = jnp.zeros(NBP, bool)
        is_ext = jnp.zeros(NBP, bool)

    pk2 = _field(w0, w1, k_after1, 8)
    s2, n2 = _decode_symbol(pk2)
    after2 = after1 + n2
    k_after2 = k_after1 + n2

    rle_cnt = (s2 << RLE_TRAILING_BITS) + _field(
        w0, w1, k_after2, RLE_TRAILING_BITS) + 2
    rle_end = after2 + RLE_TRAILING_BITS

    ext_sz = (
        (s2 << EXTENDED_MATCH_TRAILING_BITS)
        + _field(w0, w1, k_after2, EXTENDED_MATCH_TRAILING_BITS)
        + minp + 12
    )
    ext_idx = _field(w0, w1, k_after2 + EXTENDED_MATCH_TRAILING_BITS, window)
    ext_end = after2 + EXTENDED_MATCH_TRAILING_BITS + window

    bm_idx = _field(w0, w1, k_after1, window)
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

    # the shipped code is complete (every 8-bit peek resolves to a symbol),
    # so no bit pattern is undecodable; kept for structural parity with the
    # oracle, where the same property makes its table fully populated
    invalid = jnp.zeros(NBP, bool)
    incomplete = jnp.where(is_flush, after1 > nb_valid, end > nb_valid)
    incomplete = incomplete | (b >= nb_valid)
    nxt = jnp.where(invalid | incomplete, NBP, end).astype(jnp.int32)
    return nxt, kind, f_cnt, f_idx, invalid, incomplete


BLOCK_BITS = 256  # chase block; any token (<= 41 bits) exits into block i+1


def _token_table(nxt, incomplete, NBP: int, literal: int, T_max: int):
    """Token starts (compacted into a T_max table) + token count.

    Gather-only blocked boundary resolution: (1) pointer doubling on the
    flat jump array computes each bit's exit — the first orbit position
    past its block — in ceil(log2(tokens-per-block)) rounds of 1-D gathers
    (flat gathers lower ~4x faster than take_along_axis on TPU); (2) a
    length-nblk scan chases block entries (every token is <= 41 bits, so
    an exit always lands in the very next block); (3) two short lockstep
    walks over all blocks enumerate each block's <= B/(1+literal) tokens:
    one counts (giving each block's slot base by prefix sum), one writes
    starts into the table.  The trailing incomplete token is dropped
    (sequential decoders roll it back; positions >= the valid payload end
    are incomplete by parse).
    """
    B = BLOCK_BITS
    nblk = NBP // B
    pos_end = ((jnp.arange(NBP, dtype=jnp.int32) >> int(math.log2(B))) + 1) * B
    max_hops = B // (1 + literal) + 2
    ex = nxt
    for _ in range(int(math.ceil(math.log2(max_hops)))):
        inside = ex < pos_end
        hop = ex[jnp.clip(ex, 0, NBP - 1)]
        ex = jnp.where(inside, hop, ex)

    def entry_body(p, ex_row):
        has = p < NBP
        sentinel = jnp.int32(NBP)
        nxt_p = jnp.where(has, ex_row[jnp.clip(p % B, 0, B - 1)], sentinel)
        return nxt_p.astype(jnp.int32), jnp.where(has, p, sentinel)

    # init carry derived from `nxt` so its device-varying axes match the
    # body output under shard_map (a literal 0 would be axis-invariant)
    _, entries = lax.scan(entry_body, nxt[0] * 0, ex.reshape(nblk, B))

    lim = (jnp.arange(nblk, dtype=jnp.int32) + 1) * B
    walk_steps = B // (1 + literal) + 2

    def walk(c, step_fn, state):
        for _ in range(walk_steps):
            in_blk = c < lim
            ok = in_blk & ~incomplete[jnp.clip(c, 0, NBP - 1)]
            state = step_fn(state, c, ok)
            c = jnp.where(in_blk, nxt[jnp.clip(c, 0, NBP - 1)], c)
        return state

    counts = walk(entries,
                  lambda s, c, ok: s + ok.astype(jnp.int32),
                  jnp.zeros(nblk, jnp.int32))
    cs = jnp.cumsum(counts)
    base = cs - counts
    T = cs[nblk - 1]

    def write(state, c, ok):
        starts, k = state
        starts = starts.at[jnp.where(ok, k, T_max)].set(c, mode="drop")
        return starts, k + ok.astype(jnp.int32)

    starts, _ = walk(entries, write, (jnp.zeros(T_max, jnp.int32), base))
    return starts, T


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
    T_max = NBP // (1 + literal) + 2
    nxt, kind_b, cnt_b, idx_b, invalid_b, incomplete_b = _speculative_parse(
        pp32, nbytes * 8, NBP, window, literal, extended)
    del invalid_b  # the complete prefix code leaves no undecodable pattern
    starts, T = _token_table(nxt, incomplete_b, NBP, literal, T_max)
    return _wavefront_finish(
        starts, T, kind_b, cnt_b, idx_b, dict_init, dict_reset,
        window=window, literal=literal, more=more, max_out=max_out,
        T_max=T_max)


def _wavefront_finish(starts, T, kind_b, cnt_b, idx_b, dict_init, dict_reset,
                      *, window: int, literal: int, more: bool, max_out: int,
                      T_max: int):
    """Stages after boundary resolution: placement, window fold, values."""
    W = 1 << window
    err = jnp.int32(ERR_OK)

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

    z = w_unc[0] * 0  # zero with w_unc's device-varying axes (shard_map-safe)
    _, _, _, defs = lax.while_loop(
        tr_cond, tr_body, (z, z, z, w_unc * 0),
    )
    csd = jnp.cumsum(defs) - defs
    D_seg = _seg_base(csd, resets, seg, n_seg_max)
    A = W + S_seg - D_seg       # absolute write-stream position before token
    wr = w_unc - defs           # actual per-token window writes (unused below
    del wr                      # but defines the semantics; A already folds it)

    # ---- per-output-byte source links -------------------------------------
    obyte = jnp.arange(max_out, dtype=jnp.int32)
    valid_b = obyte < out_len
    # emitting token of byte x = the max token id whose out_start <= x:
    # scatter ids at their out_start, then a running max (zero-count tokens
    # before an emitter share its out_start but have smaller ids; tokens
    # after start strictly later)
    tok_of = jnp.zeros(max_out, jnp.int32).at[
        jnp.where(active, out_start, max_out)
    ].max(jnp.arange(T_max, dtype=jnp.int32), mode="drop")
    tok_of = lax.cummax(tok_of)
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
    if not more:
        # single segment: the write stream [W, W + out_len) is dense, so the
        # owning token (max id with A <= a) is one scatter + running max +
        # one gather — no binary search
        DOM = W + max_out
        ownmap = jnp.zeros(DOM, jnp.int32).at[
            jnp.where(active, jnp.minimum(A, DOM), DOM)
        ].max(jnp.arange(T_max, dtype=jnp.int32), mode="drop")
        ownmap = lax.cummax(ownmap)
        own = ownmap[jnp.clip(a, 0, DOM - 1)]
    else:
        # keyed (per-segment) monotone write positions; int32 budget: keys
        # must stay below 2**31 even with many double-FLUSH resets
        BIG = W + max_out + 2
        n_seg = seg[T_max - 1] + 1
        err = jnp.where(
            (err == ERR_OK)
            & ((n_seg.astype(jnp.float32) + 1.0) * float(BIG) >= 2.0**31),
            ERR_SEGKEY, err)
        A_key = jnp.where(active, A + seg * BIG, I32MAX)
        a_key = jnp.where(from_out, a + seg_of * BIG, jnp.int32(0))
        own = jnp.searchsorted(A_key, a_key, side="right").astype(jnp.int32) - 1
        own = jnp.clip(own, 0, T_max - 1)
    src = jnp.where(from_out, out_start[own] + (a - A[own]), src)

    # ---- pointer-doubling value resolution ---------------------------------
    # early exit: text chains resolve in a handful of rounds; the bound
    # covers the worst case (chains strictly decrease, doubling halves)
    rounds = max(1, int(math.ceil(math.log2(max(max_out, 2)))) + 1)

    def pd_cond(st):
        i, src = st
        return (i < rounds) & jnp.any(src >= 0)

    def pd_body(st):
        i, src = st
        tgt = src[jnp.clip(src, 0, max_out - 1)]
        return i + 1, jnp.where(src >= 0, tgt, src)

    _, src = lax.while_loop(pd_cond, pd_body, (jnp.int32(0), src))
    out = jnp.where(valid_b, -src - 1, 0)
    return out, out_len, err


@functools.partial(
    jax.jit,
    static_argnames=(
        "NBP", "window", "literal", "extended", "more", "max_out", "mode"),
)
def _wavefront_batch(blobs, nbytes, dict_init, dict_reset, *, NBP, window,
                     literal, extended, more, max_out, mode="xla"):
    # blobs arrive as uint8 (1 byte h2d per payload byte — the tunnel/PCIe
    # transfer is the scarce resource); widen on device for the bit math,
    # and narrow the decoded output back to uint8 before it leaves.
    blobs = blobs.astype(jnp.uint32)
    if mode == "xla":
        fn = functools.partial(
            _wavefront_kernel, NBP=NBP, window=window, literal=literal,
            extended=extended, more=more, max_out=max_out)
        outs, lens, errs = jax.vmap(
            lambda b, n: fn(b, n, dict_init, dict_reset))(blobs, nbytes)
        return outs.astype(jnp.uint8), lens, errs

    nxt, kind_b, cnt_b, idx_b, _inv, _inc = jax.vmap(
        lambda b, n: _speculative_parse(b, n * 8, NBP, window, literal,
                                        extended))(blobs, nbytes)

    if mode == "commit":
        # Stream-commit decode (TPU): the parallel VPU parse feeds a
        # sequential scalar-core commit against an SMEM window ring — see
        # ops/decode_commit_pallas.py.
        from .decode_commit_pallas import commit_available, commit_decode_batch

        packed = kind_b | (cnt_b << 3) | (idx_b << 11)
        outs, lens, errs = commit_decode_batch(
            nxt, packed, dict_init, dict_reset, NBP=NBP, W=1 << window,
            more=more, max_out=max_out,
            unified=not extended,  # v1 window == output: obuf-as-ring
            interpret=not commit_available())
        return outs.astype(jnp.uint8), lens, errs

    # mode == "chase": boundary resolution via the Pallas sequential-chase
    # kernel; the finish stages stay vmapped XLA (ops/token_chase_pallas.py).
    from .token_chase_pallas import token_table_chase

    T_max = NBP // (1 + literal) + 2
    starts, T = token_table_chase(nxt, NBP, T_max)
    fin = functools.partial(
        _wavefront_finish, window=window, literal=literal, more=more,
        max_out=max_out, T_max=T_max)
    outs, lens, errs = jax.vmap(
        lambda s, t, kb, cb, ib: fin(s, t, kb, cb, ib, dict_init, dict_reset)
    )(starts, T, kind_b, cnt_b, idx_b)
    return outs.astype(jnp.uint8), lens, errs


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
    return np.asarray(outs[0])[: int(lens[0])].tobytes()


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
    blobs = np.zeros((S, L + 8), np.uint8)
    nbytes = np.zeros(S, np.int32)
    for i, p in enumerate(payloads):
        blobs[i, : len(p)] = np.frombuffer(p, np.uint8)
        nbytes[i] = len(p)
    import os

    from .token_chase_pallas import chase_available

    # Fastest available path: full stream-commit kernel (SMEM ring fits
    # windows <= 8 KiB), else Pallas boundary chase + XLA finish, else
    # pure-XLA wavefront.  TAMP_TPU_DECODE=xla|chase|commit overrides.
    mode = os.environ.get("TAMP_TPU_DECODE")
    if mode not in ("xla", "chase", "commit"):
        if chase_available():
            mode = "commit" if (1 << window) <= 8192 else "chase"
        else:
            mode = "xla"
    outs, lens, errs = _wavefront_batch(
        jnp.asarray(blobs), jnp.asarray(nbytes),
        jnp.asarray(np.asarray(dict_init, np.int32)),
        jnp.asarray(np.asarray(dict_reset, np.int32)),
        NBP=8 * L, window=window, literal=literal, extended=extended,
        more=more, max_out=max_out, mode=mode)
    # device handles: the caller pulls results after dispatching every
    # group, so the tunnel's h2d/d2h RPCs overlap group k+1's kernels
    return outs, lens, errs


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

    # Two groups pipeline the tunnel: group 2's h2d RPC flies while group
    # 1's kernels run, and group 1's d2h overlaps group 2's compute (JAX
    # async dispatch).  More groups pay ~30 ms of fixed RPC latency each.
    total = sum(len(p) for p in payloads)
    budget_cap = group_payload_bytes
    if len(payloads) > 1:
        budget_cap = min(budget_cap, max(1, -(-total // 2)))

    groups: list[list[bytes]] = []
    i = 0
    while i < len(payloads):
        j = i + 1
        budget = len(payloads[i])
        while j < len(payloads) and budget + len(payloads[j]) <= budget_cap:
            budget += len(payloads[j])
            j += 1
        groups.append(payloads[i:j])
        i = j

    handles = []
    for group in groups:
        if all(len(p) == 0 for p in group):
            handles.append(None)
            continue
        handles.append(_decode_group(
            group, window=window, literal=literal, extended=extended,
            more=more, dict_init=dict_init, dict_reset=default_dict,
            max_out=max_out))

    out: list[bytes] = []
    for group, h in zip(groups, handles):
        if h is None:
            out.extend(b"" for _ in group)
            continue
        outs, lens, errs = h
        errs = np.asarray(errs)
        lens = np.asarray(lens)
        blk = np.asarray(outs)  # one d2h per group
        for k in range(len(group)):
            _raise_err(int(errs[k]))
            out.append(blk[k, : int(lens[k])].tobytes())
    return out
