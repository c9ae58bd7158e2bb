"""Pallas TPU kernel: stream-commit v1 Tamp ENCODE.

Completes the on-chip codec: the MXU one-hot search kernel
(ops/match_pallas.py) computes exact per-position match tables; this kernel
runs the greedy v1 token walk — the sequential O(N) half — on the scalar
core, streaming the packed per-position tables through SMEM tiles and
emitting the bit-packed stream back to HBM in 512-byte chunks.

v1 steady state needs *no window ring at all*: tables are used verbatim
(reference semantics, engine/commit.commit_v1), the lazy-matching overlap
check is pure arithmetic (the write head is ``t mod W``), and bit packing
is a scalar accumulator.  Per token this is ~15 scalar ops.

The final < 16 input bytes are NOT committed here: at that remainder the
table cap can truncate a longer match whose tie-break differs from the
reference's shrinking search, so the kernel stops at the last steady
position and returns its bit remainder + lazy cache; the host finishes the
tail with the parity-proven Python committer and stitches the bits
(engine/pipeline.encode_v1_device_commit).

Inputs are packed one int32 per input position:
``len(5) | idx(15) | byte(8)`` (and ``plen(5) | pidx(15)`` for the lazy
probe stream).  Outputs: byte chunks, plus a per-shard state row
(bytes written, bit remainder, stop position, lazy cache, error).

The output buffer is ONE flat double-chunk SMEM array indexed
``nbytes & 1023`` (single unpredicated store per drained byte); its
512-byte halves are DMA'd to HBM as static slices selected by chunk
parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import HUFFMAN_CODES, HUFFMAN_LENGTHS, compute_min_pattern_size
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["encode_commit_batch", "encode_commit_available", "plan_fields"]

TILE = 512        # positions per grid step (2 KiB SMEM per stream)
OUT_CHUNK = 512   # output bytes per HBM flush

ERR_OK, ERR_EXCESS = 0, 1

# state-row slots (per-shard output)
S_T, S_NBYTES, S_ACC, S_AN, S_CIDX, S_CSZ, S_ERR, S_NSLOTS = 0, 1, 2, 3, 4, 5, 6, 16

# SMEM carry slots
_T, _NB, _ACC, _AN, _CI, _CS, _ERR, _FL = 0, 1, 2, 3, 4, 5, 6, 7


def _kernel(pk_ref, pb_ref, huff_ref, n_ref, out_ref, state_ref, obuf,
            st, dma_sem, *, window: int, literal: int, lazy: bool,
            max_out: int):
    s = pl.program_id(0)
    i = pl.program_id(1)
    base = i * TILE
    OMASK = 2 * OUT_CHUNK - 1  # flat double-chunk output buffer

    def flush_chunk(ch):
        # chunk halves are STATIC slices of one buffer (Mosaic cannot DMA
        # from a dynamic SMEM offset), selected by parity
        dst = out_ref.at[s, :, pl.ds(ch * OUT_CHUNK, OUT_CHUNK)]

        @pl.when(ch % 2 == 0)
        def _():
            cp = pltpu.make_async_copy(obuf.at[:, 0:OUT_CHUNK], dst, dma_sem)
            cp.start()
            cp.wait()

        @pl.when(ch % 2 == 1)
        def _():
            cp = pltpu.make_async_copy(
                obuf.at[:, OUT_CHUNK:2 * OUT_CHUNK], dst, dma_sem)
            cp.start()
            cp.wait()
    W = 1 << window
    wmask = W - 1
    minp = compute_min_pattern_size(window, literal)
    lit_flag = 1 << literal
    lit_limit = 256 if literal == 8 else lit_flag
    npos = n_ref[0, 0, 0]
    hard_stop = npos - 15  # first tail position (rem < 16)

    @pl.when(i == 0)
    def _():
        for k in range(8):
            st[k] = 0
        st[_CI] = -1

    def cond(carry):
        t = carry[0]
        return (t >= base) & (t < base + TILE) & (t < hard_stop) & \
            (carry[6] == ERR_OK)

    def body(carry):
        t, nbytes, acc, an, cidx, csz, err, flushed = carry
        p = pk_ref[0, 0, t - base]
        byte = p & 0xFF
        idx = (p >> 8) & 0x7FFF
        size = p >> 23

        use_cache = jnp.int32(0)
        if lazy:
            use_cache = (cidx >= 0).astype(jnp.int32)
            idx = jnp.where(use_cache == 1, cidx, idx)
            size = jnp.where(use_cache == 1, csz, size)
            cidx = jnp.int32(-1)

        # lazy probe: defer a short match when the next position matches
        # longer and does not overlap the write head (reference
        # compressor.c:576-618; tau = t mod W needs no materialized ring)
        go_lazy = jnp.int32(0)
        if lazy:
            q = pb_ref[0, 0, t - base]
            pix = q & 0x7FFF
            psz = q >> 15
            tau = t & wmask
            # NB: the probe applies to cached sizes too (a lazy deferral can
            # chain), matching commit_v1/the reference; pend is 16 in steady
            # state so the `pend > size + 2` guard is subsumed by size <= 8.
            go_lazy = ((size >= minp) & (size <= 8)
                       & (psz > size)
                       & ~((pix <= tau) & (tau < pix + psz))).astype(jnp.int32)
            cidx = jnp.where(go_lazy == 1, pix, cidx)
            csz = jnp.where(go_lazy == 1, psz, csz)

        is_match = (size >= minp) & (go_lazy == 0)
        # field: match = huffman(size-minp)<<window | idx; literal = flag|byte
        hsel = huff_ref[0, 0, jnp.clip(size - minp, 0, 13)]
        hcode = hsel >> 5
        hbits = hsel & 31
        v = jnp.where(is_match, (hcode << window) | idx, lit_flag | byte)
        nb = jnp.where(is_match, hbits + window, literal + 1)
        err = jnp.where(
            (~is_match) & (byte >= lit_limit), jnp.int32(ERR_EXCESS), err)

        acc = (acc << nb) | v
        an = an + nb

        def drain_cond(dc):
            return dc[1] >= 8

        def drain_body(dc):
            nbytes, an, acc, flushed = dc
            obuf[0, nbytes & OMASK] = (acc >> (an - 8)) & 0xFF
            an = an - 8
            acc = acc & ((1 << an) - 1)
            nbytes = nbytes + 1

            def fcond(ch):
                return ch < nbytes // OUT_CHUNK

            def fbody(ch):
                flush_chunk(ch)
                return ch + 1

            flushed = lax.while_loop(fcond, fbody, flushed)
            return nbytes, an, acc, flushed

        nbytes, an, acc, flushed = lax.while_loop(
            drain_cond, drain_body, (nbytes, an, acc, flushed))

        t = jnp.where(is_match, t + size, t + 1)
        t = jnp.where(err != ERR_OK, npos, t)
        return t, nbytes, acc, an, cidx, csz, err, flushed

    t, nbytes, acc, an, cidx, csz, err, flushed = lax.while_loop(
        cond, body,
        (st[_T], st[_NB], st[_ACC], st[_AN], st[_CI], st[_CS], st[_ERR],
         st[_FL]))

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        # flush the trailing partial chunk (padding masked by nbytes)
        @pl.when(nbytes > flushed * OUT_CHUNK)
        def _():
            flush_chunk(flushed)

    st[_T] = t
    st[_NB] = nbytes
    st[_ACC] = acc
    st[_AN] = an
    st[_CI] = cidx
    st[_CS] = csz
    st[_ERR] = err
    st[_FL] = flushed
    state_ref[0, 0, S_T] = t
    state_ref[0, 0, S_NBYTES] = nbytes
    state_ref[0, 0, S_ACC] = acc
    state_ref[0, 0, S_AN] = an
    state_ref[0, 0, S_CIDX] = cidx
    state_ref[0, 0, S_CSZ] = csz
    state_ref[0, 0, S_ERR] = err


def plan_fields(packed, *, window: int, literal: int):
    """VPU field planning for the non-lazy commit walk.

    Moves everything data-parallel out of the scalar loop: for every
    position, the bit field the committer would emit if the walk lands
    there — value, bit count, advance, error — is computed elementwise
    (the Huffman select is 14 vector compares, no gather), and two
    consecutive literals fuse into ONE field (both codes packed
    MSB-first).  Fused literals may fall into the host-tail region
    (rem < 16) safely: a no-match table entry implies the tail's
    shrinking search also finds no match, and a literal's encoding does
    not depend on the remaining length.

    Returns ONE stream ``value<<11 | nbits<<6 | advance<<1 | err`` when it
    fits in 31 bits (window <= 11, i.e. value <= 20 bits — one SMEM load
    per committed unit), else the (value, meta) pair.
    """
    minp = compute_min_pattern_size(window, literal)
    lit_flag = 1 << literal
    lit_limit = 256 if literal == 8 else lit_flag
    nbl = literal + 1
    byte = packed & 0xFF
    idx = (packed >> 8) & 0x7FFF
    size = packed >> 23
    is_match = size >= minp
    sym = jnp.clip(size - minp, 0, 13)
    hsel = jnp.zeros_like(packed)
    for sy in range(14):
        code = (int(HUFFMAN_CODES[sy]) << window) | (
            int(HUFFMAN_LENGTHS[sy]) + window) << 24
        hsel = jnp.where(sym == sy, code, hsel)
    a_match = (hsel & 0xFFFFFF) | idx
    nb_match = hsel >> 24
    a_lit = lit_flag | byte
    err1 = (~is_match) & (byte >= lit_limit)
    lit = ~is_match
    pair = lit & jnp.roll(lit, -1, axis=1)
    a_next = jnp.roll(a_lit, -1, axis=1)
    err2 = err1 | jnp.roll(err1, -1, axis=1)
    A = jnp.where(is_match, a_match,
                  jnp.where(pair, (a_lit << nbl) | a_next, a_lit))
    nb = jnp.where(is_match, nb_match, jnp.where(pair, 2 * nbl, nbl))
    adv = jnp.where(is_match, size, jnp.where(pair, 2, 1))
    err = jnp.where(is_match, False, jnp.where(pair, err2, err1)
                    ).astype(jnp.int32)
    if window <= 11:  # value <= 9 + window <= 20 bits; 20+11 = 31
        return (A << 11) | (nb << 6) | (adv << 1) | err, None
    return A, nb | (adv << 6) | (err << 14)


CHAIN = 4          # committed units per loop iteration
OUT_CHUNK_W = OUT_CHUNK // 4   # output flush granularity in 32-bit words


def _kernel_fields(a_ref, b_ref, n_ref, out_ref, state_ref, obuf, st,
                   dma_sem, *, dual: bool, max_out: int, tile: int,
                   chain: int, idx_bits: int = 0):
    """Planned-fields commit: push precomputed bit fields, drain 32-bit
    words, jump by the precomputed advance.

    Scalar-core economics (measured on v5e): ALU ~0.5 ns, SMEM load/store
    ~15-20 ns, loop-iteration branch ~37 ns.  So the kernel (1) chains
    CHAIN units per loop iteration (later units predicated off past the
    tile/stop boundary), (2) keeps the bit accumulator in a hi:lo int32
    pair and drains ONE predicated 32-bit word per unit (a sink slot
    absorbs the store when nothing drains), and (3) reads one SMEM word
    per unit (``dual`` adds a second stream when the packed field exceeds
    31 bits, window > 11).  Logical shifts are emulated on int32 with
    mask-after-arithmetic-shift; the double-shift form keeps every shift
    amount < 32.
    """
    s = pl.program_id(0)
    i = pl.program_id(1)
    base = i * tile
    OMASK_W = 2 * OUT_CHUNK_W - 1
    SINK = 2 * OUT_CHUNK_W  # predicated-off drain steps land here

    def flush_chunk(ch):
        dst = out_ref.at[s, :, pl.ds(ch * OUT_CHUNK_W, OUT_CHUNK_W)]

        @pl.when(ch % 2 == 0)
        def _():
            cp = pltpu.make_async_copy(
                obuf.at[:, 0:OUT_CHUNK_W], dst, dma_sem)
            cp.start()
            cp.wait()

        @pl.when(ch % 2 == 1)
        def _():
            cp = pltpu.make_async_copy(
                obuf.at[:, OUT_CHUNK_W:2 * OUT_CHUNK_W], dst, dma_sem)
            cp.start()
            cp.wait()

    npos = n_ref[0, 0, 0]
    hard_stop = npos - 15  # first tail position (rem < 16)

    @pl.when(i == 0)
    def _():
        for k in range(8):
            st[k] = 0
        st[_CI] = -1

    stop = jnp.minimum(base + tile, hard_stop)

    def cond(carry):
        t = carry[0]
        return (t >= base) & (t < stop) & (carry[5] == ERR_OK)

    def body(carry):
        t, nwords, lo, hi, an, err, flushed = carry
        for _ in range(chain):
            live = (t < stop) & (err == ERR_OK)
            off = jnp.minimum(t - base, tile - 1)
            q = jnp.where(live, a_ref[0, 0, off], 0)
            if dual:
                m = jnp.where(live, b_ref[0, 0, off], 0)
                v = q
                nb = m & 63
                adv = (m >> 6) & 255
                uerr = m & (1 << 14)
            else:
                v = (q >> 11) & 0x1FFFFF
                nb = (q >> 6) & 31
                adv = (q >> 1) & 31
                uerr = q & 1
            # push nb bits (nb may be 0 for a dead unit: all terms no-op)
            hi = (hi << nb) | ((lo >> (31 - nb)) >> 1) & ((1 << nb) - 1)
            lo = (lo << nb) | v
            an = an + nb
            # predicated one-word drain (an < 32 before any push, pushes
            # are <= 31 bits => at most one word completes per unit)
            d = (an >= 32).astype(jnp.int32)
            k = jnp.maximum(an - 32, 0)
            w = ((hi << (31 - k)) << 1) | (
                (lo >> k) & (((0x7FFFFFFF >> k) << 1) | 1))
            slot = jnp.where(d == 1, nwords & OMASK_W, SINK)
            obuf[0, slot] = w
            nwords = nwords + d
            an = an - 32 * d
            if idx_bits:  # window >= 14: second push — the ext-match index
                # (flag bit 15, index bits 16..30 of the B stream; the main
                # field was the <= 18-bit header+trail)
                fl2 = (m >> 15) & 1
                nb2 = fl2 * idx_bits
                v2 = (m >> 16) & 0x7FFF
                v2 = jnp.where(fl2 == 1, v2, 0)
                hi = (hi << nb2) | ((lo >> (31 - nb2)) >> 1) & ((1 << nb2) - 1)
                lo = (lo << nb2) | v2
                an = an + nb2
                d2 = (an >= 32).astype(jnp.int32)
                k2 = jnp.maximum(an - 32, 0)
                w2 = ((hi << (31 - k2)) << 1) | (
                    (lo >> k2) & (((0x7FFFFFFF >> k2) << 1) | 1))
                slot2 = jnp.where(d2 == 1, nwords & OMASK_W, SINK)
                obuf[0, slot2] = w2
                nwords = nwords + d2
                an = an - 32 * d2
            err = jnp.where(uerr != 0, jnp.int32(ERR_EXCESS), err)
            t = jnp.where(uerr != 0, npos, t + adv)

        # <= chain (2*chain with idx_bits) words drained per iteration, far
        # below a 128-word chunk: at most one boundary crossed
        cross = (nwords // OUT_CHUNK_W > flushed).astype(jnp.int32)

        @pl.when(cross == 1)
        def _():
            flush_chunk(flushed)

        flushed = flushed + cross
        return t, nwords, lo, hi, an, err, flushed

    t, nwords, lo, hi, an, err, flushed = lax.while_loop(
        cond, body,
        (st[_T], st[_NB], st[_ACC], st[_CS], st[_AN], st[_ERR], st[_FL]))

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        @pl.when(nwords > flushed * OUT_CHUNK_W)
        def _():
            flush_chunk(flushed)

    st[_T] = t
    st[_NB] = nwords
    st[_ACC] = lo
    st[_CS] = hi
    st[_AN] = an
    st[_ERR] = err
    st[_FL] = flushed
    state_ref[0, 0, S_T] = t
    state_ref[0, 0, S_NBYTES] = nwords * 4
    state_ref[0, 0, S_ACC] = lo & ((0x7FFFFFFF >> (31 - an)))
    state_ref[0, 0, S_AN] = an
    state_ref[0, 0, S_CIDX] = -1
    state_ref[0, 0, S_CSZ] = 0
    state_ref[0, 0, S_ERR] = err


@functools.partial(
    jax.jit,
    static_argnames=("NP", "dual", "max_out", "tile", "chain", "idx_bits",
                     "interpret"))
def _commit_fields_batch(A, B, npos, *, NP: int, dual: bool, max_out: int,
                         tile: int = TILE, chain: int = CHAIN,
                         idx_bits: int = 0, interpret: bool = False):
    S = A.shape[0]
    n_tiles = NP // tile
    mw = -(-max_out // 4)
    mpad_w = -(-mw // OUT_CHUNK_W) * OUT_CHUNK_W + OUT_CHUNK_W
    n_in = jnp.zeros((S, 1, 8), jnp.int32).at[:, 0, 0].set(npos)
    kern = functools.partial(_kernel_fields, dual=dual, max_out=max_out,
                             tile=tile, chain=chain, idx_bits=idx_bits)
    if B is None:
        B = A  # dead operand keeps the call signature static
    out, state = pl.pallas_call(
        kern,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda s, i: (s, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile), lambda s, i: (s, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, S_NSLOTS), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, mpad_w), jnp.int32),
            jax.ShapeDtypeStruct((S, 1, S_NSLOTS), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, 2 * OUT_CHUNK_W + 1), jnp.int32),  # +1: sink
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        A.reshape(S, 1, NP),
        B.reshape(S, 1, NP),
        n_in,
    )
    # unpack big-endian words to the byte stream on the VPU
    w = out[:, 0, :]
    by = jnp.stack(
        [(w >> 24) & 255, (w >> 16) & 255, (w >> 8) & 255, w & 255],
        axis=-1).reshape(S, mpad_w * 4)
    return by[:, :max_out].astype(jnp.uint8), state[:, 0, :]


@functools.partial(
    jax.jit,
    static_argnames=("NP", "window", "literal", "lazy", "max_out",
                     "tile", "chain", "interpret"))
def encode_commit_batch(packed, probe, npos, *, NP: int, window: int,
                        literal: int, lazy: bool, max_out: int,
                        tile: int = TILE, chain: int = CHAIN,
                        interpret: bool = False):
    """Steady-state v1 commit of S shards.

    ``packed``: (S, NP) int32 ``size<<23 | idx<<8 | byte`` per position;
    ``probe``: (S, NP) int32 ``psize<<15 | pidx`` (ignored unless lazy);
    ``npos``: (S,) int32 shard lengths.  Returns (bytes (S, max_out) int32,
    state (S, 16) int32) — see the S_* slots.

    Non-lazy batches route through the planned-fields kernel (the VPU
    precomputes every position's bit field and literal pairs are fused);
    lazy matching needs the in-kernel probe decision and keeps the token
    walk on the scalar core.
    """
    if not lazy:
        A, Bf = plan_fields(packed, window=window, literal=literal)
        return _commit_fields_batch(A, Bf, npos, NP=NP, dual=Bf is not None,
                                    max_out=max_out, tile=tile, chain=chain,
                                    interpret=interpret)
    S = packed.shape[0]
    n_tiles = NP // TILE
    mpad = -(-max_out // OUT_CHUNK) * OUT_CHUNK + OUT_CHUNK
    huff = jnp.asarray(
        [(int(HUFFMAN_CODES[sym]) << 5) | int(HUFFMAN_LENGTHS[sym])
         for sym in range(14)] + [0, 0], jnp.int32)
    n_in = jnp.zeros((S, 1, 8), jnp.int32).at[:, 0, 0].set(npos)
    kern = functools.partial(
        _kernel, window=window, literal=literal, lazy=lazy, max_out=max_out)
    out, state = pl.pallas_call(
        kern,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE), lambda s, i: (s, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TILE), lambda s, i: (s, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 16), lambda s, i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, S_NSLOTS), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, mpad), jnp.int32),
            jax.ShapeDtypeStruct((S, 1, S_NSLOTS), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, 2 * OUT_CHUNK), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        packed.reshape(S, 1, NP),
        probe.reshape(S, 1, NP),
        huff.reshape(1, 1, 16),
        n_in,
    )
    # narrow to uint8 on device: the compressed bytes leave the chip at
    # 1 byte per byte instead of an int32 per byte (d2h is the bottleneck)
    return out[:, 0, :max_out].astype(jnp.uint8), state[:, 0, :]


@functools.lru_cache(maxsize=1)
def encode_commit_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
