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

__all__ = ["encode_commit_batch", "encode_commit_available"]

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


@functools.partial(
    jax.jit,
    static_argnames=("NP", "window", "literal", "lazy", "max_out",
                     "interpret"))
def encode_commit_batch(packed, probe, npos, *, NP: int, window: int,
                        literal: int, lazy: bool, max_out: int,
                        interpret: bool = False):
    """Steady-state v1 commit of S shards.

    ``packed``: (S, NP) int32 ``size<<23 | idx<<8 | byte`` per position;
    ``probe``: (S, NP) int32 ``psize<<15 | pidx`` (ignored unless lazy);
    ``npos``: (S,) int32 shard lengths.  Returns (bytes (S, max_out) int32,
    state (S, 16) int32) — see the S_* slots.
    """
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
