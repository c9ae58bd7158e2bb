"""Pallas TPU kernel: speculative greedy-walk prediction for the
reference-parity extended encode (``engine="device-greedy"``).

Why this exists: the byte-parity device mode computes cap-16 (+probe)
match tables on the TPU, but the authoritative greedy walk runs in the
native committer on the host — and the host's parity never depends on
WHICH table entries it receives.  Pre-divergence a chain search returns
exactly the table value; post-divergence the committer re-searches every
token anyway (deleted ring ranges create adjacencies and tie-flips the
pure-history tables cannot see — tampnative.cpp ``exact_tables``), so a
table entry is only ever (a) a verbatim answer that a chain search would
reproduce, or (b) a quick-rejection seed.  Therefore the device can ship
entries *sparsely, at the positions a speculative walk predicts the
committer will visit*, instead of a dense 2-4 B/input-byte plane: a
missing entry costs host CPU (one chain search), never output bytes.

This kernel IS that speculative walk: a scalar-core replay of the
reference greedy step (RLE accumulate/decide with the 241-chunk rule,
``use_pattern`` for short runs, the lazy probe deferral, one-shot
extended jumps approximating the growth loop — reference anchor:
BrianPugh/tamp tamp/_c_src/tamp/compressor.c:437-660) over a packed
per-position plane ``idx16 | len16 << 15 | run << 20``.  It emits

- a **start bitmap** (bit t set <=> an entry for position t is in the
  stream) written per tile through an SMEM output block, and
- a **compact entry stream**: the packed table word (and the probe word
  when lazy) for every predicted search point with ``len16 >= minp``,
  in walk order, double-buffer-DMA'd to HBM in 128-word chunks.

The host reconstructs positions with one popcount pass over the bitmap
(entry count == popcount, so no state pull is needed) and expands into
sentinel-holed dense tables for the native committer.  Prediction
accuracy only tunes the pull volume and the host's chain-search rate:
mispredictions after the first window-write truncation are expected and
harmless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import compute_min_pattern_size
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["greedy_predict_batch", "pack_predict_plane"]

TILE = 512        # positions per grid step (2 KiB SMEM per stream)
ECHUNK_W = 128    # entry-stream flush granularity (int32 words)

# state-row slots
P_NE, P_T, P_FL, P_NSLOTS = 0, 1, 2, 8


def _kernel(pk_ref, pp_ref, n_ref, bm_ref, ent_ref, state_ref, obuf, bmbuf,
            st, dma_sem, bm_sem, *, window: int, minp: int, lazy: bool,
            tile: int):
    s = pl.program_id(0)
    i = pl.program_id(1)
    base = i * tile
    EMASK = 2 * ECHUNK_W - 1
    SINK = 2 * ECHUNK_W
    NW = tile // 32          # bitmap words this tile produces (16)
    # Bitmap words accumulate in a 2 x 128-word scratch and flush one full
    # 128-word chunk (4096 positions = 8 tiles) per DMA: Mosaic requires
    # SMEM DMA slice sizes to be 128-aligned along the minor dim, so the
    # 16-word per-tile block cannot ship on its own.  n_tiles is a
    # multiple of 8 (NP >= 4096 enforced by the wrapper), so the last
    # tile's flush is the regular i%8==7 one.
    half = lax.rem(i // 8, 2) * 128
    hw = half + lax.rem(i, 8) * NW  # this tile's word window
    wmask = (1 << window) - 1
    npos = n_ref[0, 0, 0]
    hard_stop = npos - 15  # the host tail walk re-searches below rem=16

    def flush_chunk(ch):
        dst = ent_ref.at[s, :, pl.ds(ch * ECHUNK_W, ECHUNK_W)]

        @pl.when(ch % 2 == 0)
        def _():
            cp = pltpu.make_async_copy(
                obuf.at[:, 0:ECHUNK_W], dst, dma_sem)
            cp.start()
            cp.wait()

        @pl.when(ch % 2 == 1)
        def _():
            cp = pltpu.make_async_copy(
                obuf.at[:, ECHUNK_W:2 * ECHUNK_W], dst, dma_sem)
            cp.start()
            cp.wait()

    @pl.when(i == 0)
    def _():
        for k in range(4):
            st[k] = 0

    # zero this tile's bitmap word window, OR bits as the walk visits
    for k in range(NW):
        bmbuf[0, hw + k] = 0

    stop = jnp.minimum(base + tile, hard_stop)

    def cond(carry):
        t = carry[0]
        return (t >= base) & (t < stop)

    def body(carry):
        t, ne, flushed = carry
        p = pk_ref[0, 0, t - base]
        ln = (p >> 15) & 31
        run = (p >> 20) & 255
        matchy = ln >= minp
        # reference step order: RLE accumulate/decide first.  run >= 7
        # accumulates/chunks with no search; run in [2, 6] searches
        # (use_pattern) and consumes the run only when the match loses.
        is_rle = run >= 2
        use_pat = is_rle & (run <= 6) & (ln > run)
        rle_go = is_rle & ~use_pat
        c = jnp.minimum(run, 241)
        go_lazy = jnp.int32(0)
        if lazy:
            q = pp_ref[0, 0, t - base]
            pix = q & 0x7FFF
            psz = (q >> 15) & 15
            tau = t & wmask
            go_lazy = (matchy & (ln <= 8) & (psz > ln)
                       & ~((pix <= tau) & (tau < pix + psz))
                       & ~rle_go).astype(jnp.int32)
        adv = jnp.where(rle_go, c,
                        jnp.where(matchy & (go_lazy == 0), ln, 1))
        emit = (matchy & (run <= 6)).astype(jnp.int32)
        # bitmap: unconditional read-modify-write, OR-in 0 when not
        # emitting (cheaper than a predicated sink slot)
        wi = hw + ((t - base) >> 5)
        bmbuf[0, wi] = bmbuf[0, wi] | (emit << (t & 31))
        slot = jnp.where(emit == 1, ne & EMASK, SINK)
        obuf[0, slot] = p
        if lazy:
            slot2 = jnp.where(emit == 1, (ne + 1) & EMASK, SINK)
            obuf[0, slot2] = q
            ne = ne + 2 * emit
        else:
            ne = ne + emit
        # <= 2 words appended per iteration: at most one chunk boundary
        cross = (ne // ECHUNK_W > flushed).astype(jnp.int32)

        @pl.when(cross == 1)
        def _():
            flush_chunk(flushed)

        return t + adv, ne, flushed + cross

    t, ne, flushed = lax.while_loop(
        cond, body, (st[P_T], st[P_NE], st[P_FL]))

    @pl.when(lax.rem(i, 8) == 7)
    def _():
        bdst = bm_ref.at[s, :, pl.ds((i // 8) * 128, 128)]

        @pl.when(lax.rem(i // 8, 2) == 0)
        def _():
            cp = pltpu.make_async_copy(bmbuf.at[:, 0:128], bdst, bm_sem)
            cp.start()
            cp.wait()

        @pl.when(lax.rem(i // 8, 2) == 1)
        def _():
            cp = pltpu.make_async_copy(bmbuf.at[:, 128:256], bdst, bm_sem)
            cp.start()
            cp.wait()

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        @pl.when(ne > flushed * ECHUNK_W)
        def _():
            flush_chunk(flushed)

    st[P_T] = t
    st[P_NE] = ne
    st[P_FL] = flushed
    state_ref[0, 0, P_NE] = ne
    state_ref[0, 0, P_T] = t
    state_ref[0, 0, P_FL] = flushed


def pack_predict_plane(dh, npos, len16, idx16, *, dlast: int, NP: int):
    """Packed walker plane ``idx16 | len16 << 15 | run << 20`` (int32).

    ``run[t]`` = forward count of bytes equal to the PREVIOUS byte (the
    reference's ``last_ring_byte`` in the pre-divergence steady state),
    capped at 255; 0 at run breaks and beyond ``npos``.  All arrays
    (S, NP); ``dh`` int32 byte values.
    """
    from .plan_ext import _rcummin

    p_i = lax.broadcasted_iota(jnp.int32, dh.shape, 1)
    last = jnp.roll(dh, 1, axis=1).at[:, 0].set(dlast)
    valid = p_i < npos[:, None]
    chg = (dh != last) | ~valid
    nxt = jnp.where(chg, p_i, NP)
    nch = _rcummin(nxt, jnp.int32(NP))
    nch_after = jnp.roll(nch, -1, axis=1).at[:, -1].set(NP)
    run = jnp.where(chg, 0, jnp.minimum(nch_after - p_i, 255))
    ln = jnp.where(valid, jnp.clip(len16, 0, 16), 0)
    return (idx16 & 0x7FFF) | (ln << 15) | (run << 20)


@functools.partial(
    jax.jit,
    static_argnames=("NP", "window", "literal", "lazy", "tile", "interpret"))
def greedy_predict_batch(pk, pp, npos, *, NP: int, window: int, literal: int,
                         lazy: bool, tile: int = TILE,
                         interpret: bool = False):
    """Speculative walk over S shards.

    ``pk``: (S, NP) int32 packed plane (pack_predict_plane); ``pp``:
    (S, NP) int32 probe plane ``pidx | plen << 15`` (ignored unless
    lazy).  Returns (bitmap (S, NP//32) int32, entries (S, EPAD) int32,
    state (S, 8) int32).  Entry count per shard == popcount(bitmap row)
    (doubled when lazy: entries are (main, probe) pairs in walk order).
    """
    S = pk.shape[0]
    if NP % (tile * 8) or tile % 32:
        raise ValueError("greedy_predict_batch needs NP % (tile * 8) == 0 "
                         "(128-word bitmap DMA chunks)")
    n_tiles = NP // tile
    minp = compute_min_pattern_size(window, literal)
    # non-lazy entries advance >= 2 per emit; lazy deferrals can emit a
    # pair at advance 1
    epad = (2 * NP if lazy else NP // 2) + 2 * ECHUNK_W
    n_in = jnp.zeros((S, 1, 8), jnp.int32).at[:, 0, 0].set(npos)
    kern = functools.partial(_kernel, window=window, minp=minp, lazy=lazy,
                             tile=tile)
    bm, ent, state = pl.pallas_call(
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, P_NSLOTS), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, NP // 32), jnp.int32),
            jax.ShapeDtypeStruct((S, 1, epad), jnp.int32),
            jax.ShapeDtypeStruct((S, 1, P_NSLOTS), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, 2 * ECHUNK_W + 1), jnp.int32),  # +1: sink
            pltpu.SMEM((1, 256), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        pk.reshape(S, 1, NP),
        pp.reshape(S, 1, NP),
        n_in,
    )
    return bm[:, 0, :], ent[:, 0, :], state[:, 0, :]
