"""Pallas TPU kernel: stream-commit Tamp decode.

Architecture: the wavefront decoder's *speculative per-bit parse* stays on
the VPU (ops/decode_wavefront._speculative_parse — dense, parallel, cheap),
but everything after boundary-speculation — boundary resolution, window
fold, placement, value resolution — collapses into ONE sequential pass on
the scalar core: chase the token chain through SMEM tiles of the parse
outputs and *commit* each token against an SMEM-resident window ring,
streaming decoded bytes back to HBM in 512-byte chunks.

Why this wins on TPU: the XLA wavefront stages pay ~14 ns/element serial
gathers over megabyte HBM arrays, many rounds of them; the scalar pass
does a handful of SMEM operations (a few ns each) per decoded *byte*, and
the format's loop-carried window dependence — the thing the parallel
formulation spends all its machinery circumventing — is free in a
sequential commit.  The parallel stages remain (decode_wavefront) as the
oracle and the shard_map mesh path.

Semantics: identical to the native decoder (differential tests in
tests/test_decode_wavefront.py); window-write rules follow the reference
(basic matches write fully with wrap; RLE writes are capped at 8 bytes and
never wrap; extended-match writes never wrap — reference
tamp/_c_src/tamp/decompressor.c decode_rle / decode_extended_match,
re-derived via engine/pdecode_np).

Each shard's per-bit parse results are fused into ONE int32 stream
(``kind | cnt<<3 | delta<<11 | idx<<17``) and gridded in ``tile``-bit SMEM
tiles; carries (bit position, output position, ring head, FLUSH state,
error) live in SMEM scratch across grid steps.

Inner-loop design (scalar-core economics measured on v5e: ALU ~0.5 ns,
SMEM load/store ~15-20 ns, loop-iteration branch ~37 ns — so per-byte
SMEM-op count AND per-iteration branch count are the whole game):

- ONE packed SMEM word per token: ``kind(3) | cnt(8) | delta(6) | idx``
  where ``delta`` is the token's bit length (0 = trailing incomplete) —
  the walk advances ``c += delta`` with no second (``nxt``) stream load,
  halving both the per-token SMEM loads and the per-tile input DMA.
- Copy loops are specialized per token kind; match copies take a direct
  3-plain-SMEM-ops-per-byte path when the window write provably cannot
  wrap nor touch the read range (the common case; extended matches never
  wrap by format rule), keep the per-byte wrap select only on the
  once-per-W wrapping path, and stage through ``tmp`` on overlap.
  (A 4x-unrolled predicated variant measured *slower* — the scalar core
  is SMEM-port-bound here, not branch-bound, and sink-slot stores cost
  the same port slot as real ones.)
- The RLE output splat overshoots up to 3 bytes past ``cnt``: overshoot
  lands at future output positions that later tokens rewrite before their
  chunk is flushed (flushes trail the write head), so it needs no
  predication.
- The output buffer is ONE flat four-chunk SMEM array indexed
  ``out_pos & 2047`` whose 512-byte quarters are DMA'd to HBM
  asynchronously as static slices selected by ``chunk % 4`` (four
  chunks, not two, so a chunk-straddling token can never write into the
  quarter the one in-flight DMA is still reading); in UNIFIED mode
  (v1-format streams) the buffer is W bytes wide and doubles as the
  window ring itself.
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

__all__ = ["commit_decode_batch", "commit_available"]

TILE = 512        # parse-stream bits per grid step (2 KiB SMEM per stream)
OUT_CHUNK = 512   # decoded bytes per HBM flush (SMEM buffer is 2 chunks)

# error codes (shared with decode_wavefront)
ERR_OK, ERR_INVALID, ERR_OOB, ERR_OVERFLOW = 0, 1, 2, 3
K_LIT, K_MATCH, K_RLE, K_EXT, K_FLUSH = 0, 1, 2, 3, 4

# SMEM state slots
_C, _OUT, _POS, _LWF, _ERR, _FLUSHED = 0, 1, 2, 3, 4, 5


def _kernel(pk_ref, dinit_ref, dreset_ref, out_ref, lens_ref,
            errs_ref, ring, obuf, tmp, st, dma_sem, *, W: int, more: bool,
            max_out: int, tile: int, unified: bool):
    s = pl.program_id(0)
    i = pl.program_id(1)
    nbp = pl.num_programs(1) * tile
    base = i * tile
    # UNIFIED mode (v1 streams, no dictionary reset, W >= 4 chunks): every
    # v1 token writes all its bytes with wrap, so the window ring IS the
    # last W output bytes and slot == out_pos & (W-1) — the output buffer
    # doubles as the ring, saving one SMEM store per decoded byte (the
    # ring write) and one load path.  Extended streams diverge (RLE caps
    # at 8, extended writes truncate), so they keep the separate ring.
    #
    # The buffer holds FOUR flush chunks (not two): the flush DMA is async
    # (waited one flush later), and a chunk-straddling token writes up to
    # 244 bytes past the boundary BEFORE the flush loop runs — with two
    # halves those writes land in the half the in-flight DMA is still
    # reading.  With >= 4 halves the in-flight DMA is on half ch%n and
    # pre-flush writes only ever reach halves (ch+1)%n and (ch+2)%n.
    OBUF_W = W if unified else 4 * OUT_CHUNK
    OMASK = OBUF_W - 1
    n_half = OBUF_W // OUT_CHUNK

    def wait_flush():
        # waits the one outstanding flush DMA (both halves are the same
        # size, so any same-shape copy object serves as the wait handle)
        pltpu.make_async_copy(
            obuf.at[:, 0:OUT_CHUNK],
            out_ref.at[s, :, pl.ds(0, OUT_CHUNK)], dma_sem).wait()

    def flush_chunk(ch):
        # ASYNC flush: wait the previous chunk's DMA (its half is the one
        # the walk writes next), then start this one and keep committing
        # into the other half — the old synchronous wait blocked the
        # scalar core ~2 us per 512-byte chunk.  Invariant: at most one
        # flush in flight; the final wait is at the last grid step.
        # The two chunk halves are STATIC slices of one buffer (Mosaic
        # cannot DMA from a dynamic SMEM offset), selected by parity.
        @pl.when(ch > 0)
        def _():
            wait_flush()

        dst = out_ref.at[s, :, pl.ds(ch * OUT_CHUNK, OUT_CHUNK)]
        for h in range(n_half):

            @pl.when(ch % n_half == h)
            def _(h=h):
                pltpu.make_async_copy(
                    obuf.at[:, h * OUT_CHUNK:(h + 1) * OUT_CHUNK],
                    dst, dma_sem).start()

    def load_ring(src_ref):
        # scalar copy (SMEM -> SMEM); a DMA into SMEM scratch doesn't lower
        def rbody(k, _):
            ring[k] = src_ref[0, 0, k]
            return 0

        lax.fori_loop(0, W, rbody, 0)

    @pl.when(i == 0)
    def _():
        if unified:
            def ubody(k, _):
                obuf[0, k] = dinit_ref[0, 0, k]
                return 0

            lax.fori_loop(0, W, ubody, 0)
        else:
            load_ring(dinit_ref)
        st[_C] = 0
        st[_OUT] = 0
        st[_POS] = 0
        st[_LWF] = 0
        st[_ERR] = ERR_OK
        st[_FLUSHED] = 0

    def cond(carry):
        c = carry[0]
        return (c >= base) & (c < base + tile) & (carry[5] == ERR_OK)

    def body(carry):
        c, out_pos, pos, lwf, flushed, err = carry
        p = pk_ref[0, 0, c - base]
        kind = p & 7
        cnt = (p >> 3) & 0xFF
        delta = (p >> 11) & 63
        # window index, or the literal byte (<= 255 <= W-1 since window >= 8)
        idx = (p >> 17) & (W - 1)

        is_inc = delta == 0  # trailing incomplete token: drop and stop
        is_fl = kind == K_FLUSH
        is_lit = kind == K_LIT
        is_rle = kind == K_RLE
        is_ext = kind == K_EXT
        is_m = (kind == K_MATCH) | is_ext

        err = jnp.where(
            (~is_inc) & is_m & (idx + cnt > W), jnp.int32(ERR_OOB), err)
        err = jnp.where(
            (~is_inc) & (~is_fl) & (out_pos + cnt > max_out),
            jnp.int32(ERR_OVERFLOW), err)
        if unified:  # v1 parses never produce RLE/EXT kinds
            err = jnp.where(
                (~is_inc) & (is_rle | is_ext), jnp.int32(ERR_INVALID), err)
        emit = (~is_inc) & (~is_fl) & (err == ERR_OK)

        # double FLUSH on a more_header stream: reset the window in place
        if more:
            do_reset = (~is_inc) & is_fl & (lwf == 1) & (err == ERR_OK)

            @pl.when(do_reset)
            def _():
                load_ring(dreset_ref)

            pos = jnp.where(do_reset, 0, pos)
        # "previous token was FLUSH": a run of FLUSHes resets on every pair
        # overlap, matching the XLA model's fl & prev_fl
        lwf = jnp.where(is_fl, 1, 0)

        # window-write cap: basic matches and literals always write (with
        # wrap); RLE writes min(cnt, 8) and never wraps; extended matches
        # never wrap
        wr = jnp.where(
            is_rle, jnp.minimum(jnp.minimum(cnt, 8), W - pos),
            jnp.where(is_ext, jnp.minimum(cnt, W - pos), cnt))

        # Match copies use SNAPSHOT semantics: the reference's window copy
        # goes reverse-order on overlap and the output copy reads the
        # pristine window (tamp/_c_src/tamp/common.c:58-86 tamp_window_copy),
        # so a source byte is never one this token already wrote.  When the
        # write range cannot touch the read range [idx, idx+cnt) — the
        # common case — copy directly; otherwise stage through ``tmp``.
        wrapped = pos + wr > W  # only basic matches can wrap (wr == cnt)
        ov = jnp.where(
            wrapped,
            (idx + cnt > pos) | (idx < pos + wr - W),
            (idx < pos + wr) & (pos < idx + cnt))

        if unified:
            # the output buffer IS the ring: literal = 1 store, match =
            # 1 load + 1 store per byte (store address == output address,
            # wrap and no-wrap collapse into one path)
            @pl.when(emit & is_lit)
            def _():
                obuf[0, out_pos & OMASK] = idx

            @pl.when(emit & is_m & ~ov)
            def _():
                def m_u(j, _):
                    obuf[0, (out_pos + j) & OMASK] = obuf[0, idx + j]
                    return 0

                lax.fori_loop(0, cnt, m_u, 0)

            @pl.when(emit & is_m & ov)
            def _():  # snapshot staging (cnt <= 16 for v1 matches)
                def sbody(j, _):
                    tmp[j] = obuf[0, idx + j]
                    return 0

                lax.fori_loop(0, cnt, sbody, 0)

                def e_u(j, _):
                    obuf[0, (out_pos + j) & OMASK] = tmp[j]
                    return 0

                lax.fori_loop(0, cnt, e_u, 0)

        if not unified:
            _classic_paths(emit, is_lit, is_rle, is_m, idx, cnt, wr, pos,
                           out_pos, wrapped, ov, ring, obuf, tmp, OMASK, W)

        adv = jnp.where(emit, jnp.where(is_lit, 1, wr), 0)
        p2 = pos + adv  # adv < W always (cnt <= 241 < 256 <= W)
        pos = jnp.where(p2 >= W, p2 - W, p2)
        out_pos = out_pos + jnp.where(emit, cnt, 0)

        # flush completed chunks (a token adds <= 241 bytes, so at most one
        # chunk completes per token; async copy — see flush_chunk).
        # ``flushed`` counts CHUNKS so the HBM offset is written as
        # chunk * OUT_CHUNK — a form Mosaic can prove 128-divisible.
        done = out_pos // OUT_CHUNK

        def fcond(ch):
            return ch < done

        def fbody(ch):
            flush_chunk(ch)
            return ch + 1

        flushed = lax.while_loop(fcond, fbody, flushed)

        c = jnp.where(is_inc | (err != ERR_OK), nbp, c + delta)
        return c, out_pos, pos, lwf, flushed, err

    def _classic_paths(emit, is_lit, is_rle, is_m, idx, cnt, wr, pos,
                       out_pos, wrapped, ov, ring, obuf, tmp, OMASK, W):
        # kind-specialized copy paths: the generic per-byte select/
        # predicate loop costs ~2x on the SMEM-port-bound scalar core
        rle_b = ring[jnp.where(pos == 0, W - 1, pos - 1)]

        @pl.when(emit & is_lit)
        def _():  # literals always have cnt == 1 (decode_wavefront:199)
            obuf[0, out_pos & OMASK] = idx
            ring[pos] = idx

        @pl.when(emit & is_rle)
        def _():
            def r_out(q, _):
                j = q * 4
                for u in range(4):
                    obuf[0, (out_pos + j + u) & OMASK] = rle_b
                return 0

            lax.fori_loop(0, (cnt + 3) // 4, r_out, 0)

            def r_win(j, _):  # wr <= W - pos: no wrap
                ring[pos + j] = rle_b
                return 0

            lax.fori_loop(0, wr, r_win, 0)

        @pl.when(emit & is_m & ~ov & ~wrapped)
        def _():  # direct copy, no wrap: 3 plain SMEM ops per byte.
            # (Both a predicated 4x unroll and a true pair unroll measured
            # slower/flat — the scalar core is SMEM-port-bound here, and at
            # mean-3.6-byte matches the unroll's trip-count/tail arithmetic
            # eats the saved branches.)
            def m_both(j, _):
                b = ring[idx + j]
                obuf[0, (out_pos + j) & OMASK] = b
                ring[pos + j] = b
                return 0

            lax.fori_loop(0, wr, m_both, 0)

            def m_out(j, _):  # extended tail past the ring end: output only
                obuf[0, (out_pos + j) & OMASK] = ring[idx + j]
                return 0

            lax.fori_loop(wr, cnt, m_out, 0)

        @pl.when(emit & is_m & ~ov & wrapped)
        def _():  # basic match wrapping the ring end (rare: once per W)
            def m_both(j, _):
                b = ring[idx + j]
                obuf[0, (out_pos + j) & OMASK] = b
                wp = pos + j
                ring[jnp.where(wp >= W, wp - W, wp)] = b
                return 0

            lax.fori_loop(0, wr, m_both, 0)

        @pl.when(emit & is_m & ov)
        def _():
            def sbody(j, _):
                tmp[j] = ring[idx + j]
                return 0

            lax.fori_loop(0, cnt, sbody, 0)

            def e_both(j, _):
                b = tmp[j]
                obuf[0, (out_pos + j) & OMASK] = b
                wp = pos + j
                ring[jnp.where(wp >= W, wp - W, wp)] = b
                return 0

            lax.fori_loop(0, wr, e_both, 0)

            def e_out(j, _):
                obuf[0, (out_pos + j) & OMASK] = tmp[j]
                return 0

            lax.fori_loop(wr, cnt, e_out, 0)

    c, out_pos, pos, lwf, flushed, err = lax.while_loop(
        cond, body,
        (st[_C], st[_OUT], st[_POS], st[_LWF], st[_FLUSHED], st[_ERR]))

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        # flush the trailing partial chunk (padded region; masked by length)
        part = out_pos > flushed * OUT_CHUNK

        @pl.when(part)
        def _():
            flush_chunk(flushed)

        # complete the one outstanding flush before the kernel returns
        @pl.when(part | (flushed > 0))
        def _():
            wait_flush()

    st[_C] = c
    st[_OUT] = out_pos
    st[_POS] = pos
    st[_LWF] = lwf
    st[_FLUSHED] = flushed
    st[_ERR] = err
    lens_ref[0, 0, i] = out_pos
    errs_ref[0, 0, i] = err


@functools.partial(
    jax.jit,
    static_argnames=("NBP", "W", "more", "max_out", "tile", "unified",
                     "interpret"))
def commit_decode_batch(nxt, packed, dict_init, dict_reset, *, NBP: int,
                        W: int, more: bool, max_out: int, tile: int = 8192,
                        unified: bool = False, interpret: bool = False):
    """Sequential-commit decode of S parsed shards.

    ``nxt``/``packed``: (S, NBP) int32 parse streams (``kind | cnt<<3 |
    idx<<11``).  The two streams are fused on the VPU into ONE packed SMEM
    word per bit position — ``kind(3) | cnt(8) | delta(6) | idx`` — so the
    scalar walk does a single SMEM load per token (delta = token bit
    length; 0 flags a trailing incomplete token; every Tamp token is
    <= 1+9+9+4+window <= 38 bits, so 6 bits always hold it).  Returns
    (out (S, max_out) int32, out_len (S,), err (S,)).
    """
    S = nxt.shape[0]
    if W >= 4096:  # keep ring + tile + obuf comfortably inside SMEM
        tile = min(tile, 2048)
    tile = min(tile, NBP)
    # unified (output-buffer-as-ring) needs W >= 4 flush chunks (the
    # async-flush safety argument in _kernel) and no dictionary reset; the
    # caller also guarantees a v1 parse stream
    unified = unified and W >= 4 * OUT_CHUNK and not more
    n_tiles = NBP // tile
    mpad = -(-max_out // OUT_CHUNK) * OUT_CHUNK + OUT_CHUNK
    b = jnp.arange(NBP, dtype=jnp.int32)[None, :]
    delta = jnp.where(nxt >= NBP, 0, jnp.minimum(nxt - b, 63))
    pk = (packed & 0x7FF) | (delta << 11) | (packed >> 11 << 17)
    kern = functools.partial(_kernel, W=W, more=more, max_out=max_out,
                             tile=tile, unified=unified)
    out, lens, errs = pl.pallas_call(
        kern,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda s, i: (s, 0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda s, i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, W), lambda s, i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_tiles), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_tiles), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 1, mpad), jnp.int32),
            jax.ShapeDtypeStruct((S, 1, n_tiles), jnp.int32),
            jax.ShapeDtypeStruct((S, 1, n_tiles), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((8 if unified else W,), jnp.int32),
            pltpu.SMEM((1, W if unified else 4 * OUT_CHUNK), jnp.int32),
            pltpu.SMEM((256,), jnp.int32),
            pltpu.SMEM((6,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        pk.reshape(S, 1, NBP),
        dict_init.reshape(1, 1, W),
        dict_reset.reshape(1, 1, W),
    )
    out = out[:, 0, :max_out]
    lens_f = lens[:, 0, n_tiles - 1]
    # zero the padding (flush chunks carry stale buffer bytes past out_len)
    # so the contract matches the XLA wavefront kernel exactly
    out = jnp.where(
        jnp.arange(max_out, dtype=jnp.int32)[None, :] < lens_f[:, None],
        out, 0)
    return out, lens_f, errs[:, 0, n_tiles - 1]


@functools.lru_cache(maxsize=1)
def commit_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
