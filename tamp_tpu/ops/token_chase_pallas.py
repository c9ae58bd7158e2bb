"""Pallas TPU kernel: sequential token-boundary chase for the wavefront
decoder.

The wavefront decoder's boundary resolution must enumerate the orbit of the
per-bit jump array ``nxt`` from bit 0 (the true token starts).  The XLA
path (ops/decode_wavefront._token_table) does blocked pointer doubling +
a block-entry scan + two lockstep walks — ~75% of whose cost is HBM-bound
full-domain gathers at ~14 ns/element on this chip.

This kernel exploits two facts the XLA formulation cannot:

- the orbit is *monotone* (every token advances 9..41 bits), so ``nxt``
  streams through on-chip memory tile-by-tile exactly once; and
- each hop is one dependent scalar load, which the scalar core does in a
  few cycles from SMEM — no vector gathers at all.

Grid steps stream 2 KiB SMEM tiles of ``nxt`` (Pallas pipelines the
HBM->SMEM copies); a scalar ``while_loop`` chases the chain inside the
resident tile, appending token starts to a per-tile SMEM output row (the
row's last slot carries the tile's token count); the chase position
carries across grid steps in SMEM scratch.  One XLA scatter compacts the
ragged rows into the dense ``starts`` table.

Semantics are identical to _token_table (differentially pinned by
tests/test_decode_wavefront.py): a bit whose ``nxt`` is the sentinel NBP
is an incomplete trailing token — dropped, and the chase ends there.
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

__all__ = ["token_table_chase", "chase_available"]

TILE = 512     # bits of nxt per grid step (2 KiB of SMEM)
CAP = 128      # output row width (Mosaic lane multiple); tokens/tile <= 58
_SPILL = 126   # scratch slot for dropped-token stores (never a real slot)
_COUNT = 127   # per-tile token count lives in the row's last slot


def _kernel(nxt_ref, row_ref, c_ref):
    i = pl.program_id(1)  # tile index within the current shard

    @pl.when(i == 0)
    def _():
        c_ref[0] = 0  # each shard's chase starts at bit 0

    base = i * TILE
    nbp = pl.num_programs(1) * TILE

    def cond(st):
        c, _k = st
        return (c >= base) & (c < base + TILE)

    def body(st):
        c, k = st
        n = nxt_ref[0, 0, c - base]
        ok = n < nbp  # sentinel: incomplete trailing token — drop, stop
        # unconditional store; the !ok arm hits the spill slot, which a real
        # token never reaches (k <= TILE/9 + 1 < _SPILL)
        row_ref[0, 0, jnp.where(ok, k, _SPILL)] = c
        return jnp.where(ok, n, nbp), k + jnp.where(ok, 1, 0)

    c, k = lax.while_loop(cond, body, (c_ref[0], 0))
    row_ref[0, 0, _COUNT] = k
    c_ref[0] = c


@functools.partial(jax.jit, static_argnames=("NBP", "interpret"))
def _chase(nxt, *, NBP: int, interpret: bool):
    S = nxt.shape[0]
    n_tiles = NBP // TILE
    rows = pl.pallas_call(
        _kernel,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TILE), lambda s, i: (s, 0, i),
                         memory_space=pltpu.SMEM)
        ],
        out_specs=pl.BlockSpec((1, 1, CAP), lambda s, i: (s, 0, i),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((S, 1, n_tiles * CAP), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(nxt.reshape(S, 1, NBP))
    return rows.reshape(S, n_tiles, CAP)


def token_table_chase(nxt, NBP: int, T_max: int,
                      *, interpret: bool | None = None):
    """Batched token tables: ``nxt`` (S, NBP) -> (starts (S, T_max), T (S,)).

    Same contract as vmapping decode_wavefront._token_table over shards.
    ``interpret`` defaults to compiled on TPU, interpreter elsewhere.
    """
    if interpret is None:
        interpret = not chase_available()
    rows = _chase(nxt, NBP=NBP, interpret=interpret)
    n_tiles = NBP // TILE

    def compact(row):
        cnt = row[:, _COUNT]
        cs = jnp.cumsum(cnt)
        base = cs - cnt
        pos = jnp.arange(CAP, dtype=jnp.int32)[None, :]
        valid = pos < cnt[:, None]
        flat = base[:, None] + pos
        starts = jnp.zeros(T_max, jnp.int32).at[
            jnp.where(valid, flat, T_max)
        ].set(row, mode="drop")
        return starts, cs[n_tiles - 1]

    return jax.vmap(compact)(rows)


@functools.lru_cache(maxsize=1)
def chase_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
