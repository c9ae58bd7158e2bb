"""Fused on-chip v1 encode: search -> pack -> commit in ONE device call.

Round 1 ran the Pallas search, pulled the match tables to the host
(~8 MB of int32 per raw MB through a ~15 MB/s tunnel), re-packed them in
NumPy, and re-uploaded them for the commit kernel — the measured
end-to-end device encode was 1.11 MB/s against an 18 MB/s compute-only
kernel.  This module keeps everything on-chip: the only h2d is the raw
shard bytes (uint8) + the (W,) dictionary, and the only d2h is the
compressed bytes plus a 16-int state row per shard.

Pipeline (all inside one jit):
  1. build the search operands ``C = dict || data || sentinel`` and the
     sentinel-padded byte rows by concatenation (elementwise, no gathers);
  2. batched Pallas match search (ops.match_pallas._search_pallas with a
     shard grid dimension), yielding (S, NP) len/idx tables in HBM;
  3. elementwise pack ``len<<23 | idx<<8 | byte`` (+ the lazy probe pack);
  4. Pallas stream-commit kernel (ops.encode_commit_pallas).

Reference semantics anchor: greedy longest-match, lowest ring index
(BrianPugh/tamp tamp/compressor.py:432-447), committed exactly as
engine/commit.commit_v1 — byte parity is asserted by
tests/test_encode_commit_pallas.py and the device sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..engine.search_np import LMAX
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["encode_v1_fused_dev", "SEARCH_T"]

SEARCH_T = 512  # chunk rows for the fused search (28.6 ms/MB vs 40.6 at 256)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("window", "literal", "lazy", "NP", "T", "cap",
                     "max_out", "interpret"))
def encode_v1_fused_dev(data, npos, dict_arr, *, window: int, literal: int,
                        lazy: bool, NP: int, T: int, cap: int, max_out: int,
                        interpret: bool = False):
    """Fused v1 encode of S shards.

    ``data``: (S, NP) uint8 (zero-padded); ``npos``: (S,) int32 lengths;
    ``dict_arr``: (W,) int32 initial window.  ``cap`` selects the table
    (15 or 16) the committer reads.  Returns (compressed (S, max_out)
    uint8, state (S, 16) int32) per ops.encode_commit_pallas.
    """
    from .encode_commit_pallas import encode_commit_batch
    from .match_pallas import _search_pallas

    S = data.shape[0]
    W = 1 << window
    Qseg = _round_up(T + W + 2 * LMAX, 128)
    n_chunks = NP // T
    assert n_chunks * T == NP, "NP must be a multiple of T"

    di = data.astype(jnp.int32)
    valid = jnp.arange(NP, dtype=jnp.int32)[None, :] < npos[:, None]
    C2 = jnp.concatenate(
        [
            jnp.broadcast_to(dict_arr[None, :].astype(jnp.int32), (S, W)),
            jnp.where(valid, di, -1),
            jnp.full((S, Qseg), -1, jnp.int32),
        ],
        axis=1,
    )
    d2 = jnp.concatenate(
        [jnp.where(valid, di, 0x1FF), jnp.full((S, Qseg), 0x1FF, jnp.int32)],
        axis=1,
    )

    tables = ("16",) if cap == 16 else ("15",)
    if lazy:
        tables = tables + ("probe",)
    base = jnp.zeros((S,), jnp.int32)
    outs = _search_pallas(C2, d2, base, window, T, tables, n_chunks,
                          interpret)
    flen, fidx = outs[0], outs[1]
    packed = (flen << 23) | (fidx << 8) | di
    if lazy:
        plen, pidx = outs[2], outs[3]
        probe = (plen << 15) | pidx
    else:
        probe = jnp.zeros_like(packed)

    return encode_commit_batch(
        packed, probe, npos, NP=NP, window=window, literal=literal,
        lazy=lazy, max_out=max_out, interpret=interpret)
