"""Device-side OPTIMAL (minimum-bit) v1 parse — a TPU formulation of the
minimum-bit dynamic program the host runs in ``tampn_opt_v1_plan``
(_native/tampnative.cpp), bit-for-bit the same parse.

The DP is a backward recurrence with BOUNDED lookback: ``cost[i]`` depends
only on ``cost[i+1 .. i+K]`` (K = 16: literal advances 1, matches advance
``minp..minp+13 <= 16``).  Over the tropical (min, +) semiring the
recurrence is LINEAR, so each position's cost is a min-plus form over any
later boundary vector.  That yields a classic two-pass parallel scheme:

  pass 1  (parallel over blocks): push the K x K min-plus IDENTITY through
          each B-position block, producing the block's transfer matrix
          ``T_b`` — the first K costs of block b as forms over the first K
          costs of block b+1.  One ``lax.scan`` of B steps whose state is
          (S, n_b, K, K); every step is ~15 masked adds + mins on the VPU.
  combine (tiny sequential scan over blocks): boundary vectors
          ``v_b = T_b (min-plus) v_{b+1}``, right to left.
  pass 2  (parallel over blocks): with boundaries concrete, re-run the
          recurrence numerically and emit the per-position CHOICE with the
          native DP's exact tie-break — literal first, then ascending
          match size, strictly-less replacement — encoded as
          ``score = cost * 32 + priority`` (costs stay < 2^25, so the
          packed score fits int32).

Positions at or past a shard's length are FREE literals (cost 0), which
makes the padded boundary condition uniform (cost == 0 from ``npos`` on)
without any per-shard dynamic shapes; in-shard matches never reach past
``npos`` because the exact tables are sentinel-capped.

Total work is ~B + NP/B scan steps (B = 1024 balances both) of small
elementwise updates — measured ~2 ms/MB on v5e vs ~60 ms/MB for the
native host DP — and the parse feeds the SAME planned-fields Pallas
commit kernel as the other device pipelines, so the whole optimal encode
runs on-chip (engine/pipeline.encode_v1_device_optimal).

Reference: the reference package has no optimal parser (SURVEY §6); this
extends the repo's beyond-reference ratio edge (encode_v1(parse="optimal"),
-1.8% vs greedy) to the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import HUFFMAN_LENGTHS, compute_min_pattern_size
from ._jaxinit import ensure_jax_cache

ensure_jax_cache()

__all__ = ["opt_v1_choice_device"]

K = 16            # max lookback: literal(1), matches minp..minp+13 <= 16
# Saturating infinity.  Must exceed the largest REAL cost (NP * (1+literal)
# bits) or valid shards read as excess-bits, and the packed pass-2 score
# (cost * 32 + pri) must fit int32 — so INF tops out just under 2^26.
# opt_v1_choice_device validates the resulting shard-size bound (~7 MiB).
INF = (1 << 26) - 64


@functools.partial(
    jax.jit, static_argnames=("window", "literal", "NP", "B"))
def opt_v1_choice_device(flen, data, npos, *, window: int, literal: int,
                         NP: int, B: int = 1024):
    """Per-position optimal-parse choice for S shards.

    ``flen``: (S, NP) int32 cap-16 match-length table (exact / oracle
    semantics; garbage past ``npos`` is masked internally); ``data``:
    (S, NP) uint8; ``npos``: (S,) int32.  Returns ``(choice, cost0,
    bad)``: ``choice`` (S, NP) int32 — 1 = literal, s = match of size s,
    identical to the native DP's choice at every position < npos —
    ``cost0`` (S,) int32, the payload bit cost (>= INF signals excess
    bits), and ``bad`` (S,) bool — True when ANY in-shard position has no
    valid token.  The native DP (``tampn_opt_v1_plan``, the canonical
    semantics) returns ExcessBitsError in that case even for positions
    the optimal walk never visits; checking only ``cost0`` would let the
    device path emit a stream where the native path raises (ADVICE r04).
    """
    S = flen.shape[0]
    B = min(B, NP)
    assert NP % B == 0
    n_b = NP // B
    minp = compute_min_pattern_size(window, literal)
    # Worst-case payload bits per byte of a VALID shard: a literal-eligible
    # byte costs 1+literal; a byte only coverable by matches costs at most
    # ceil((window + max huffman len) / minp) (ADVICE r04: for literal < 8
    # that can exceed 1+literal, so guarding on literals alone could let a
    # valid shard saturate to INF and raise a spurious ExcessBitsError).
    worst = max(1 + literal, -(-(window + 9) // minp))
    if NP * worst >= INF:
        raise ValueError(
            f"shard too large for the device optimal DP: NP={NP} can cost "
            f"up to NP*{worst} bits >= INF={INF}; use shard_size <= "
            f"{(INF // worst) & ~1023} bytes")
    maxpat = minp + 13
    lit_limit = 256 if literal == 8 else (1 << literal)
    litc = jnp.int32(1 + literal)

    p_abs = jnp.arange(NP, dtype=jnp.int32)[None, :]
    in_shard = p_abs < npos[:, None]
    di = data.astype(jnp.int32)
    # free-literal padding: cost 0, always valid -> cost[p >= npos] == 0
    lit_cost = jnp.where(in_shard,
                         jnp.where(di < lit_limit, litc, INF), 0)
    cap = jnp.where(in_shard, jnp.minimum(flen, maxpat), 0)

    def to_steps(x):  # (S, NP) -> (B, S, n_b), step k = in-block offset B-1-k
        return x.reshape(S, n_b, B).transpose(2, 0, 1)[::-1]

    lit_s = to_steps(lit_cost)
    cap_s = to_steps(cap)

    match_bits = [int(HUFFMAN_LENGTHS[s - minp]) + window
                  for s in range(minp, maxpat + 1)]

    # ---- pass 1: block transfer matrices --------------------------------
    eye = jnp.where(jnp.eye(K, dtype=jnp.int32) == 1, 0, INF)
    M0 = jnp.broadcast_to(eye, (S, n_b, K, K))

    def step1(M, xs):
        lc, cp = xs  # (S, n_b)
        new = jnp.minimum(M[:, :, 0] + lc[:, :, None], INF)
        for s in range(minp, maxpat + 1):
            cs = jnp.where(cp >= s, match_bits[s - minp], INF)
            new = jnp.minimum(new, M[:, :, s - 1] + cs[:, :, None])
        new = jnp.minimum(new, INF)
        M = jnp.concatenate([new[:, :, None], M[:, :, : K - 1]], axis=2)
        return M, None

    T, _ = lax.scan(step1, M0, (lit_s, cap_s))  # (S, n_b, K, K)

    # ---- combine: boundary vectors, right to left -----------------------
    def stepc(v, Tb):  # v: (S, K) = v_{b+1};  Tb: (S, K, K)
        vin = v
        v = jnp.minimum(jnp.min(Tb + v[:, None, :], axis=2), INF)
        return v, vin  # emit the INCOMING boundary (block b's v_{b+1})

    v0, vins = lax.scan(stepc, jnp.zeros((S, K), jnp.int32),
                        T.transpose(1, 0, 2, 3)[::-1])
    # vins[k] = v_{b+1} for b = n_b-1-k  ->  reorder to block index
    bounds = vins[::-1].transpose(1, 0, 2)  # (S, n_b, K)

    # ---- pass 2: concrete costs + exact-tie-break choice -----------------
    # score = cost * 32 + priority; priority 0 = literal, then ascending s
    ins_s = to_steps(in_shard.astype(jnp.int32))

    def step2(carry, xs):  # cur: (S, n_b, K) = cost[p+1 .. p+K]
        cur, bad = carry
        lc, cp, ins = xs
        best = jnp.minimum(cur[:, :, 0] + lc, INF) * 32
        for s in range(minp, maxpat + 1):
            cs = jnp.where(cp >= s, match_bits[s - minp], INF)
            sc = jnp.minimum(cur[:, :, s - 1] + cs, INF) * 32 + (s - minp + 1)
            best = jnp.minimum(best, sc)
        cost = jnp.minimum(best >> 5, INF)
        pri = best & 31
        choice = jnp.where(pri == 0, 1, pri - 1 + minp)
        bad = bad | ((ins == 1) & (cost >= INF))
        cur = jnp.concatenate([cost[:, :, None], cur[:, :, : K - 1]], axis=2)
        return (cur, bad), choice

    (_, bad), ch = lax.scan(
        step2, (bounds, jnp.zeros((S, n_b), bool)), (lit_s, cap_s, ins_s))
    choice = ch[::-1].transpose(1, 2, 0).reshape(S, NP)
    return choice, v0[:, 0], bad.any(axis=1)
