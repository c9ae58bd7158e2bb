"""Device-side OPTIMAL extended-format parse: a blocked min-plus DP with
the FULL maxpat lookback (K = minp + 131), bit-for-bit the token plan of
``tampn_opt_ext_plan`` (_native/tampnative.cpp).

This executes the plan parked in BASELINE.md round 4 — with one revision.
The parked sketch hoped a group-min basis (ext token cost is piecewise
constant over 8-wide size groups) could cut the basis to ~31 lanes; that
is REFUTED: the per-position cap (``min(flen, room, bound)``) cuts
size groups at arbitrary offsets, and an exact min over a partial,
position-dependent window cannot be formed from any fixed set of group
mins (sliding-window mins do not shift onto themselves, and aligned-block
mins leave misaligned partial ends needing individual lanes).  So the
basis stays the full K individual costs — and the K^2 state cost is made
feasible by UNROLLING U positions per scan step:

  pass 1   state (S, n_b, K, K) block transfer matrices; each scan step
           advances U = 16 positions, referencing the u new rows directly
           and the old matrix through ONE sliced min-plus matvec, then
           shifts once — HBM traffic drops U-fold vs the per-position
           form (the naive K = 134 scan moves ~1.2 TB per 8 MB batch;
           this moves ~72 GB).
  combine  boundary vectors right-to-left over blocks (tiny).
  pass 2   numeric costs + per-position choice; ``jnp.argmin`` returns
           the FIRST minimal advance, which IS the native tie-break
           (literal, then basic sizes ascending, then extended sizes
           ascending = ascending advance).

Forced-RLE regions (runs >= 13, engine/encode.opt_ext_runs) enter as
weight CHAINS: interior positions allow only an advance-1 edge whose
weight is the RLE chunk cost at chunk starts and 0 elsewhere, so the
region start's cost telescopes to exactly ``rbits + cost[region_end]`` —
the native DP's single region node — while the ``bound`` cap (distance
to the next region start) forbids any token from landing strictly inside
a region, exactly as the native DP's INF interior does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import HUFFMAN_LENGTHS, compute_min_pattern_size
from ._jaxinit import ensure_jax_cache
from .opt_parse import INF

ensure_jax_cache()

__all__ = ["opt_ext_choice_device"]


@functools.partial(
    jax.jit, static_argnames=("window", "literal", "NP", "B", "U",
                              "need_data"))
def opt_ext_choice_device(packed, data, npos, sideband_pos, sideband_cw, *,
                          window: int, literal: int, NP: int, B: int = 1024,
                          U: int = 16, need_data: bool = False):
    """Per-position optimal-parse choice for S shards (extended format).

    ``packed``: (S, NP) int32 ``flen | (room-1) << 8 | bound << 23 |
    interior << 31`` — flen the khat-aware cap-maxpat match length,
    room the ring-end cap ``W - (khat[i] mod W)``, bound the distance to
    the next forced-region start clipped to 255.  ``data``: (S, NP) int32
    byte values (literal eligibility; ignored unless ``need_data``, i.e.
    literal < 8).  ``sideband_pos``/``sideband_cw``: (S, C) int32 RLE
    chunk starts and their token bit costs, padding entries at DISTINCT
    positions >= NP (flat-scatter contract like pipeline_ext's sparse
    rc).  Returns (choice (S, NP) int32, cost0 (S,) int32, bad (S,)
    bool); ``bad`` mirrors the native DP's -2 (some in-shard position has
    no valid token).
    """
    S = packed.shape[0]
    B = min(B, NP)
    U = min(U, B)
    assert NP % B == 0 and B % U == 0
    n_b = NP // B
    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + 131
    K = maxpat
    worst = max(1 + literal, -(-(window + 9) // minp), 11)
    if NP * worst >= INF:
        raise ValueError(
            f"shard too large for the device optimal DP: NP={NP} can cost "
            f"up to NP*{worst} bits >= INF={INF}; use shard_size <= "
            f"{(INF // worst) & ~1023} bytes")
    lit_limit = 256 if literal == 8 else (1 << literal)
    litc = jnp.int32(1 + literal)

    p_abs = jnp.arange(NP, dtype=jnp.int32)[None, :]
    in_shard = p_abs < npos[:, None]
    flen = jnp.where(in_shard, packed & 0xFF, 0)
    room = ((packed >> 8) & 0x7FFF) + 1
    bound = (packed >> 23) & 0xFF
    interior = jnp.where(in_shard, (packed >> 31) & 1, 0)
    if need_data:
        eligible = data < lit_limit
    else:
        eligible = jnp.ones(packed.shape, bool)
    # free-literal padding keeps the boundary condition uniform (cost 0
    # from npos on); in-shard ineligible literals cost INF
    lc = jnp.where(in_shard, jnp.where(eligible, litc, INF), 0)
    # chunk-cost chain weights from the sparse sideband (one flat scatter)
    C = sideband_pos.shape[1]
    stride = NP + C
    flat = (jnp.arange(S, dtype=jnp.int32)[:, None] * stride
            + sideband_pos).reshape(-1)
    z = jnp.zeros(S * stride, jnp.int32)
    z = z.at[flat].set(sideband_cw.reshape(-1), mode="drop",
                       unique_indices=True)
    cw = z.reshape(S, stride)[:, :NP]

    # static per-advance bit costs: advance s = r+1; r = 0 is the
    # literal/chain slot (cost supplied per position)
    bits_static = [0] * K
    for s in range(minp, minp + 12):
        bits_static[s - 1] = int(HUFFMAN_LENGTHS[s - minp]) + window
    for s in range(minp + 12, maxpat + 1):
        v = s - minp - 12
        bits_static[s - 1] = (int(HUFFMAN_LENGTHS[13])
                              + int(HUFFMAN_LENGTHS[v >> 3]) - 1 + 3
                              + window)
    bits_vec = jnp.asarray(bits_static, jnp.int32)
    s_vec = jnp.arange(1, K + 1, dtype=jnp.int32)  # advance per slot r
    is_basic = (s_vec >= minp) & (s_vec <= minp + 11)
    is_ext = s_vec >= minp + 12

    def to_steps(x):  # (S, NP) -> (B, S, n_b), step k = offset B-1-k
        return x.reshape(S, n_b, B).transpose(2, 0, 1)[::-1]

    planes = (flen, room, bound, interior, cw, lc)
    steps = tuple(to_steps(p) for p in planes)

    r0 = s_vec == 1  # the literal/chain slot

    def cs_vec(xs):
        """(S, n_b, K) per-advance costs at one position."""
        f, r_, b_, t_, c_, l_ = xs
        f3 = f[:, :, None]
        r3 = r_[:, :, None]
        b3 = b_[:, :, None]
        valid = ((is_basic | is_ext) & (f3 >= s_vec) & (b3 >= s_vec)
                 & (~is_ext | (r3 >= s_vec)))
        cs = jnp.where(valid, bits_vec, INF)
        slot0 = jnp.where(t_ == 1, c_, l_)[:, :, None]
        cs = jnp.where(r0, slot0, cs)
        # interior positions: the chain edge is the only one
        cs = jnp.where((t_ == 1)[:, :, None] & ~r0, INF, cs)
        return cs

    # ---- pass 1: block transfer matrices, U positions per scan step ----
    eye = jnp.where(jnp.eye(K, dtype=jnp.int32) == 1, 0, INF)
    M0 = jnp.broadcast_to(eye, (S, n_b, K, K))
    gsteps = tuple(x.reshape(B // U, U, S, n_b) for x in steps)

    def step1(M, xs):
        new_rows = []
        for u in range(U):
            cs = cs_vec(tuple(x[u] for x in xs))
            # rows r < u are the fresh ones; rows r >= u live in M[r - u]
            termB = jnp.min(cs[:, :, u:, None] + M[:, :, : K - u, :],
                            axis=2)
            new = termB
            for r in range(u):
                new = jnp.minimum(
                    new, new_rows[u - 1 - r] + cs[:, :, r, None])
            new = jnp.minimum(new, INF)
            new_rows.append(new)
        M = jnp.concatenate(
            [jnp.stack(new_rows[::-1], axis=2), M[:, :, : K - U, :]],
            axis=2)
        return M, None

    T, _ = lax.scan(step1, M0, gsteps)

    # ---- combine: boundary vectors, right to left -----------------------
    def stepc(v, Tb):
        vin = v
        v = jnp.minimum(jnp.min(Tb + v[:, None, :], axis=2), INF)
        return v, vin

    v0, vins = lax.scan(stepc, jnp.zeros((S, K), jnp.int32),
                        T.transpose(1, 0, 2, 3)[::-1])
    bounds = vins[::-1].transpose(1, 0, 2)  # (S, n_b, K)

    # ---- pass 2: numeric costs + first-minimal-advance choice ------------
    ins_s = to_steps(in_shard.astype(jnp.int32))

    def step2(carry, xs):
        cur, bad = carry
        cs = cs_vec(tuple(xs[:6]))
        ins, itr = xs[6], xs[3]
        cost_all = jnp.minimum(cs + cur, INF)
        cost = jnp.min(cost_all, axis=2)
        choice = jnp.argmin(cost_all, axis=2).astype(jnp.int32) + 1
        bad = bad | ((ins == 1) & (itr == 0) & (cost >= INF))
        cur = jnp.concatenate([cost[:, :, None], cur[:, :, : K - 1]],
                              axis=2)
        return (cur, bad), choice

    (_, bad), ch = lax.scan(
        step2, (bounds, jnp.zeros((S, n_b), bool)), steps + (ins_s,))
    choice = ch[::-1].transpose(1, 2, 0).reshape(S, NP)
    return choice, v0[:, 0], bad.any(axis=1)
