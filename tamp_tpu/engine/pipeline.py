"""Device-accelerated encode pipeline: TPU match search + native commit.

The TPU computes the O(N*window) match tables (ops.match_pallas); the C++
committer (tamp_tpu._native) runs the O(N) greedy token walk and bit pack.
Only the tables the committer will actually read are computed on device
(cap-15 vs cap-16 by max-pattern, probe only under lazy matching).
"""

from __future__ import annotations

import functools

from ..constants import compute_min_pattern_size

__all__ = ["device_pipeline_available", "encode_device", "device_search_fn"]


def device_pipeline_available() -> bool:
    """TPU search + native commit both usable."""
    try:
        from .. import _native
        from ..ops.match_pallas import pallas_available

        return _native.available() and pallas_available()
    except Exception:
        return False


def device_search_fn(window: int, literal: int, extended: bool):
    """A ``search_fn(data, dict_arr, window_bits, compute_probe=...)``
    backed by the Pallas kernel, computing only the needed tables."""
    from ..ops.match_pallas import match_tables_pallas

    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + (131 if extended else 13)
    need = ("16",) if min(16, maxpat) == 16 else ("15",)

    def search(data, dict_arr, window_bits, compute_probe=False):
        return match_tables_pallas(
            data, dict_arr, window_bits,
            compute_probe=compute_probe, tables=need,
        )

    return search


def _pull_body_bytes(out, state):
    """d2h only the compressed bytes.

    ``out`` is the (S, max_out) uint8 device array from the commit kernel;
    most of it is padding (max_out ~ 1.13x the RAW size, output is ~0.45x).
    One device slice bounded by the batch's largest body, pow2-bucketed so
    a handful of slice programs serve any batch, is pulled instead of the
    whole buffer — the tunnel (~15 MB/s, ~30 ms/RPC) is the scarce
    resource.  Returns a list of per-shard uint8 arrays of exact length.
    """
    import numpy as np

    from ..ops.encode_commit_pallas import S_NBYTES

    nbs = [int(r[S_NBYTES]) for r in state]
    mx = max([1] + nbs)
    B = min(1 << (mx - 1).bit_length(), out.shape[1])
    blk = np.asarray(out[:, :B])
    return [blk[i, :nb] for i, nb in enumerate(nbs)]


def encode_v1_device_commit(
    shards,
    *,
    window: int = 10,
    literal: int = 8,
    lazy_matching: bool = False,
    dictionary: bytes | None = None,
    search_fn=None,
    interpret: bool | None = None,
    fused: bool | None = None,
) -> list[bytes]:
    """Fully on-chip v1 encode of a batch of shards.

    ``fused`` (default: whenever the compiled Pallas path is usable) runs
    search -> pack -> commit in ONE device call (ops/encode_fused.py): the
    raw shard bytes are the only h2d, the compressed bytes the only d2h.
    The non-fused path computes tables via ``search_fn`` (or the NumPy
    oracle) with a host round-trip — kept for differential testing and
    hosts without the compiled kernels.  Either way the Pallas
    stream-commit kernel (ops/encode_commit_pallas.py) runs the greedy
    token walk + bit pack on the scalar core; the host only prepends the
    header and finishes each shard's final < 16 bytes with the
    parity-proven Python committer (the table cap cannot reproduce the
    reference's shrinking tail search tie-breaks).  Output is
    byte-identical to ``encode_v1`` / the reference encoder.
    """
    import numpy as np

    from ..constants import compute_min_pattern_size
    from ..exceptions import ExcessBitsError
    from ..ops.encode_commit_pallas import (
        S_ACC, S_AN, S_CIDX, S_CSZ, S_ERR, S_NBYTES, S_T, TILE,
        encode_commit_available, encode_commit_batch,
    )
    from ..constants import HUFFMAN_CODES, HUFFMAN_LENGTHS
    from .commit import ring_find_longest, ring_model_snapshot
    from .encode import build_header, model_history
    from .search_np import match_tables

    if interpret is None:
        interpret = not encode_commit_available()
    if fused is None:
        fused = not interpret
    W = 1 << window
    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + 13
    cap = min(16, maxpat)
    lit_flag = 1 << literal
    lit_limit = 256 if literal == 8 else lit_flag

    datas = [np.frombuffer(bytes(b), dtype=np.uint8) for b in shards]
    S = len(datas)
    if S == 0:
        return []
    maxN = max(d.shape[0] for d in datas)
    NP = 1 << (max(maxN, TILE, 1) - 1).bit_length()  # pow2 ceiling, TILE-aligned

    npos = np.zeros(S, np.int32)
    for i, data in enumerate(datas):
        npos[i] = data.shape[0]

    import jax.numpy as jnp

    max_out = NP + NP // 8 + 64
    if fused:
        from ..dictionary import dictionary_array
        from ..ops.encode_fused import SEARCH_T, encode_v1_fused_dev

        T = SEARCH_T if NP % SEARCH_T == 0 else TILE
        if dictionary is not None:
            dict_np = np.frombuffer(bytes(dictionary), np.uint8)
            if dict_np.shape[0] != W:
                raise ValueError("Dictionary-window size mismatch.")
        else:
            dict_np = dictionary_array(W, literal=8)
        dict_dev = jnp.asarray(dict_np.astype(np.int32))

        # Pipeline the batch in (at most) two device calls: the tunnel's
        # h2d RPC for the second group flies while the first group's
        # kernels run, and JAX's async dispatch queues the second group's
        # compute behind it.  More groups would pay ~30 ms of fixed RPC
        # latency each (tools/transfer_probe.py) for no extra overlap.
        groups = [list(range(S))]
        if S >= 4:
            h = (S + 1) // 2
            groups = [list(range(h)), list(range(h, S))]
        handles = []
        for g in groups:
            batch = np.zeros((len(g), NP), np.uint8)
            for k, i in enumerate(g):
                batch[k, : datas[i].shape[0]] = datas[i]
            handles.append(encode_v1_fused_dev(
                jnp.asarray(batch), jnp.asarray(npos[g]), dict_dev,
                window=window, literal=literal, lazy=lazy_matching, NP=NP,
                T=T, cap=cap, max_out=max_out, interpret=interpret))

        # Host model histories (tail-stitch inputs) overlap device compute.
        histories = [
            model_history(d, window, literal, False, dictionary)[1]
            for d in datas]
        if len(handles) == 1:
            out, state = handles[0]
        else:
            outs = [h[0] for h in handles]
            out = jnp.concatenate(outs, axis=0)
            state = jnp.concatenate([h[1] for h in handles], axis=0)
    else:
        histories = [
            model_history(d, window, literal, False, dictionary)[1]
            for d in datas]
        searcher = search_fn or match_tables
        packed = np.zeros((S, NP), np.int32)
        probe = np.zeros((S, NP), np.int32)
        for i, data in enumerate(datas):
            if data.shape[0] == 0:
                continue
            dict_arr = histories[i][: 1 << window]
            tables = searcher(
                data, dict_arr, window, compute_probe=lazy_matching)
            flen, fidx = ((tables.len16, tables.idx16) if cap == 16
                          else (tables.len15, tables.idx15))
            n = data.shape[0]
            packed[i, :n] = (
                (flen[:n].astype(np.int32) << 23)
                | (fidx[:n].astype(np.int32) << 8)
                | data.astype(np.int32))
            if lazy_matching:
                probe[i, :n] = (
                    (tables.probe_len[:n].astype(np.int32) << 15)
                    | tables.probe_idx[:n].astype(np.int32))
        out, state = encode_commit_batch(
            jnp.asarray(packed), jnp.asarray(probe), jnp.asarray(npos),
            NP=NP, window=window, literal=literal, lazy=lazy_matching,
            max_out=max_out, interpret=interpret)
    state = np.asarray(state)
    out = _pull_body_bytes(out, state)

    results: list[bytes] = []
    for i, data in enumerate(datas):
        st = state[i]
        if st[S_ERR] != 0:
            raise ExcessBitsError
        N = int(npos[i])
        body = out[i].tobytes()
        t = int(st[S_T])
        acc = int(st[S_ACC])
        an = int(st[S_AN])
        cached = None
        if lazy_matching and int(st[S_CIDX]) >= 0:
            cached = (int(st[S_CIDX]), int(st[S_CSZ]))

        # host tail: the reference's shrinking ring search for the last
        # < 16 bytes (mirrors commit_v1's non-steady branch exactly)
        fields: list[tuple[int, int]] = []
        if t < N:
            ring = ring_model_snapshot(histories[i], t, window)
            tau_ring = t % W
            while t < N:
                rem = N - t
                if lazy_matching and cached is not None:
                    idx, size = cached
                    cached = None
                else:
                    idx, size = ring_find_longest(
                        ring, data[t : t + rem], minp, min(rem, maxpat))
                pending = rem if rem < 16 else 16
                if lazy_matching and minp <= size <= 8 and pending > size + 2:
                    pix, psize = ring_find_longest(
                        ring, data[t + 1 : t + rem], minp,
                        min(rem - 1, maxpat))
                    tau = t % W
                    if psize > size and not (pix <= tau < pix + psize):
                        b = int(data[t])
                        if b >= lit_limit:
                            raise ExcessBitsError
                        fields.append((lit_flag | b, literal + 1))
                        ring[tau_ring] = b
                        tau_ring = (tau_ring + 1) % W
                        cached = (pix, psize)
                        t += 1
                        continue
                if size >= minp:
                    sym = size - minp
                    fields.append((
                        (int(HUFFMAN_CODES[sym]) << window) | idx,
                        int(HUFFMAN_LENGTHS[sym]) + window))
                    for k in range(size):
                        ring[tau_ring] = data[t + k]
                        tau_ring = (tau_ring + 1) % W
                    t += size
                else:
                    b = int(data[t])
                    if b >= lit_limit:
                        raise ExcessBitsError
                    fields.append((lit_flag | b, literal + 1))
                    ring[tau_ring] = b
                    tau_ring = (tau_ring + 1) % W
                    t += 1

        # stitch: kernel bit remainder + tail fields + zero pad
        tail = bytearray()
        for v, nb in fields:
            acc = (acc << nb) | v
            an += nb
        while an >= 8:  # the fields kernel's remainder can be up to 31 bits
            tail.append((acc >> (an - 8)) & 0xFF)
            an -= 8
            acc &= (1 << an) - 1
        if an:
            tail.append((acc << (8 - an)) & 0xFF)

        (hv, hn), = build_header(
            window, literal, dictionary is not None, False, False)
        assert hn == 8
        results.append(bytes([hv]) + body + bytes(tail))
    return results


def _opt_v1_stage_impl(data, npos, dict_arr, *, window: int, literal: int,
                       NP: int, T: int, cap: int, max_out: int,
                       interpret: bool = False):
    """Fully on-chip OPTIMAL v1 encode stage: Pallas match search ->
    blocked min-plus DP (ops/opt_parse) -> field build -> planned-fields
    commit kernel, in ONE jitted graph.  Unlike the greedy walk, the
    optimal fields are exact at every position (no 16-byte-lookahead
    semantics), so the commit kernel walks to the very end: ``npos + 15``
    moves its tail stop past the stream and no host tail walk exists —
    the host only prepends the header and appends the bit remainder."""
    import jax.numpy as jnp

    from ..constants import (
        HUFFMAN_CODES, HUFFMAN_LENGTHS, compute_min_pattern_size,
    )
    from ..engine.search_np import LMAX
    from ..ops.encode_commit_pallas import _commit_fields_batch
    from ..ops.match_pallas import _search_pallas
    from ..ops.opt_parse import opt_v1_choice_device

    S = data.shape[0]
    W = 1 << window
    minp = compute_min_pattern_size(window, literal)
    lit_flag = 1 << literal
    lit_limit = 256 if literal == 8 else lit_flag
    Qseg = -(-(T + W + 2 * LMAX) // 128) * 128
    n_chunks = NP // T

    di = data.astype(jnp.int32)
    in_shard = jnp.arange(NP, dtype=jnp.int32)[None, :] < npos[:, None]
    C2 = jnp.concatenate(
        [jnp.broadcast_to(dict_arr[None, :].astype(jnp.int32), (S, W)),
         jnp.where(in_shard, di, -1), jnp.full((S, Qseg), -1, jnp.int32)],
        axis=1)
    d2 = jnp.concatenate(
        [jnp.where(in_shard, di, 0x1FF),
         jnp.full((S, Qseg), 0x1FF, jnp.int32)], axis=1)
    base = jnp.zeros((S,), jnp.int32)
    flen, fidx = _search_pallas(
        C2, d2, base, window, T, ("16",) if cap == 16 else ("15",),
        n_chunks, interpret)[:2]

    choice, cost0, bad = opt_v1_choice_device(
        flen, data, npos, window=window, literal=literal, NP=NP)
    # fold the any-position-unencodable flag into cost0 (native parity:
    # tampn_opt_v1_plan raises even for positions the walk never visits)
    cost0 = jnp.where(bad, jnp.int32(0x7FFFFFF), cost0)

    # ---- fields (same packing as ops/plan_ext, v1 symbol set) ----------
    is_lit = choice == 1
    sym = jnp.clip(choice - minp, 0, 13)
    hsel = jnp.zeros_like(di)
    for sy in range(14):
        code = ((int(HUFFMAN_CODES[sy]) << window)
                | (int(HUFFMAN_LENGTHS[sy]) + window) << 25)
        hsel = jnp.where(sym == sy, code, hsel)
    A = jnp.where(is_lit, lit_flag | di, (hsel & 0x1FFFFFF) | fidx)
    nb = jnp.where(is_lit, literal + 1, (hsel >> 25) & 31)
    err = is_lit & (di >= lit_limit) & in_shard
    adv = choice
    # fuse literal pairs (halves the walk's literal steps); never fuse
    # across the shard end — the padded free-literal positions are not
    # real tokens
    nxt_lit = jnp.roll(is_lit, -1, axis=1).at[:, -1].set(False)
    nxt_in = jnp.roll(in_shard, -1, axis=1).at[:, -1].set(False)
    A2 = jnp.roll(A, -1, axis=1)
    e2 = jnp.roll(err, -1, axis=1)
    pair = is_lit & nxt_lit & nxt_in
    nbl = literal + 1
    A = jnp.where(pair, (A << nbl) | A2, A)
    nb = jnp.where(pair, 2 * nbl, nb)
    adv = jnp.where(pair, 2, adv)
    err = jnp.where(pair, err | e2, err)
    B = nb | (adv << 6) | (err.astype(jnp.int32) << 14)

    out, state = _commit_fields_batch(
        A, B, npos + 15, NP=NP, dual=True, max_out=max_out, idx_bits=0,
        interpret=interpret)
    return out, state, cost0


@functools.lru_cache(maxsize=1)
def _opt_v1_stage():
    import jax

    return jax.jit(
        _opt_v1_stage_impl,
        static_argnames=("window", "literal", "NP", "T", "cap", "max_out",
                         "interpret"))


def encode_v1_device_optimal(
    shards,
    *,
    window: int = 10,
    literal: int = 8,
    dictionary: bytes | None = None,
    interpret: bool | None = None,
) -> list[bytes]:
    """Fully on-chip OPTIMAL (minimum-bit) v1 encode of a batch of shards.

    The minimum-bit parse is the repo's beyond-reference ratio edge
    (-1.8% vs greedy on text; the reference has no optimal parser); this
    pipeline moves its whole hot path onto the TPU: Pallas match search,
    the blocked min-plus DP (ops/opt_parse.py — the host DP is a strictly
    sequential ~60 ms/MB scan; the device formulation runs ~2 ms/MB), and
    the planned-fields commit kernel.  Output is byte-identical to
    ``encode_v1(parse="optimal")`` and decodes in every Tamp
    implementation.
    """
    import numpy as np

    from ..dictionary import dictionary_array
    from ..exceptions import ExcessBitsError
    from ..ops.encode_commit_pallas import (
        S_ACC, S_AN, S_ERR, TILE, encode_commit_available,
    )
    from .encode import build_header

    if interpret is None:
        interpret = not encode_commit_available()
    W = 1 << window
    minp = compute_min_pattern_size(window, literal)
    cap = min(16, minp + 13)
    if dictionary is not None:
        dict_np = np.frombuffer(bytes(dictionary), np.uint8)
        if dict_np.shape[0] != W:
            raise ValueError("Dictionary-window size mismatch.")
    else:
        dict_np = dictionary_array(W, literal=8)

    datas = [np.frombuffer(bytes(b), dtype=np.uint8) for b in shards]
    S = len(datas)
    if S == 0:
        return []
    maxN = max(d.shape[0] for d in datas)
    NP = 1 << (max(maxN, TILE, 1) - 1).bit_length()
    npos = np.asarray([d.shape[0] for d in datas], np.int32)
    max_out = NP + NP // 8 + 64

    import jax.numpy as jnp

    from ..ops.encode_fused import SEARCH_T

    T = SEARCH_T if NP % SEARCH_T == 0 else TILE
    dict_dev = jnp.asarray(dict_np.astype(np.int32))
    stage = _opt_v1_stage()
    groups = [list(range(S))]
    if S >= 4:
        h = (S + 1) // 2
        groups = [list(range(h)), list(range(h, S))]
    handles = []
    for g in groups:
        batch = np.zeros((len(g), NP), np.uint8)
        for k, i in enumerate(g):
            batch[k, : datas[i].shape[0]] = datas[i]
        handles.append(stage(
            jnp.asarray(batch), jnp.asarray(npos[g]), dict_dev,
            window=window, literal=literal, NP=NP, T=T, cap=cap,
            max_out=max_out, interpret=interpret))
    if len(handles) == 1:
        out, state, cost0 = handles[0]
    else:
        out = jnp.concatenate([h[0] for h in handles], axis=0)
        state = jnp.concatenate([h[1] for h in handles], axis=0)
        cost0 = jnp.concatenate([h[2] for h in handles], axis=0)

    state = np.asarray(state)
    cost0 = np.asarray(cost0)
    bodies = _pull_body_bytes(out, state)

    from ..ops.opt_parse import INF

    results: list[bytes] = []
    for i in range(S):
        st = state[i]
        if st[S_ERR] != 0 or cost0[i] >= INF:
            raise ExcessBitsError
        acc, an = int(st[S_ACC]), int(st[S_AN])
        tail = bytearray()
        while an >= 8:
            tail.append((acc >> (an - 8)) & 0xFF)
            an -= 8
            acc &= (1 << an) - 1
        if an:
            tail.append((acc << (8 - an)) & 0xFF)
        (hv, hn), = build_header(
            window, literal, dictionary is not None, False, False)
        assert hn == 8
        results.append(bytes([hv]) + bodies[i].tobytes() + bytes(tail))
    return results


def encode_device(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    lazy_matching: bool = False,
    dictionary=None,
) -> bytes:
    """One-shot encode through the TPU search + native commit pipeline."""
    search = device_search_fn(window, literal, extended)
    if extended:
        from .encode_extended import encode_extended

        return encode_extended(
            data, window=window, literal=literal, lazy_matching=lazy_matching,
            dictionary=dictionary, search_fn=search,
        )
    from .encode import encode_v1

    return encode_v1(
        data, window=window, literal=literal, lazy_matching=lazy_matching,
        dictionary=dictionary, search_fn=search,
    )
