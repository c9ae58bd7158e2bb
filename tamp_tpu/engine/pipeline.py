"""Device-accelerated encode pipeline: TPU match search + native commit.

The TPU computes the O(N*window) match tables (ops.match_pallas); the C++
committer (tamp_tpu._native) runs the O(N) greedy token walk and bit pack.
Only the tables the committer will actually read are computed on device
(cap-15 vs cap-16 by max-pattern, probe only under lazy matching).
"""

from __future__ import annotations

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
