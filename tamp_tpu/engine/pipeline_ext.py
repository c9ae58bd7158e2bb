"""On-chip EXTENDED-format encode: planned model + Pallas field commit.

Pipeline (mirrors engine/pipeline.encode_v1_device_commit for the extended
format, reference default config):

  1. host: run plan + exact ring-aware model history (engine/plan.py) —
     the true ring never diverges from C-hat, so every walk decision is a
     pure function of position;
  2. match tables on the model stream: cap-16 (first-search) and
     cap-maxpat (one-shot extended search) — engine/search_np oracles or
     the Pallas kernel via ``search_fn``;
  3. VPU field planning (ops/plan_ext.py) + the Pallas planned-fields
     commit kernel (ops/encode_commit_pallas, dual mode);
  4. host: the final < 16 model bytes finished by the native planned
     committer itself (_native.native_ext_tail_bits resumes the walk
     mid-stream and returns the tail bytes with the kernel's bit
     remainder stitched in) — ONE owner for the planned-mode semantics.

Byte parity contract: output equals the native committer at
``force_planned=True, avoid_divergence=True`` exactly
(tests/test_encode_ext_device.py), and therefore decodes in every Tamp
implementation.  Reference anchor for the format semantics:
BrianPugh/tamp tamp/_c_src/tamp/compressor.c:437-525 (RLE/extended state
machines); the planned-mode tokenization itself is this project's design.
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import compute_min_pattern_size
from .plan import RLE_MAX

__all__ = ["encode_ext_device_commit", "encode_ext_device_greedy",
           "encode_ext_device_optimal"]


def _ext_device_stage_impl(dh_u8, rc_a, rc_b, npos, dict_arr, *,
                           window: int, literal: int, dlast: int,
                           lazy: bool, pallas_tables: bool,
                           sparse_rc: bool, NP: int,
                           interpret: bool = False):
    """Whole on-device half of the extended encode in ONE jitted graph:
    sentinelize -> region arrays -> match tables -> field planner ->
    Pallas commit.  The raw dh byte plane (plus the sparse chunk-count
    sideband) is the only h2d; the packed output buffer and the commit
    state are the only outputs.

    ``sparse_rc``: the forced-RLE chunk-count stream is ~0.3% dense on
    text, so it ships as (position, count) pairs — ``rc_a``/``rc_b``
    (S, K) int32 with DISTINCT positions NP + k on padding entries (so
    every flat index really is unique and ``unique_indices=True`` is
    honest; the padding zone [NP, NP + K) is sliced off) — and expands
    on device with ONE flat 1D scatter (compiles in seconds; the
    round-2 stall was specific to scatter-inside-vmap).  This halves
    the h2d bytes, which bound the e2e rate through this environment's
    tunnel.  Dense fallback (``rc_a`` = (S, NP) uint8 plane) for
    run-heavy data where the pair list would rival the plane."""
    import jax.numpy as jnp

    from ..ops.encode_commit_pallas import _commit_fields_batch
    from ..ops.plan_ext import (
        SPLIT_WINDOW, _plan_fields_ext_impl, derive_region_arrays,
    )

    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + 131
    S = dh_u8.shape[0]
    if sparse_rc:
        stride = NP + rc_a.shape[1]
        flat = (jnp.arange(S, dtype=jnp.int32)[:, None] * stride
                + rc_a).reshape(-1)
        z = jnp.zeros(S * stride, jnp.int32)
        z = z.at[flat].set(rc_b.reshape(-1), mode="drop",
                           unique_indices=True)
        rc = z.reshape(S, stride)[:, :NP]
    else:
        rc = rc_a.astype(jnp.int32)
    bound, rk = derive_region_arrays(rc, window=window)
    col = jnp.arange(NP, dtype=jnp.int32)[None, :]
    dh_sent = jnp.where(col < npos[:, None],
                        dh_u8.astype(jnp.int32), 0x1FF)
    plen = pidx = None
    if pallas_tables:
        from ..ops.match_ext_pallas import ext_tables_pallas

        # bigger chunks amortize the R slack lanes (R - T is W-independent,
        # and the swar kernel's word-lane slack rounds to 128 words): the
        # non-lazy path runs the swar kernel at T=2048 everywhere; lazy
        # (probe family, byte kernel) keeps the better-pipelining unrolled
        # T=1024 form below w12
        ST = 2048 if ((window >= 12 or not lazy) and NP % 2048 == 0) \
            else 1024
        tabs = ext_tables_pallas(
            dh_u8, npos, dict_arr, window_bits=window, LEXT=maxpat,
            T=ST, n_chunks=NP // ST, probe=lazy)
        if lazy:
            l16, i16, lx, ix, plen, pidx = tabs
        else:
            l16, i16, lx, ix = tabs
    else:
        from ..ops.match_ext_mxu import ext_tables_device

        tabs = ext_tables_device(
            dh_u8, npos, dict_arr, window_bits=window, LEXT=maxpat,
            T=256, n_chunks=NP // 256, probe=lazy)
        if lazy:
            l16, i16, lx, ix, plen, pidx = tabs
        else:
            l16, i16, lx, ix = tabs
    A, B = _plan_fields_ext_impl(
        dh_sent, l16, i16, lx, ix, bound, rc, rk,
        window=window, literal=literal, dlast=dlast,
        plen=plen, pidx=pidx, lazy=lazy)
    max_out = NP + NP // 8 + 64
    return _commit_fields_batch(
        A, B, npos, NP=NP, dual=True, max_out=max_out,
        idx_bits=window if window >= SPLIT_WINDOW else 0,
        interpret=interpret)


@functools.lru_cache(maxsize=1)
def _ext_device_stage():
    import jax

    return jax.jit(
        _ext_device_stage_impl,
        static_argnames=("window", "literal", "dlast", "lazy",
                         "pallas_tables", "sparse_rc", "NP", "interpret"))


def _greedy_tables_stage():
    import jax

    def impl(dh_u8, npos, dict_arr, *, window: int, lazy: bool, NP: int,
             narrow: bool, T: int = 1024, interpret: bool = False):
        """Cap-16 (+probe) tables on the RAW input history, bit-packed for
        the d2h pull: len16 | idx16 << 5 (and plen | pidx << 4), int16 when
        window <= 10 (15/14 bits suffice), int32 otherwise."""
        import jax.numpy as jnp

        from ..ops.match_ext_pallas import ext_tables_pallas

        tabs = ext_tables_pallas(
            dh_u8, npos, dict_arr, window_bits=window, LEXT=16,
            T=T, n_chunks=NP // T, probe=lazy, interpret=interpret,
            families="f16")
        dt = jnp.int16 if narrow else jnp.int32
        out = [(tabs[0] | (tabs[1] << 5)).astype(dt)]
        if lazy:
            out.append((tabs[2] | (tabs[3] << 4)).astype(dt))
        return tuple(out)

    return jax.jit(impl, static_argnames=("window", "lazy", "NP", "narrow",
                                          "T", "interpret"))


_greedy_tables_stage = functools.lru_cache(maxsize=1)(_greedy_tables_stage)


def _greedy_sparse_stage():
    import jax

    def impl(dh_u8, npos, dict_arr, *, window: int, literal: int,
             dlast: int, lazy: bool, NP: int, T: int = 1024,
             interpret: bool = False):
        """Speculative-pull device half of the greedy-parity mode: cap-16
        (+probe) tables -> packed walker plane -> scalar-core speculative
        walk (ops/greedy_predict_pallas).  Returns (bitmap, entries,
        state); the host pulls the bitmap (1 bit/position), popcounts it,
        and pulls exactly the predicted token-start entries (~0.2-0.7
        B/input byte on text) instead of the dense 2-4 B/byte plane."""
        import jax.numpy as jnp

        from ..ops.greedy_predict_pallas import (
            greedy_predict_batch, pack_predict_plane,
        )
        from ..ops.match_ext_pallas import ext_tables_pallas

        tabs = ext_tables_pallas(
            dh_u8, npos, dict_arr, window_bits=window, LEXT=16,
            T=T, n_chunks=NP // T, probe=lazy, interpret=interpret,
            families="f16")
        pk = pack_predict_plane(
            dh_u8.astype(jnp.int32), npos, tabs[0], tabs[1],
            dlast=dlast, NP=NP)
        pp = ((tabs[3] & 0x7FFF) | ((tabs[2] & 15) << 15)) if lazy else pk
        return greedy_predict_batch(
            pk, pp, npos, NP=NP, window=window, literal=literal,
            lazy=lazy, interpret=interpret)

    return jax.jit(impl, static_argnames=("window", "literal", "dlast",
                                          "lazy", "NP", "T", "interpret"))


_greedy_sparse_stage = functools.lru_cache(maxsize=1)(_greedy_sparse_stage)


def encode_ext_device_greedy(
    shards,
    *,
    window: int = 10,
    literal: int = 8,
    lazy_matching: bool = False,
    dictionary: bytes | None = None,
    device_tables: bool | None = None,
    interpret: bool = False,
    pull: str = "auto",
) -> list[bytes]:
    """REFERENCE-GREEDY extended encode with the match search on the TPU.

    Hybrid pipeline: the band-space Pallas kernel computes the cap-16
    (+probe) tables against the raw input history — the O(N*W) work — and
    the native committer runs the reference's greedy walk over them in
    exact-table mode (post-divergence the table candidate seeds the exact
    chain search), so the output is **byte-identical to the reference
    encoder** at equal settings, growth loop, mid-match relocation, lazy
    cache semantics and all (reference anchor:
    BrianPugh/tamp tamp/compressor.py:281-447, compressor.c:437-660).

    This is the byte-parity complement of :func:`encode_ext_device_commit`
    (fully on-chip, planned tokenization): the sequential walk is
    inherently serial and stays on the host, the search does not.

    ``pull`` selects the device->host table transfer strategy:

    - ``"sparse"`` (the ``"auto"`` default with device tables): the
      scalar core runs a speculative replay of the reference walk over
      the packed tables (ops/greedy_predict_pallas) and the host pulls a
      1-bit/position start bitmap plus the packed entries at predicted
      token starts only.  Missing entries (mispredictions, post-
      divergence drift) fall back to the committer's exact chain search
      — byte parity never depends on the prediction, only the pull
      volume and host CPU do.
    - ``"dense"``: the round-4 path — the full packed plane at 2 B/byte
      (window <= 10; 4 B/byte above, doubled by lazy).
    """
    import numpy as np

    from .. import _native
    from ..dictionary import dictionary_array
    from ..engine.search_np import MatchTables

    if not _native.available():
        raise RuntimeError(
            f"greedy device encode needs the native engine "
            f"({_native.load_error()})")
    if pull not in ("auto", "sparse", "dense"):
        raise ValueError("pull must be 'auto', 'sparse' or 'dense'")
    W = 1 << window
    compute_min_pattern_size(window, literal)
    if dictionary is not None:
        dict_arr = np.frombuffer(bytes(dictionary), np.uint8)
        if dict_arr.shape[0] != W:
            raise ValueError("Dictionary-window size mismatch.")
    else:
        dict_arr = dictionary_array(W, literal=literal)
    dict_bytes = dict_arr.tobytes()

    datas = [np.frombuffer(bytes(b), dtype=np.uint8) for b in shards]
    S = len(datas)
    if S == 0:
        return []
    if device_tables is None:
        from ..ops.match_ext_pallas import ext_pallas_available

        device_tables = ext_pallas_available()
    sparse = pull != "dense"

    packed = [None] * S
    holes = [None] * S

    def commit(i: int) -> bytes:
        data = datas[i]
        n = data.shape[0]
        if holes[i] is not None:
            bits, ent, ne = holes[i]
            starts = np.flatnonzero(bits[:n])
            k = starts.shape[0]
            flen = np.full(n, 0xFF, np.uint8)
            fidx = np.zeros(n, np.int32)
            if lazy_matching:
                main = ent[0: 2 * k: 2]
                pq = ent[1: 2 * k: 2]
            else:
                main = ent[:k]
            flen[starts] = ((main >> 15) & 31).astype(np.uint8)
            fidx[starts] = (main & 0x7FFF).astype(np.int32)
            if lazy_matching:
                pl_ = np.full(n, 0xFF, np.uint8)
                pi_ = np.zeros(n, np.int32)
                pl_[starts] = ((pq >> 15) & 15).astype(np.uint8)
                pi_[starts] = (pq & 0x7FFF).astype(np.int32)
            else:
                pl_ = pi_ = None
        elif packed[i] is not None:
            main = packed[i][0][:n]
            flen = (main & 31).astype(np.uint8)
            fidx = (main >> 5).astype(np.int32)
            if lazy_matching:
                pr = packed[i][1][:n]
                pl_ = (pr & 15).astype(np.uint8)
                pi_ = (pr >> 4).astype(np.int32)
            else:
                pl_ = pi_ = None
        elif lazy_matching:
            flen, fidx, pl_, pi_ = _native.native_v1_tables(
                data, window, literal, 16, dictionary=dict_bytes, probe=True)
        else:
            flen, fidx = _native.native_v1_tables(
                data, window, literal, 16, dictionary=dict_bytes)
            pl_ = pi_ = None
        tabs = MatchTables(flen, fidx, flen, fidx, pl_, pi_)
        return _native.native_compress(
            data.tobytes(), window=window, literal=literal, extended=True,
            lazy_matching=lazy_matching,
            dictionary=None if dictionary is None else dict_bytes,
            tables=tabs, exact_tables=True)

    if device_tables:
        import jax.numpy as jnp

        T = 128 if interpret else 1024
        maxN = max(d.shape[0] for d in datas)
        MP = 1 << max(T.bit_length() - 1,
                      (max(maxN, 1) - 1).bit_length())
        if sparse:
            MP = max(MP, 4096)  # walker bitmap DMAs 128-word chunks
        npos = np.asarray([d.shape[0] for d in datas], np.int32)
        dh_u8 = np.zeros((S, MP), np.uint8)
        for i, d in enumerate(datas):
            dh_u8[i, : d.shape[0]] = d
        narrow = window <= 10
        dict_d = jnp.asarray(dict_arr.astype(np.int32))
        groups = [list(range(S))]
        if S >= 4:
            h = (S + 1) // 2
            groups = [list(range(h)), list(range(h, S))]
        if sparse:
            stage = _greedy_sparse_stage()
            handles = [
                stage(jnp.asarray(dh_u8[g]), jnp.asarray(npos[g]), dict_d,
                      window=window, literal=literal,
                      dlast=int(dict_arr[-1]), lazy=lazy_matching, NP=MP,
                      T=T, interpret=interpret)
                for g in groups
            ]
            mult = 2 if lazy_matching else 1
            from concurrent.futures import ThreadPoolExecutor

            import os as _os

            # Commits start the moment their group's pull lands: the
            # native walk (GIL-released) for group 1 overlaps group 2's
            # d2h RPCs instead of waiting for the whole batch.
            with ThreadPoolExecutor(
                    max_workers=_os.cpu_count() or 4) as ex:
                futs = {}
                for g, h in zip(groups, handles):
                    bm, ent, _st = h
                    bm_host = np.asarray(bm)
                    bits = np.unpackbits(
                        bm_host.view(np.uint8), axis=1, bitorder="little")
                    ne = bits.sum(axis=1, dtype=np.int64)
                    kmax = int(ne.max()) * mult if len(g) else 0
                    K = 1 << max(9, (max(kmax, 1) - 1).bit_length())
                    K = min(K, int(ent.shape[1]))
                    ent_host = np.asarray(ent[:, :K])
                    for j, i in enumerate(g):
                        holes[i] = (bits[j], ent_host[j], int(ne[j]))
                        futs[i] = ex.submit(lambda i=i: commit(i))
                return [futs[i].result() for i in range(S)]
        else:
            stage = _greedy_tables_stage()
            handles = [
                stage(jnp.asarray(dh_u8[g]), jnp.asarray(npos[g]), dict_d,
                      window=window, lazy=lazy_matching, NP=MP,
                      narrow=narrow, T=T, interpret=interpret)
                for g in groups
            ]
            for g, h in zip(groups, handles):
                planes = [np.asarray(p).astype(np.int32) for p in h]
                for j, i in enumerate(g):
                    packed[i] = [p[j] for p in planes]

    if S > 1:
        from concurrent.futures import ThreadPoolExecutor

        import os as _os

        with ThreadPoolExecutor(max_workers=_os.cpu_count() or 4) as ex:
            return list(ex.map(commit, range(S)))
    return [commit(0)]


def _chunk_counts(plans, khat, M: int):
    """Model-space chunk-count stream for the planner.

    ``rc[mp]`` = the forced-RLE chunk's input run count (2..241) at the
    chunk's model start, 0 elsewhere.  This is the ONLY region plane the
    device needs: ``bound`` and ``rle_k`` are pure functions of it
    (ops/plan_ext.derive_region_arrays), so the host link carries one byte
    per position instead of three.
    """
    rle_c = np.zeros(M, np.int32)
    for s, e in plans:
        t = int(s)
        while t < e:
            remn = int(e - t)
            c = remn if remn < RLE_MAX else RLE_MAX
            if remn - c == 1:
                c -= 1
            rle_c[int(khat[t])] = c
            t += c
    return rle_c


def encode_ext_device_commit(
    shards,
    *,
    window: int = 10,
    literal: int = 8,
    lazy_matching: bool = False,
    dictionary: bytes | None = None,
    search_fn=None,
    interpret: bool | None = None,
    device_tables: bool | None = None,
) -> list[bytes]:
    """Fully on-chip extended-format encode of a batch of shards.

    Output is byte-identical to the native planned committer
    (``force_planned=True, avoid_divergence=True`` — plus
    ``lazy_matching``) — a valid extended Tamp stream every decoder
    accepts.  The full window lattice (8..15) is supported: windows >= 14
    split the >31-bit extended field into two kernel pushes (ops/plan_ext
    module docstring).  Lazy matching runs as a planner-side deferral
    (ops/plan_ext.plan_fields_ext ``lazy``): in planned mode the cached
    match always equals the fresh search at the next position, so the
    deferral needs no walk state.

    ``device_tables`` (default: whenever the compiled kernels are usable)
    computes BOTH match-table families on device (ops/match_ext_mxu) and
    keeps them there for the planner, so the host link carries only the raw
    model-history bytes in and compressed bytes out — the alternative (host
    tables) ships 4 int32 tables per position across the link and dominates
    the wall time.  The host-table fallback prefers the native chain engine
    (the NumPy oracles are the semantic reference but ~100x slower).
    """
    import jax.numpy as jnp

    from ..dictionary import dictionary_array
    from ..exceptions import ExcessBitsError
    from ..ops.encode_commit_pallas import (
        S_ACC, S_AN, S_ERR, S_NBYTES, S_T, TILE, _commit_fields_batch,
        encode_commit_available,
    )
    from ..ops.plan_ext import (
        MAX_PLAN_WINDOW, derive_region_arrays, plan_fields_ext,
    )
    from .encode import build_header
    from .search_np import match_tables, match_tables_ext

    if window > MAX_PLAN_WINDOW:
        raise ValueError(
            f"device extended encode supports window <= {MAX_PLAN_WINDOW}")
    if interpret is None:
        interpret = not encode_commit_available()
    if device_tables is None:
        device_tables = not interpret
    W = 1 << window
    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + 131
    if dictionary is not None:
        dict_arr = np.frombuffer(bytes(dictionary), np.uint8)
        if dict_arr.shape[0] != W:
            raise ValueError("Dictionary-window size mismatch.")
    else:
        dict_arr = dictionary_array(W, literal=literal)
    dlast = int(dict_arr[-1])

    datas = [np.frombuffer(bytes(b), dtype=np.uint8) for b in shards]
    S = len(datas)
    if S == 0:
        return []

    from .. import _native

    searcher = search_fn or match_tables
    have_native = _native.available()
    if not have_native:
        raise RuntimeError(
            "device extended encode needs the native engine for the tail "
            f"walk (build failed: {_native.load_error()})")
    dict_bytes = dict_arr.tobytes()

    def prep_one(data):
        # one native pass (plans + ring-aware khat + model stream + chunk
        # counts); engine/plan.py is the semantic reference, differential-
        # tested — the NumPy path costs ~56 ms/MB, the native one ~3
        plans, khat, dh, rle_c = _native.native_ext_prep(data, window)
        if device_tables:
            tabs = None  # computed in one batched device call below
        elif have_native:
            if lazy_matching:
                l16, i16, pl_, pi_ = _native.native_v1_tables(
                    dh, window, literal, 16, dictionary=dict_bytes,
                    probe=True)
            else:
                l16, i16 = _native.native_v1_tables(
                    dh, window, literal, 16, dictionary=dict_bytes)
                pl_ = pi_ = np.zeros(0, np.int32)
            lx8, ix = _native.native_v1_tables(
                dh, window, literal, maxpat, dictionary=dict_bytes)
            tabs = (np.asarray(l16, np.int32), i16, lx8.astype(np.int32), ix,
                    np.asarray(pl_, np.int32), np.asarray(pi_, np.int32))
        else:
            t16 = searcher(dh, dict_arr, window, compute_probe=lazy_matching)
            lx, ix = match_tables_ext(dh, dict_arr, window, maxpat)
            if lazy_matching:
                pl_ = np.asarray(t16.probe_len, np.int32)
                pi_ = np.asarray(t16.probe_idx, np.int32)
            else:
                pl_ = pi_ = np.zeros(0, np.int32)
            tabs = (np.asarray(t16.len16, np.int32),
                    np.asarray(t16.idx16, np.int32), lx, ix, pl_, pi_)
        return (plans, khat, dh, tabs, rle_c)

    if S > 1:
        # NumPy and the native table builder release the GIL: per-shard prep
        # threads across cores instead of serializing ~0.13 s/MB of host work
        from concurrent.futures import ThreadPoolExecutor

        import os as _os

        with ThreadPoolExecutor(max_workers=_os.cpu_count() or 4) as ex:
            prep = list(ex.map(prep_one, datas))
    else:
        prep = [prep_one(d) for d in datas]

    maxM = max(p[2].shape[0] for p in prep)
    MP = 1 << (max(maxM, TILE, 1) - 1).bit_length()
    npos = np.asarray([p[2].shape[0] for p in prep], np.int32)

    def pad(rows, fill, dtype=np.int32):
        out = np.full((S, MP), fill, dtype)
        for i, r in enumerate(rows):
            out[i, : r.shape[0]] = r
        return out

    # Only the chunk-count plane crosses the host link (rle_c <= 241 is
    # natively byte-sized); bound and rle_k are derived from it on device
    # (ops/plan_ext.derive_region_arrays — scan/elementwise only; a
    # scatter-based sparse variant was tried and reverted: the
    # scatter-in-vmap graph stalled the remote TPU compiler indefinitely
    # where dense graphs compile in minutes).
    rc_b = pad([p[4] for p in prep], 0, np.uint8)

    if device_tables and not interpret:
        # Fused path: sentinelize -> regions -> tables -> planner -> commit
        # in ONE device call per group (the tunnel charges ~30 ms per RPC),
        # with the batch split in two groups so the second group's h2d
        # overlaps the first group's kernels (same as encode_v1's fused
        # path).  The raw dh/rc byte planes are the only h2d.
        from ..ops.match_ext_pallas import ext_pallas_available

        dh_u8 = pad([p[2] for p in prep], 0, np.uint8)
        dict_d = jnp.asarray(dict_arr.astype(np.int32))
        # The band-space kernel covers the FULL window lattice and the
        # probe (lazy) family since round 4: the band-block loop is a
        # lax.fori_loop whose body reuses one VMEM scratch set (the
        # round-3 Python-unrolled form OOM'd scoped VMEM from w=12 up),
        # with only the two glue-stash blocks peeled.  Measured on-chip
        # (8 x 1 MB): w10 32 ms/MB (35 with probe), w12 102, w15 752 —
        # uniformly ~3x the XLA formulation at equal window.
        use_pallas = ext_pallas_available() and MP % 1024 == 0
        # sparse chunk-count sideband (see _ext_device_stage_impl): pad
        # the pair lists to a pow2 bucket to bound recompiles
        nz = [np.nonzero(rc_b[i])[0].astype(np.int32) for i in range(S)]
        kmax = max((z.shape[0] for z in nz), default=0)
        K = 1 << max(9, (max(kmax, 1) - 1).bit_length())
        sparse = K <= MP // 8
        if sparse:
            # padding entries get DISTINCT out-of-range positions MP + k
            # (scatter contract of _ext_device_stage_impl's sparse_rc)
            rc_pos = MP + np.tile(np.arange(K, dtype=np.int32), (S, 1))
            rc_cnt = np.zeros((S, K), np.int32)
            for i, z in enumerate(nz):
                rc_pos[i, : z.shape[0]] = z
                rc_cnt[i, : z.shape[0]] = rc_b[i, z]
        groups = [list(range(S))]
        if S >= 4:
            h = (S + 1) // 2
            groups = [list(range(h)), list(range(h, S))]
        stage = _ext_device_stage()
        handles = [
            stage(
                jnp.asarray(dh_u8[g]),
                jnp.asarray(rc_pos[g] if sparse else rc_b[g]),
                jnp.asarray(rc_cnt[g] if sparse else rc_b[g][:, :1]
                            .astype(np.int32)),
                jnp.asarray(npos[g]), dict_d, window=window,
                literal=literal, dlast=dlast, lazy=lazy_matching,
                pallas_tables=use_pallas, sparse_rc=sparse, NP=MP)
            for g in groups
        ]
        if len(handles) == 1:
            out, state = handles[0]
        else:
            out = jnp.concatenate([h[0] for h in handles], axis=0)
            state = jnp.concatenate([h[1] for h in handles], axis=0)
    else:
        rc_d = jnp.asarray(rc_b).astype(jnp.int32)
        bnd_d, rk_d = derive_region_arrays(rc_d, window=window)
        pl_d = pi_d = None
        if device_tables:
            from ..ops.match_ext_mxu import ext_tables_device

            dh_u8 = pad([p[2] for p in prep], 0, np.uint8)
            npos_d = jnp.asarray(npos)
            dict_d = jnp.asarray(dict_arr.astype(np.int32))
            SEARCH_T = 256
            tabs_d = ext_tables_device(
                jnp.asarray(dh_u8), npos_d, dict_d,
                window_bits=window, LEXT=maxpat, T=SEARCH_T,
                n_chunks=MP // SEARCH_T, probe=lazy_matching)
            if lazy_matching:
                l16_d, i16_d, lx_d, ix_d, pl_d, pi_d = tabs_d
            else:
                l16_d, i16_d, lx_d, ix_d = tabs_d
            col = jnp.arange(MP, dtype=jnp.int32)[None, :]
            dh_d = jnp.where(col < npos_d[:, None],
                             jnp.asarray(dh_u8).astype(jnp.int32), 0x1FF)
        else:
            dh_d = jnp.asarray(
                pad([p[2].astype(np.int32) for p in prep], 0x1FF))
            l16_d = jnp.asarray(pad([p[3][0] for p in prep], 0))
            i16_d = jnp.asarray(pad([p[3][1] for p in prep], 0))
            lx_d = jnp.asarray(pad([p[3][2] for p in prep], 0))
            ix_d = jnp.asarray(pad([p[3][3] for p in prep], 0))
            if lazy_matching:
                pl_d = jnp.asarray(pad([p[3][4] for p in prep], 0))
                pi_d = jnp.asarray(pad([p[3][5] for p in prep], 0))

        A, B = plan_fields_ext(
            dh_d, l16_d, i16_d, lx_d, ix_d, bnd_d, rc_d, rk_d,
            window=window, literal=literal, dlast=dlast,
            plen=pl_d, pidx=pi_d, lazy=lazy_matching)

        from ..ops.plan_ext import SPLIT_WINDOW

        max_out = MP + MP // 8 + 64
        out, state = _commit_fields_batch(
            A, B, jnp.asarray(npos), NP=MP, dual=True, max_out=max_out,
            idx_bits=window if window >= SPLIT_WINDOW else 0,
            interpret=interpret)
    state = np.asarray(state)
    from .pipeline import _pull_body_bytes

    bodies = _pull_body_bytes(out, state)

    results: list[bytes] = []
    for i, data in enumerate(datas):
        st = state[i]
        if st[S_ERR] != 0:
            raise ExcessBitsError
        plans, khat, dh, tabs, _ = prep[i]
        t_m = int(st[S_T])
        acc, an = int(st[S_ACC]), int(st[S_AN])
        body = bodies[i].tobytes()
        M = dh.shape[0]
        # The native planned committer resumes the walk at the kernel's
        # stop (it re-searches the < 16 remaining positions against a
        # replayed ring itself — no tables cross the host link) and
        # returns the tail bytes with the kernel's bit remainder stitched
        # in front.  Model position t_m -> input position: the first t
        # with khat[t] == t_m among kept positions, i.e. the index where
        # khat first reaches t_m + 1, minus one (khat is nondecreasing).
        if t_m < M:
            t_in = int(np.searchsorted(khat, t_m + 1, side="left")) - 1
        else:
            t_in = data.shape[0]
        tail = _native.native_ext_tail_bits(
            data, t_in, dh, khat, plans, window=window, literal=literal,
            acc=acc, an=an, lazy=lazy_matching, dictionary=dict_bytes)
        (hv, hn), = build_header(
            window, literal, dictionary is not None, True, False)
        assert hn == 8
        results.append(bytes([hv]) + body + tail)
    return results


def _opt_ext_stage():
    import jax

    def impl(packed, data, npos, sb_pos, sb_cw, *, window: int,
             literal: int, NP: int, need_data: bool):
        import jax.numpy as jnp

        from ..ops.opt_parse_ext import opt_ext_choice_device

        choice, cost0, bad = opt_ext_choice_device(
            packed, data, npos, sb_pos, sb_cw, window=window,
            literal=literal, NP=NP, need_data=need_data)
        return choice.astype(jnp.uint8), cost0, bad

    return jax.jit(impl, static_argnames=("window", "literal", "NP",
                                          "need_data"))


_opt_ext_stage = functools.lru_cache(maxsize=1)(_opt_ext_stage)


def encode_ext_device_optimal(
    shards,
    *,
    window: int = 10,
    literal: int = 8,
    dictionary: bytes | None = None,
) -> list[bytes]:
    """Optimal (minimum-bit) EXTENDED encode with the DP on the TPU.

    Byte-identical to :func:`tamp_tpu.engine.encode.encode_extended_optimal`
    (the host hybrid RLE+DP, the repo's beyond-reference ratio mode,
    ~-1.5% vs reference greedy): the host detects forced-RLE regions and
    builds khat-aware match tables (opt_ext_runs + the native chain
    builder), the device runs the full-lookback blocked min-plus DP
    (ops/opt_parse_ext — the round-4 parked plan, executed with the
    partial-group analysis revised), and the host expands the choice
    plane (native_opt_ext_walk) and bit-packs with the shared emit.

    The DP — the O(N*K^2) half — is what moves on-chip here; the
    cap-maxpat tables stay on the host chain engine in this mode (the
    device table kernel computes model-stream tables for the planned
    pipeline; wiring the khat-compacted stream through it is the
    remaining step to a fully device-fed optimal mode).
    """
    import jax.numpy as jnp

    from .. import _native
    from ..constants import HUFFMAN_LENGTHS
    from ..exceptions import ExcessBitsError
    from ..ops.opt_parse import INF
    from .encode import opt_ext_emit, opt_ext_runs

    if not _native.available():
        raise RuntimeError(
            f"device optimal encode needs the native engine "
            f"({_native.load_error()})")
    W = 1 << window
    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + 131
    dict_bytes = None
    if dictionary is not None:
        dict_bytes = bytes(dictionary)
        if len(dict_bytes) != W:
            raise ValueError("Dictionary-window size mismatch.")

    datas = [np.frombuffer(bytes(b), dtype=np.uint8) for b in shards]
    S = len(datas)
    if S == 0:
        return []

    def prep_one(arr):
        n = arr.shape[0]
        runs, khat, chunks = opt_ext_runs(arr, window)
        flen, fidx = _native.native_v1_tables(
            arr, window, literal, maxpat, dictionary=dict_bytes,
            ext_dict=True, khat=khat)
        wpos = (khat[:n] if khat is not None
                else np.arange(n, dtype=np.uint32))
        room = (W - (wpos & (W - 1))).astype(np.uint32)
        bound = np.full(n, 255, np.uint32)
        interior = np.zeros(n, np.uint32)
        if runs:
            starts_a = np.asarray([a for a, _ in runs], np.int64)
            idx = np.searchsorted(starts_a, np.arange(n), side="right")
            has = idx < starts_a.shape[0]
            bound[has] = np.minimum(
                starts_a[idx[has]] - np.flatnonzero(has), 255)
            for a, b in runs:
                interior[a:b] = 1
        cstarts = np.asarray([c[0] for c in chunks], np.int32)
        ccost = np.asarray(
            [int(HUFFMAN_LENGTHS[12]) + int(HUFFMAN_LENGTHS[(c[1] - 2) >> 4])
             - 1 + 4 for c in chunks], np.int32)
        packed = (flen.astype(np.uint32) | ((room - 1) << 8)
                  | (bound << 23) | (interior << 31)).view(np.int32)
        return packed, fidx, runs, cstarts, ccost

    if S > 1:
        from concurrent.futures import ThreadPoolExecutor

        import os as _os

        with ThreadPoolExecutor(max_workers=_os.cpu_count() or 4) as ex:
            prep = list(ex.map(prep_one, datas))
    else:
        prep = [prep_one(datas[0])]

    maxN = max(d.shape[0] for d in datas)
    MP = 1 << max(10, (max(maxN, 1) - 1).bit_length())
    npos = np.asarray([d.shape[0] for d in datas], np.int32)
    pk = np.zeros((S, MP), np.int32)
    for i, p in enumerate(prep):
        pk[i, : p[0].shape[0]] = p[0]
    need_data = literal < 8
    if need_data:
        db = np.zeros((S, MP), np.int32)
        for i, d in enumerate(datas):
            db[i, : d.shape[0]] = d
    else:
        db = pk  # dead operand keeps the call signature static
    kmax = max((p[3].shape[0] for p in prep), default=0)
    C = 1 << max(7, (max(kmax, 1) - 1).bit_length())
    sb_pos = MP + np.tile(np.arange(C, dtype=np.int32), (S, 1))
    sb_cw = np.zeros((S, C), np.int32)
    for i, p in enumerate(prep):
        k = p[3].shape[0]
        sb_pos[i, :k] = p[3]
        sb_cw[i, :k] = p[4]

    stage = _opt_ext_stage()
    groups = [list(range(S))]
    if S >= 4:
        h = (S + 1) // 2
        groups = [list(range(h)), list(range(h, S))]
    handles = [
        stage(jnp.asarray(pk[g]), jnp.asarray(db[g]), jnp.asarray(npos[g]),
              jnp.asarray(sb_pos[g]), jnp.asarray(sb_cw[g]),
              window=window, literal=literal, NP=MP, need_data=need_data)
        for g in groups
    ]
    results: list[bytes] = []
    for g, h in zip(groups, handles):
        ch = np.asarray(h[0])
        cost0 = np.asarray(h[1])
        bad = np.asarray(h[2])
        for j, i in enumerate(g):
            arr = datas[i]
            n = arr.shape[0]
            if bool(bad[j]) or int(cost0[j]) >= INF:
                raise ExcessBitsError
            _pk, fidx, runs, _cs, _cc = prep[i]
            sizes, kinds = _native.native_opt_ext_walk(
                ch[j, :n], minp, runs)
            results.append(opt_ext_emit(
                arr, sizes, kinds, fidx, window=window, literal=literal,
                custom_dict=dictionary is not None))
    return results
