"""Wavefront-decoder design-space measurements (scratch, kept as a record).

Subcommands:
    (none)      cost_floors -- bare gathers, doubling rounds, scatter-max vs
                searchsorted, end-to-end kernel scaling on a real payload
    hop         candidate implementations of the doubling hop (full-domain
                gather / take_along_axis / one-hot MXU matmul) + fold loops
    int8        int8/bf16 plane-matmul hop variants
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def cost_floors() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 4 << 20       # per-bit domain
    M = 1 << 20       # output domain
    T = (8 << 20) // 9  # token domain

    rng = np.random.default_rng(0)
    idx_n = jnp.asarray(rng.integers(0, N, N, np.int32))
    idx_m = jnp.asarray(rng.integers(0, M, M, np.int32))
    val_n = jnp.asarray(rng.integers(0, N, N, np.int32))

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l) for l in leaves)
            float(s)
            reps.append(time.perf_counter() - t0)
        print(f"{name:36s} {min(reps)*1e3:8.2f} ms", flush=True)

    timeit("bare gather 4M", jax.jit(lambda v, i: v[i]), val_n, idx_n)
    timeit("gather+clip+where 4M (1 dbl round)",
           jax.jit(lambda v: jnp.where(v < N // 2, v[jnp.clip(v, 0, N - 1)], v)),
           val_n)

    @jax.jit
    def five_rounds(v):
        for _ in range(5):
            v = jnp.where(v < N // 2, v[jnp.clip(v, 0, N - 1)], v)
        return v

    timeit("5 fused dbl rounds 4M", five_rounds, val_n)

    # monotone inverse map: scatter-max+cummax vs searchsorted
    starts = jnp.asarray(np.sort(rng.integers(0, M, T).astype(np.int32)))
    obyte = jnp.arange(M, dtype=jnp.int32)

    @jax.jit
    def scatter_cummax(starts):
        tok_of = jnp.zeros(M, jnp.int32).at[
            jnp.minimum(starts, M)
        ].max(jnp.arange(T, dtype=jnp.int32), mode="drop")
        return lax.cummax(tok_of)

    timeit(f"scatter-max+cummax T={T} M={M}", scatter_cummax, starts)

    @jax.jit
    def ssorted(starts, obyte):
        return jnp.searchsorted(starts, obyte, side="right").astype(jnp.int32) - 1

    timeit("searchsorted T->M", ssorted, starts, obyte)

    # value-resolution rounds on a real payload's src links
    from bench import build_corpus
    from tamp_tpu._native import native_compress
    from tamp_tpu.ops import decode_wavefront as wf

    raw = build_corpus(1 << 20)
    blob = bytes(native_compress(raw, window=10, literal=8, extended=True))
    payload = blob[1:]
    L = wf._pow2_bucket(len(payload), 64)
    max_out = wf._pow2_bucket(len(raw), 1024)
    blobs = np.zeros((1, L + 8), np.uint32)
    blobs[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    from tamp_tpu.dictionary import dictionary_array
    d = jnp.asarray(dictionary_array(1024, literal=8), dtype=jnp.int32)

    # count rounds by instrumenting a local copy of the pd loop on real srcs:
    # rebuild src via the kernel's stages (cheap path: run full kernel but
    # return the loop count)  -- approximate by running the kernel and then
    # recomputing; simplest: measure rounds via monotone shrink of src>=0.
    outs, lens, errs = wf._decode_group(
        [payload], window=10, literal=8, extended=True, more=False,
        dict_init=np.asarray(d), dict_reset=np.asarray(d), max_out=max_out)
    import numpy as _np
    assert bytes(_np.asarray(outs[0])[: int(lens[0])]) == raw[: int(lens[0])]
    print("kernel OK; now measuring pd round count via python loop", flush=True)

    # Reconstruct src with numpy oracle-free approach is heavy; instead time
    # the full kernel at two sizes for scaling info.
    for mb in (0.5, 1.0, 2.0):
        raw2 = build_corpus(int(mb * (1 << 20)))
        blob2 = bytes(native_compress(raw2, window=10, literal=8, extended=True))
        p2 = blob2[1:]
        t0 = time.perf_counter()
        outs, lens, errs = wf._decode_group(
            [p2], window=10, literal=8, extended=True, more=False,
            dict_init=np.asarray(d), dict_reset=np.asarray(d),
            max_out=wf._pow2_bucket(len(raw2), 1024))
        _np.asarray(outs)  # force the pull: handles are async now
        dt = time.perf_counter() - t0
        print(f"end-to-end {mb} MB: {dt*1e3:.0f} ms (incl h2d/d2h+compile-cache)",
              flush=True)


def hop_candidates() -> None:
    """Candidate implementations for the wavefront doubling hop.

    The hop ``ex[clip(ex)]`` only ever reads within the source bit's own
    block (an exit past the block end is a fixpoint), so it can be computed
    per-row: full-domain gather vs take_along_axis vs one-hot fp32 matmul
    on the MXU.  Also: batched vs scalar window-fold loops.
    """
    import jax
    import jax.numpy as jnp

    NBP = 4 << 20
    B = 256
    nblk = NBP // B

    rng = np.random.default_rng(0)
    # synthetic exits: mostly in-block forward jumps, some already out
    base = np.arange(NBP, dtype=np.int32)
    jump = rng.integers(9, 42, NBP).astype(np.int32)
    ex = base + jump  # some exceed their block end -> fixpoints
    pos_end = ((base >> 8) + 1) * B

    exj = jnp.asarray(ex)
    pos_endj = jnp.asarray(pos_end)

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
            float(s)
            reps.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(reps)*1e3:8.2f} ms", flush=True)
        return out

    @jax.jit
    def hop_gather(ex):
        inside = ex < pos_endj
        hop = ex[jnp.clip(ex, 0, NBP - 1)]
        return jnp.where(inside, hop, ex)

    r1 = timeit("hop: full-domain gather", hop_gather, exj)

    @jax.jit
    def hop_tala(ex):
        ex2d = ex.reshape(nblk, B)
        local = ex2d - (jnp.arange(nblk, dtype=jnp.int32) * B)[:, None]
        inside = (local >= 0) & (local < B)
        idx = jnp.clip(local, 0, B - 1)
        hop = jnp.take_along_axis(ex2d, idx, axis=1)
        return jnp.where(inside, hop, ex2d).reshape(NBP)

    r2 = timeit("hop: take_along_axis in-row", hop_tala, exj)

    @jax.jit
    def hop_onehot(ex):
        ex2d = ex.reshape(nblk, B)
        local = ex2d - (jnp.arange(nblk, dtype=jnp.int32) * B)[:, None]
        inside = (local >= 0) & (local < B)
        idx = jnp.clip(local, 0, B - 1)
        oh = (idx[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)
        vals = ex2d.astype(jnp.float32)
        hop = jnp.einsum(
            "rij,rj->ri", oh.astype(jnp.float32), vals,
            preferred_element_type=jnp.float32).astype(jnp.int32)
        return jnp.where(inside, hop, ex2d).reshape(NBP)

    r3 = timeit("hop: one-hot fp32 matmul", hop_onehot, exj)

    print("equal tala:", bool(jnp.all(r1 == r2)),
          " onehot:", bool(jnp.all(r1 == r3)), flush=True)

    # batched fold pattern: ~190 while-loop iterations, each a 64-wide
    # dynamic slice + 64 unrolled scalar steps + dynamic update
    T_max = (8 << 20) // 9
    n_tr = 12093
    S_tr = jnp.asarray(rng.integers(0, 1 << 20, T_max, np.int32))
    w_tr = jnp.asarray(rng.integers(0, 146, T_max, np.int32))
    W = 1024
    G = 64

    from jax import lax

    @jax.jit
    def fold_batched(S_tr, w_tr, n):
        nb = (n + G - 1) // G

        def body(st):
            i, D, d_tr = st
            s = lax.dynamic_slice(S_tr, (i * G,), (G,))
            w = lax.dynamic_slice(w_tr, (i * G,), (G,))
            valid = i * G + jnp.arange(G, dtype=jnp.int32) < n
            ds = jnp.zeros(G, jnp.int32)
            for j in range(G):
                a_mod = jnp.remainder(s[j] - D, W)
                d = jnp.maximum(0, w[j] - (W - a_mod))
                d = jnp.where(valid[j], d, 0)
                ds = ds.at[j].set(d)
                D = D + d
            return i + 1, D, lax.dynamic_update_slice(d_tr, ds, (i * G,))

        z = jnp.int32(0)
        _, _, d_tr = lax.while_loop(
            lambda st: st[0] < nb, body, (z, z, jnp.zeros(T_max, jnp.int32)))
        return d_tr

    timeit("fold: batched 64-wide loop", fold_batched, S_tr, w_tr,
           jnp.int32(n_tr))

    @jax.jit
    def fold_scalar(S_tr, w_tr, n):
        def body(st):
            i, D, d_tr = st
            a_mod = jnp.remainder(S_tr[i] - D, W)
            d = jnp.maximum(0, w_tr[i] - (W - a_mod))
            return i + 1, D + d, d_tr.at[i].set(d)

        z = jnp.int32(0)
        _, _, d_tr = lax.while_loop(
            lambda st: st[0] < n, body, (z, z, jnp.zeros(T_max, jnp.int32)))
        return d_tr

    timeit("fold: scalar loop (current)", fold_scalar, S_tr, w_tr,
           jnp.int32(n_tr))



def int8_variants() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    NBP = 4 << 20
    B = 256
    nblk = NBP // B
    rng = np.random.default_rng(0)
    base = np.arange(NBP, dtype=np.int32)
    ex = base + rng.integers(9, 42, NBP).astype(np.int32)
    pos_end = ((base >> 8) + 1) * B
    exj = jnp.asarray(ex)
    pos_endj = jnp.asarray(pos_end)

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
            float(s)
            reps.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(reps)*1e3:8.2f} ms", flush=True)
        return out

    @jax.jit
    def hop_gather(ex):
        inside = ex < pos_endj
        hop = ex[jnp.clip(ex, 0, NBP - 1)]
        return jnp.where(inside, hop, ex)

    want = hop_gather(exj)

    @jax.jit
    def hop_int8_planes(ex):
        ex2d = ex.reshape(nblk, B)
        local = ex2d - (jnp.arange(nblk, dtype=jnp.int32) * B)[:, None]
        inside = (local >= 0) & (local < B)
        idx = jnp.clip(local, 0, B - 1)
        oh = (idx[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.int8)
        planes = jnp.stack(
            [ex2d & 0xFF, (ex2d >> 8) & 0xFF, (ex2d >> 16) & 0xFF], axis=-1
        ).astype(jnp.int8)  # note: int8 is signed; values 0..255 wrap
        # keep exact: use two 7-bit-safe planes? simpler: widen planes to u8 via
        # int8 reinterpret and fix sign after dot: (x & 0xFF) in [-128,127] as
        # int8; dot sums signed; recover by adding 256*count(negatives) -- too
        # clever. Instead use 4-bit planes (6 planes, all 0..15, sign-safe).
        p = [((ex2d >> (4 * k)) & 0xF).astype(jnp.int8) for k in range(6)]
        planes = jnp.stack(p, axis=-1)
        acc = jax.lax.dot_general(
            oh, planes, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        hop = sum((acc[:, :, k].astype(jnp.int32) << (4 * k)) for k in range(6))
        return jnp.where(inside, hop, ex2d).reshape(NBP)

    r = timeit("hop: int8 4bit-plane matmul", hop_int8_planes, exj)
    print("equal:", bool(jnp.all(r == want)), flush=True)

    @jax.jit
    def hop_bf16_planes(ex):
        ex2d = ex.reshape(nblk, B)
        local = ex2d - (jnp.arange(nblk, dtype=jnp.int32) * B)[:, None]
        inside = (local >= 0) & (local < B)
        idx = jnp.clip(local, 0, B - 1)
        oh = (idx[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)
        p = [((ex2d >> (8 * k)) & 0xFF).astype(jnp.bfloat16) for k in range(3)]
        planes = jnp.stack(p, axis=-1)
        acc = jax.lax.dot_general(
            oh, planes, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        hop = sum((acc[:, :, k].astype(jnp.int32) << (8 * k)) for k in range(3))
        return jnp.where(inside, hop, ex2d).reshape(NBP)

    r = timeit("hop: bf16 byte-plane matmul", hop_bf16_planes, exj)
    print("equal:", bool(jnp.all(r == want)), flush=True)



if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "hop":
        hop_candidates()
    elif cmd == "int8":
        int8_variants()
    else:
        cost_floors()
