"""On-chip primitive cost floors for the wavefront decoder's building blocks.

Measures, at the kernel's actual sizes: bare flat gathers, gather+where
doubling rounds, scatter-max+cummax vs searchsorted for monotone inverse
maps, and the actual pointer-doubling round count on a real payload.
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
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


if __name__ == "__main__":
    main()
