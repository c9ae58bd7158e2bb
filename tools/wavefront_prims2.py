"""Candidate implementations for the wavefront doubling hop.

The hop ``ex[clip(ex)]`` only ever reads within the source bit's own block
(an exit past the block end is a fixpoint), so it can be computed per-row:
full-domain gather vs take_along_axis vs one-hot fp32 matmul on the MXU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
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


if __name__ == "__main__":
    main()


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


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "int8":
    int8_variants()
