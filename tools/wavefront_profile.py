"""Stage-level timing of the wavefront device decoder on the attached chip.

Builds a representative compressed payload, then times (a) the full kernel
and (b) stage-isolated jits (speculative parse / token table / value
resolution) to locate the on-chip bottleneck.  Timings exclude h2d/d2h: the
result is reduced to one scalar on device and that scalar is pulled (the
tunnel's block_until_ready is unreliable; a scalar pull forces completion).

Usage:  python tools/wavefront_profile.py [payload_mb]
        python tools/wavefront_profile.py fine [payload_mb]   # token-table
            internals, window-fold and value-resolution stage replicas
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def stages(mb: float) -> None:

    from bench import build_corpus
    from tamp_tpu._native import native_compress

    raw = build_corpus(int(mb * (1 << 20)))
    blob = bytes(native_compress(raw, window=10, literal=8, extended=True))
    payload = blob[1:]  # strip header
    print(f"raw {len(raw)} B -> payload {len(payload)} B", flush=True)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    from tamp_tpu.ops import decode_wavefront as wf

    L = wf._pow2_bucket(len(payload), 64)
    NBP = 8 * L
    max_out = wf._pow2_bucket(len(raw), 1024)
    window, literal, extended, more = 10, 8, True, False

    blobs = np.zeros(L + 8, np.uint32)
    blobs[: len(payload)] = np.frombuffer(payload, np.uint8)
    pp32 = jax.device_put(jnp.asarray(blobs), dev)
    nbytes = jnp.asarray(np.int32(len(payload)))

    from tamp_tpu.dictionary import dictionary_array

    d = jax.device_put(jnp.asarray(dictionary_array(1 << window, literal=literal), dtype=jnp.int32), dev)

    def timeit(name, fn, *args):
        out = fn(*args)  # compile
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            # force completion: reduce to scalar and pull
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.int32) if l.dtype == bool else l) for l in leaves)
            float(s)
            reps.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(reps)*1e3:9.2f} ms", flush=True)
        return out

    nb_valid = nbytes * 8

    parse = jax.jit(functools.partial(
        wf._speculative_parse, NBP=NBP, window=window, literal=literal,
        extended=extended))
    nxt, kind, cnt, idx, inv, inc = timeit("speculative_parse", parse, pp32, nb_valid)

    T_max = NBP // (1 + literal) + 2
    ttab = jax.jit(functools.partial(
        wf._token_table, NBP=NBP, literal=literal, T_max=T_max))
    starts, T = timeit("token_table", ttab, nxt, inc)
    print("tokens:", int(T), flush=True)

    full = jax.jit(functools.partial(
        wf._wavefront_kernel, NBP=NBP, window=window, literal=literal,
        extended=extended, more=more, max_out=max_out))
    out, out_len, err = timeit("full_kernel", full, pp32, nbytes, d, d)
    got = np.asarray(out[: int(out_len)], np.uint8).tobytes()
    assert got == raw, "decode mismatch"
    print(f"OK  {mb:.1f} MB in min(full_kernel) above", flush=True)


def fine(mb: float) -> None:
    """Finer stage timing: token-table internals (per-bit doubling /
    block-entry scan / count+write walks) and the window-fold +
    value-resolution stages, via local replicas of kernel pieces."""
    from bench import build_corpus
    from tamp_tpu._native import native_compress

    raw = build_corpus(int(mb * (1 << 20)))
    blob = bytes(native_compress(raw, window=10, literal=8, extended=True))
    payload = blob[1:]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tamp_tpu.ops import decode_wavefront as wf

    window, literal, extended = 10, 8, True
    W = 1 << window
    L = wf._pow2_bucket(len(payload), 64)
    NBP = 8 * L
    max_out = wf._pow2_bucket(len(raw), 1024)
    T_max = NBP // (1 + literal) + 2
    B = wf.BLOCK_BITS
    nblk = NBP // B

    blobs = np.zeros(L + 8, np.uint32)
    blobs[: len(payload)] = np.frombuffer(payload, np.uint8)
    pp32 = jnp.asarray(blobs)
    nbytes = jnp.asarray(np.int32(len(payload)))

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.int32) if l.dtype == bool else l) for l in leaves)
            float(s)
            reps.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(reps)*1e3:9.2f} ms", flush=True)
        return out

    parse = jax.jit(functools.partial(
        wf._speculative_parse, NBP=NBP, window=window, literal=literal,
        extended=extended))
    nxt, kind_b, cnt_b, idx_b, _, inc = parse(pp32, nbytes * 8)
    nxt.block_until_ready()

    # --- token_table internals --------------------------------------------
    pos_end = ((jnp.arange(NBP, dtype=jnp.int32) >> int(math.log2(B))) + 1) * B
    max_hops = B // (1 + literal) + 2
    n_rounds = int(math.ceil(math.log2(max_hops)))

    @jax.jit
    def doubling(nxt):
        ex = nxt
        for _ in range(n_rounds):
            inside = ex < pos_end
            hop = ex[jnp.clip(ex, 0, NBP - 1)]
            ex = jnp.where(inside, hop, ex)
        return ex

    ex = timeit(f"tt/doubling x{n_rounds}", doubling, nxt)

    @jax.jit
    def entry_scan(nxt, ex):
        def entry_body(p, ex_row):
            has = p < NBP
            sentinel = jnp.int32(NBP)
            nxt_p = jnp.where(has, ex_row[jnp.clip(p % B, 0, B - 1)], sentinel)
            return nxt_p.astype(jnp.int32), jnp.where(has, p, sentinel)
        _, entries = lax.scan(entry_body, nxt[0] * 0, ex.reshape(nblk, B))
        return entries

    entries = timeit(f"tt/entry_scan x{nblk}", entry_scan, nxt, ex)

    lim = (jnp.arange(nblk, dtype=jnp.int32) + 1) * B
    walk_steps = B // (1 + literal) + 2

    @jax.jit
    def count_walk(entries, nxt, inc):
        c = entries
        cnt = jnp.zeros(nblk, jnp.int32)
        for _ in range(walk_steps):
            in_blk = c < lim
            ok = in_blk & ~inc[jnp.clip(c, 0, NBP - 1)]
            cnt = cnt + ok.astype(jnp.int32)
            c = jnp.where(in_blk, nxt[jnp.clip(c, 0, NBP - 1)], c)
        return cnt

    counts = timeit(f"tt/count_walk x{walk_steps}", count_walk, entries, nxt, inc)

    @jax.jit
    def write_walk(entries, nxt, inc, counts):
        cs = jnp.cumsum(counts)
        base = cs - counts
        T = cs[nblk - 1]
        c = entries
        starts = jnp.zeros(T_max, jnp.int32)
        k = base
        for _ in range(walk_steps):
            in_blk = c < lim
            ok = in_blk & ~inc[jnp.clip(c, 0, NBP - 1)]
            starts = starts.at[jnp.where(ok, k, T_max)].set(c, mode="drop")
            k = k + ok.astype(jnp.int32)
            c = jnp.where(in_blk, nxt[jnp.clip(c, 0, NBP - 1)], c)
        return starts, T

    starts, T = timeit(f"tt/write_walk x{walk_steps}", write_walk,
                       entries, nxt, inc, counts)

    # --- post-table stages -------------------------------------------------
    active = jnp.arange(T_max, dtype=jnp.int32) < T
    tk = jnp.where(active, kind_b[starts], wf.K_PAD)
    tcnt = jnp.where(active, cnt_b[starts], 0)
    tidx = jnp.where(active, idx_b[starts], 0)
    for a in (tk, tcnt, tidx):
        a.block_until_ready()

    from tamp_tpu.constants import RLE_MAX_WINDOW_WRITE

    @jax.jit
    def fold(tk, tcnt):
        w_unc = jnp.where(tk == wf.K_LIT, 1,
                 jnp.where(tk == wf.K_MATCH, tcnt,
                  jnp.where(tk == wf.K_RLE, jnp.minimum(tcnt, RLE_MAX_WINDOW_WRITE),
                   jnp.where(tk == wf.K_EXT, tcnt, 0)))).astype(jnp.int32)
        csw = jnp.cumsum(w_unc) - w_unc
        trunc = (tk == wf.K_RLE) | (tk == wf.K_EXT)
        tr_id = jnp.cumsum(trunc.astype(jnp.int32)) - 1
        n_tr = jnp.sum(trunc.astype(jnp.int32))
        tr_tok = jnp.zeros(T_max, jnp.int32).at[
            jnp.where(trunc, tr_id, T_max)
        ].set(jnp.arange(T_max, dtype=jnp.int32), mode="drop")

        def tr_cond(st):
            return st[0] < n_tr

        def tr_body(st):
            i, D, defs = st
            t = tr_tok[i]
            a_mod = jnp.remainder(csw[t] - D, W)
            room = W - a_mod
            d = jnp.maximum(0, w_unc[t] - room)
            return i + 1, D + d, defs.at[t].set(d)

        z = w_unc[0] * 0
        _, _, defs = lax.while_loop(tr_cond, tr_body, (z, z, w_unc * 0))
        return defs, n_tr

    defs, n_tr = timeit("fold/while_loop", fold, tk, tcnt)
    print("n_tr:", int(n_tr), flush=True)

    @jax.jit
    def placement_and_values(tk, tcnt, tidx, defs):
        # emulate the remaining stages' array shapes/costs (single-segment)
        cs_cnt = jnp.cumsum(tcnt)
        out_start = cs_cnt - tcnt
        w_unc = jnp.where(tk == wf.K_LIT, 1,
                 jnp.where(tk == wf.K_MATCH, tcnt,
                  jnp.where(tk == wf.K_RLE, jnp.minimum(tcnt, RLE_MAX_WINDOW_WRITE),
                   jnp.where(tk == wf.K_EXT, tcnt, 0)))).astype(jnp.int32)
        csw = jnp.cumsum(w_unc) - w_unc
        csd = jnp.cumsum(defs) - defs
        A = W + csw - csd
        obyte = jnp.arange(max_out, dtype=jnp.int32)
        tok_of = jnp.zeros(max_out, jnp.int32).at[
            jnp.where(tk != wf.K_PAD, out_start, max_out)
        ].max(jnp.arange(T_max, dtype=jnp.int32), mode="drop")
        tok_of = lax.cummax(tok_of)
        off = obyte - out_start[tok_of]
        kb = tk[tok_of]
        src = jnp.zeros(max_out, jnp.int32)
        src = jnp.where(kb == wf.K_LIT, -(tidx[tok_of] + 1), src)
        rle_b = kb == wf.K_RLE
        m_b = (kb == wf.K_MATCH) | (kb == wf.K_EXT)
        Am1 = A[tok_of] - 1
        s_slot = tidx[tok_of] + off
        a = jnp.where(rle_b, Am1,
             jnp.where(m_b, Am1 - jnp.remainder(Am1 - s_slot, W), 0))
        DOM = W + max_out
        ownmap = jnp.zeros(DOM, jnp.int32).at[
            jnp.where(tk != wf.K_PAD, jnp.minimum(A, DOM), DOM)
        ].max(jnp.arange(T_max, dtype=jnp.int32), mode="drop")
        ownmap = lax.cummax(ownmap)
        own = ownmap[jnp.clip(a, 0, DOM - 1)]
        need = rle_b | m_b
        src = jnp.where(need & (a >= W), out_start[own] + (a - A[own]), src)
        src = jnp.where(need & (a < W), -1, src)
        return src

    src = timeit("placement+links", placement_and_values, tk, tcnt, tidx, defs)

    rounds = max(1, int(math.ceil(math.log2(max(max_out, 2)))) + 1)

    @jax.jit
    def value_resolution(src):
        def pd_cond(st):
            i, s = st
            return (i < rounds) & jnp.any(s >= 0)

        def pd_body(st):
            i, s = st
            tgt = s[jnp.clip(s, 0, max_out - 1)]
            return i + 1, jnp.where(s >= 0, tgt, s)

        _, s = lax.while_loop(pd_cond, pd_body, (jnp.int32(0), src))
        return s

    timeit("value_resolution", value_resolution, src)



if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "fine":
        fine(float(args[1]) if len(args) > 1 else 1.0)
    else:
        stages(float(args[0]) if args else 1.0)
