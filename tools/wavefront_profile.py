"""Stage-level timing of the wavefront device decoder on the attached chip.

Builds a representative compressed payload, then times (a) the full kernel
and (b) stage-isolated jits (speculative parse / token table / value
resolution) to locate the on-chip bottleneck.  Timings exclude h2d/d2h: the
result is reduced to one scalar on device and that scalar is pulled (the
tunnel's block_until_ready is unreliable; a scalar pull forces completion).

Usage:  python tools/wavefront_profile.py [payload_mb]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

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


if __name__ == "__main__":
    main()
