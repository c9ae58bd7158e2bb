"""Compute-only microbenchmark for the Pallas stream-commit kernels.

End-to-end device decode/encode timings through this environment's TPU
tunnel are dominated by d2h transfer variance (~15 MB/s with multi-second
stalls), so this tool times ONLY the kernel dispatch, synchronizing by
pulling a single scalar output (jax.block_until_ready is unreliable over
the tunnel — see CLAUDE.md).

Usage: python tools/commit_kernel_bench.py [MB] [reps] [--scale]
Prints one JSON line with ms/MB for the decode commit kernel (extended
stream) and the v1 encode commit kernel.

``--scale`` adds a cross-stream scaling probe: the same total bytes as
1 stream vs 8 streams batched in ONE kernel call.  On hardware with one
scalar core per chip (TPU v5e) the grid necessarily serializes streams, so
compute-only aggregate is expected ~flat with S; batching still wins
end-to-end by amortizing the ~30 ms tunnel RPC and overlapping h2d — the
e2e effect is what bench.py's device probe measures.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    measure(mb, reps, scale="--scale" in sys.argv, verbose=True)


def measure(mb: float, reps: int = 3, scale: bool = False,
            verbose: bool = False) -> dict:
    """Compute-only ms/MB for the decode (parse+commit) and v1 encode
    commit kernels; importable (bench.py's device probe emits these as the
    ``*_compute_ms_mb`` keys so tunnel weather cannot mask kernel
    regressions across rounds)."""
    n = int(mb * (1 << 20))

    import jax
    import numpy as np

    from bench import build_corpus
    from tamp_tpu import _native
    from tamp_tpu.dictionary import dictionary_array

    data = build_corpus(n)
    out = {"backend": jax.default_backend(), "mb": mb}

    # --- device decode: VPU parse + stream-commit kernel (extended
    # stream, the default config); transfers excluded by scalar-pull sync ---
    import jax.numpy as jnp

    from tamp_tpu.ops.decode_wavefront import _pow2_bucket, _wavefront_batch

    window, literal = 10, 8
    payload = _native.native_compress(
        data, window=window, literal=literal, extended=True)[1:]  # drop header
    L = _pow2_bucket(len(payload), 64)
    blobs = np.zeros((1, L + 8), np.uint32)
    blobs[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    nbytes = np.asarray([len(payload)], np.int32)
    dict_init = jnp.asarray(
        dictionary_array(1 << window, literal=literal).astype(np.int32))
    max_out = _pow2_bucket(n + 1, 1024)
    blobs_d, nbytes_d = jnp.asarray(blobs), jnp.asarray(nbytes)

    # Null-dispatch baseline (round-4 verdict weak #1/#4): the timed shape
    # below is "dispatch one async computation, then block on ONE scalar
    # pull" — through this tunnel the pull RPC alone costs ~30 ms, which
    # at a 2 MB probe would read as ~15 ms/MB of phantom kernel cost.
    # Measure that fixed latency with a trivial kernel of the same shape
    # and subtract it; the raw figures stay alongside.
    nul_d = jnp.zeros((8,), jnp.int32)

    def _nul():
        return int((nul_d + 1)[0])

    _nul()
    disp = min(_time(_nul) for _ in range(3 * reps))
    out["dispatch_ms"] = round(disp * 1e3, 1)

    def dec():
        o, lens, errs = _wavefront_batch(
            blobs_d, nbytes_d, dict_init, dict_init, NBP=8 * L,
            window=window, literal=literal, extended=True, more=False,
            max_out=max_out, mode="commit")
        return lens, errs

    lens, errs = dec()  # compile + check (two pulls, outside timing)
    assert int(errs[0]) == 0 and int(lens[0]) == n, (n,)
    best = min(_time(lambda: int(dec()[0][0])) for _ in range(reps))
    out["decode_commit_raw_ms_per_mb"] = round(best / mb * 1e3, 2)
    best = max(best - disp, 1e-9)
    out["decode_commit_ms_per_mb"] = round(best / mb * 1e3, 2)
    out["decode_commit_mb_s"] = round(mb / best, 2)
    if verbose:
        print(json.dumps(out), flush=True)  # partial, in case encode fails

    # --- v1 encode commit kernel (tables from the native chain engine:
    # identical walk decisions — sub-minp entries differ from the oracle
    # but both are < minp — and ~1000x faster to build than the O(N*W)
    # NumPy oracle, which stalled the bench probe's watchdog at 2 MB) ---
    from tamp_tpu.engine.encode import model_history
    from tamp_tpu.ops.encode_commit_pallas import TILE, encode_commit_batch

    arr = np.frombuffer(data, np.uint8)
    dict_arr, _hist = model_history(arr, window, literal, False, None)
    flen16, fidx16 = _native.native_v1_tables(
        arr, window, literal, 16, dictionary=dict_arr.tobytes())
    NP = 1 << (max(n, TILE, 1) - 1).bit_length()
    pk = np.zeros((1, NP), np.int32)
    pk[0, :n] = ((flen16[:n].astype(np.int32) << 23)
                 | (fidx16[:n].astype(np.int32) << 8)
                 | arr.astype(np.int32))
    pb = np.zeros((1, NP), np.int32)
    npos = np.asarray([n], np.int32)
    pk_d, pb_d, np_d = jnp.asarray(pk), jnp.asarray(pb), jnp.asarray(npos)
    max_enc = NP + NP // 8 + 64

    def enc():
        o, state = encode_commit_batch(
            pk_d, pb_d, np_d, NP=NP, window=window, literal=literal,
            lazy=False, max_out=max_enc, interpret=False)
        return int(state[0, 6])  # S_ERR

    assert enc() == 0
    best = min(_time(enc) for _ in range(reps))
    out["encode_commit_raw_ms_per_mb"] = round(best / mb * 1e3, 2)
    best = max(best - disp, 1e-9)
    out["encode_commit_ms_per_mb"] = round(best / mb * 1e3, 2)
    out["encode_commit_mb_s"] = round(mb / best, 2)

    if scale:
        # Same total bytes as 1 stream vs 8 batched streams in ONE call.
        sub = n // 8
        payloads = []
        for s in range(8):
            payloads.append(_native.native_compress(
                data[s * sub : (s + 1) * sub], window=window,
                literal=literal, extended=True)[1:])
        from tamp_tpu.ops.decode_wavefront import _decode_group

        def dec_s(ps):
            o, lens, errs = _decode_group(
                ps, window=window, literal=literal, extended=True,
                more=False, dict_init=np.asarray(dict_init),
                dict_reset=np.asarray(dict_init), max_out=sub + 16)
            return int(np.asarray(lens)[0])

        assert dec_s(payloads) == sub            # compile S=8
        assert dec_s(payloads[:1]) == sub        # compile S=1
        t8 = min(_time(lambda: dec_s(payloads)) for _ in range(reps))
        t1 = min(_time(lambda: dec_s(payloads[:1])) for _ in range(reps))
        out["scale_s1_ms"] = round(t1 * 1e3, 1)
        out["scale_s8_ms"] = round(t8 * 1e3, 1)
        out["scale_s8_vs_s1_aggregate"] = round(8 * t1 / t8, 2)

    if verbose:
        print(json.dumps(out))
    return out


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
