"""Round-2 device profiling: where does end-to-end device codec time go?

Measures, compute-only (scalar-pull sync) and transfer-only, on the real
chip:
  - h2d / d2h rates for 1 MB uint8
  - search kernel (match_pallas._search_pallas) per MB at T=256
  - speculative parse (decode_wavefront._speculative_parse) per MB payload
  - decode commit kernel per MB
  - encode commit kernel per MB

Usage: python tools/device_profile_r2.py [MB]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n = int(mb * (1 << 20))
    out = {"mb": mb}

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_corpus

    out["backend"] = jax.default_backend()
    data = build_corpus(n)
    arr = np.frombuffer(data, np.uint8)

    # --- transfers ---
    dev = jax.devices()[0]
    x = jax.device_put(arr, dev)
    _ = int(x[0])  # force
    out["h2d_mb_s"] = round(mb / t(lambda: int(jax.device_put(arr, dev)[0])), 1)

    y = jnp.zeros(n, jnp.uint8) + x  # device-resident
    _ = np.asarray(y)
    out["d2h_mb_s"] = round(mb / t(lambda: np.asarray(y)), 1)
    print(json.dumps(out), flush=True)

    # --- search kernel, compute only ---
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.engine.search_np import LMAX
    from tamp_tpu.ops.match_pallas import _GRID_TIERS, _round_up, _search_pallas

    window = 10
    W = 1 << window
    for T in (256, 512):
        Qseg = _round_up(T + W + 2 * LMAX, 128)
        n_chunks_total = -(-n // T)
        NC = next((g for g in _GRID_TIERS if n_chunks_total <= g),
                  _GRID_TIERS[-1])
        B = NC * T
        dict_arr = dictionary_array(W, literal=8)
        C = np.full(W + B + Qseg, -1, dtype=np.int32)
        C[:W] = dict_arr
        C[W : W + n] = arr
        rows = np.full(B + Qseg, 0x1FF, dtype=np.int32)
        rows[:n] = arr
        C_d = jnp.asarray(C[W:][None, :])  # offset geometry unchanged enough
        C_d = jnp.asarray(C[: B + Qseg][None, :])
        d_d = jnp.asarray(rows[None, :])

        def srch():
            outs = _search_pallas(C_d, d_d, jnp.int32(0), window, T,
                                  ("16",), NC, False)
            return int(outs[0][0, 0])

        try:
            srch()
            sec = t(srch)
            out[f"search_T{T}_ms_per_mb"] = round(sec / (B / (1 << 20)) * 1e3, 1)
            out[f"search_T{T}_grid_mb"] = round(B / (1 << 20), 2)
        except Exception as e:
            out[f"search_T{T}_error"] = str(e)[:200]
        print(json.dumps(out), flush=True)

    # --- speculative parse, compute only ---
    from tamp_tpu import _native
    from tamp_tpu.ops.decode_wavefront import (_pow2_bucket,
                                               _speculative_parse)
    import functools

    payload = _native.native_compress(data, window=10, literal=8,
                                      extended=True)[1:]
    L = _pow2_bucket(len(payload), 64)
    blobs = np.zeros(L + 8, np.uint32)
    blobs[: len(payload)] = np.frombuffer(payload, np.uint8)
    b_d = jnp.asarray(blobs)
    nb = jnp.int32(len(payload) * 8)

    @functools.partial(jax.jit, static_argnums=(2,))
    def parse(b, nbits, NBP):
        r = _speculative_parse(b, nbits, NBP, 10, 8, True)
        return r[0]

    def run_parse():
        return int(parse(b_d, nb, 8 * L)[0])

    run_parse()
    out["parse_ms_per_payload_mb"] = round(
        t(run_parse) / (L / (1 << 20)) * 1e3, 1)
    out["payload_mb"] = round(len(payload) / (1 << 20), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
