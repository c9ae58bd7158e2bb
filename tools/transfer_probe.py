"""Measure tunnel h2d/d2h bandwidth and latency properly.

JAX caches np.asarray(device_array) host-side, so every d2h measurement
uses a fresh device value; h2d is measured at several sizes to split RPC
latency from bandwidth, and with concurrent chunked puts to test whether
the tunnel parallelizes streams.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"backend": jax.default_backend()}

    @jax.jit
    def bump(x):
        return x + jnp.uint8(1)

    # warm up the tunnel (first transfer stalls)
    w = jax.device_put(np.zeros(1024, np.uint8), dev)
    np.asarray(bump(w))

    for size in (1 << 16, 1 << 20, 4 << 20):
        arr = np.random.default_rng(0).integers(
            0, 255, size, dtype=np.uint8)
        # h2d: include a tiny scalar pull to confirm arrival
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x = jax.device_put(arr, dev)
            int(x[0])
            best = min(best, time.perf_counter() - t0)
        out[f"h2d_{size>>10}k_ms"] = round(best * 1e3, 1)
        out[f"h2d_{size>>10}k_mb_s"] = round(size / best / 1e6, 1)

        # d2h: fresh device value each rep (bump defeats the host cache)
        y = jax.device_put(arr, dev)
        best = float("inf")
        for _ in range(3):
            y = bump(y)
            int(y[0])  # ensure compute done; time transfer only
            t0 = time.perf_counter()
            np.asarray(y)
            best = min(best, time.perf_counter() - t0)
        out[f"d2h_{size>>10}k_ms"] = round(best * 1e3, 1)
        out[f"d2h_{size>>10}k_mb_s"] = round(size / best / 1e6, 1)
        print(json.dumps(out), flush=True)

    # chunked-concurrent h2d: dispatch 8 puts of 512K, then force all
    arr = np.random.default_rng(1).integers(0, 255, 4 << 20, dtype=np.uint8)
    chunks = [arr[i : i + (1 << 19)] for i in range(0, 4 << 20, 1 << 19)]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xs = [jax.device_put(c, dev) for c in chunks]
        for x in xs:
            int(x[0])
        best = min(best, time.perf_counter() - t0)
    out["h2d_8x512k_mb_s"] = round((4 << 20) / best / 1e6, 1)

    # chunked-concurrent d2h
    ys = [bump(jax.device_put(c, dev)) for c in chunks]
    for y in ys:
        int(y[0])
    best = float("inf")
    for _ in range(3):
        ys = [bump(y) for y in ys]
        for y in ys:
            int(y[0])
        t0 = time.perf_counter()
        for y in ys:
            np.asarray(y)
        best = min(best, time.perf_counter() - t0)
    out["d2h_8x512k_mb_s"] = round((4 << 20) / best / 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
