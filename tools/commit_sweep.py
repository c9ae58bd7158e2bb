"""One-process tile/chain sweep for the planned-fields commit kernel.

Compute-only (scalar-pull sync); one process amortizes the tunnel warmup.
Usage: python tools/commit_sweep.py [MB] [tile,chain ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    configs = [tuple(map(int, a.split(","))) for a in sys.argv[2:]] or [
        (512, 4), (512, 8), (2048, 4), (2048, 8), (4096, 8)]
    n = int(mb * (1 << 20))

    import jax.numpy as jnp
    import numpy as np

    from bench import build_corpus
    from tamp_tpu.engine.encode import model_history
    from tamp_tpu.engine.search_np import match_tables
    from tamp_tpu.ops.encode_commit_pallas import (S_ERR, S_NBYTES,
                                                   encode_commit_batch)

    data = build_corpus(n)
    arr = np.frombuffer(data, np.uint8)
    window, literal = 10, 8
    dict_arr, _ = model_history(arr, window, literal, False, None)
    tables = match_tables(arr, dict_arr, window, compute_probe=False)
    NP = 1 << (n - 1).bit_length()
    pk = np.zeros((1, NP), np.int32)
    pk[0, :n] = ((tables.len16[:n].astype(np.int32) << 23)
                 | (tables.idx16[:n].astype(np.int32) << 8)
                 | arr.astype(np.int32))
    pb = np.zeros((1, NP), np.int32)
    pk_d, pb_d = jnp.asarray(pk), jnp.asarray(pb)
    np_d = jnp.asarray(np.asarray([n], np.int32))
    max_enc = NP + NP // 8 + 64

    out = {"mb": mb}
    ref_nb = None
    for tile, chain in configs:
        if NP % tile:
            continue

        def enc():
            o, state = encode_commit_batch(
                pk_d, pb_d, np_d, NP=NP, window=window, literal=literal,
                lazy=False, max_out=max_enc, tile=tile, chain=chain)
            return int(state[0, S_ERR]), int(state[0, S_NBYTES])

        err, nb = enc()
        assert err == 0
        if ref_nb is None:
            ref_nb = nb
        assert nb == ref_nb, (tile, chain, nb, ref_nb)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            enc()
            best = min(best, time.perf_counter() - t0)
        out[f"t{tile}_c{chain}_ms_per_mb"] = round(best / mb * 1e3, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
