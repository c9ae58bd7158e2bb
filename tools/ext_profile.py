"""Stage timing for the on-chip EXTENDED encode pipeline (VERDICT r2 #2).

Isolates, at the bench geometry (8 x 1 MB shards by default):
  - host prep (plan_runs + build_model_history + chunk counts), threaded
  - device: derive_region_arrays / ext_tables_device / plan_fields_ext /
    commit kernel — each timed compute-only (scalar-pull sync)
  - full encode_ext_device_commit e2e (includes h2d/d2h + tail stitch)

Usage: python tools/ext_profile.py [n_shards] [shard_mb]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shard_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    n = int(shard_mb * (1 << 20))
    total_mb = S * n / (1 << 20)
    out = {"shards": S, "shard_mb": shard_mb}

    import jax
    import jax.numpy as jnp

    out["backend"] = jax.default_backend()

    from bench import build_corpus

    data = build_corpus(S * n)
    shards = [data[i * n : (i + 1) * n] for i in range(S)]
    datas = [np.frombuffer(b, np.uint8) for b in shards]

    window, literal = 10, 8
    W = 1 << window

    from tamp_tpu import _native
    from tamp_tpu.constants import compute_min_pattern_size
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.engine.pipeline_ext import encode_ext_device_commit
    from tamp_tpu.ops.encode_commit_pallas import TILE, _commit_fields_batch
    from tamp_tpu.ops.match_ext_mxu import ext_tables_device
    from tamp_tpu.ops.plan_ext import derive_region_arrays, plan_fields_ext

    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + 131
    dict_arr = dictionary_array(W, literal=literal)

    # ---- host prep (threaded, as pipeline_ext does) ----------------------
    def prep_one(d):
        plans, khat, dh, rle_c = _native.native_ext_prep(d, window)
        return plans, khat, dh, rle_c

    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=os.cpu_count() or 4) as ex:
        prep = list(ex.map(prep_one, datas))
    prep_s = time.perf_counter() - t0
    out["host_prep_ms_per_mb"] = round(prep_s / total_mb * 1e3, 1)

    # serial single-shard figure for the per-core cost
    t0 = time.perf_counter()
    prep_one(datas[0])
    out["host_prep_1shard_ms_per_mb"] = round(
        (time.perf_counter() - t0) / (n / (1 << 20)) * 1e3, 1)
    print(json.dumps(out), flush=True)

    # ---- device stages ----------------------------------------------------
    maxM = max(p[2].shape[0] for p in prep)
    MP = 1 << (max(maxM, TILE, 1) - 1).bit_length()
    npos = np.asarray([p[2].shape[0] for p in prep], np.int32)

    def pad(rows, fill, dtype=np.int32):
        o = np.full((S, MP), fill, dtype)
        for i, r in enumerate(rows):
            o[i, : r.shape[0]] = r
        return o

    rc_b = pad([p[3] for p in prep], 0, np.uint8)
    dh_u8 = pad([p[2] for p in prep], 0, np.uint8)
    rc_d = jax.device_put(jnp.asarray(rc_b)).astype(jnp.int32)
    dh_d8 = jax.device_put(jnp.asarray(dh_u8))
    npos_d = jnp.asarray(npos)
    dict_d = jnp.asarray(dict_arr.astype(np.int32))

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jnp.sum(leaves[0][0, 0].astype(jnp.float32)))

    def timeit(name, fn, reps=3):
        r = fn()
        sync(r)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        out[name + "_ms_per_mb"] = round(best / total_mb * 1e3, 1)
        print(json.dumps(out), flush=True)
        return r

    bnd_d, rk_d = timeit(
        "derive_regions", lambda: derive_region_arrays(rc_d, window=window))

    from tamp_tpu.ops.match_ext_pallas import (
        ext_pallas_available, ext_tables_pallas,
    )

    if ext_pallas_available() and MP % 1024 == 0:
        tabs = timeit(
            "ext_tables",
            lambda: ext_tables_pallas(
                dh_d8, npos_d, dict_d, window_bits=window, LEXT=maxpat,
                T=1024, n_chunks=MP // 1024))
    else:
        SEARCH_T = 256
        tabs = timeit(
            "ext_tables",
            lambda: ext_tables_device(
                dh_d8, npos_d, dict_d, window_bits=window, LEXT=maxpat,
                T=SEARCH_T, n_chunks=MP // SEARCH_T))
    l16_d, i16_d, lx_d, ix_d = tabs

    col = jnp.arange(MP, dtype=jnp.int32)[None, :]
    dh_sent = jnp.where(col < npos_d[:, None], dh_d8.astype(jnp.int32), 0x1FF)
    dlast = int(dict_arr[-1])

    AB = timeit(
        "plan_fields",
        lambda: plan_fields_ext(
            dh_sent, l16_d, i16_d, lx_d, ix_d, bnd_d, rc_d, rk_d,
            window=window, literal=literal, dlast=dlast))
    A, B = AB

    max_out = MP + MP // 8 + 64

    def commit():
        o, st = _commit_fields_batch(
            A, B, npos_d, NP=MP, dual=True, max_out=max_out, interpret=False)
        return st

    timeit("commit", commit)

    # ---- end-to-end --------------------------------------------------------
    blobs = encode_ext_device_commit(shards, window=window, literal=literal)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        encode_ext_device_commit(shards, window=window, literal=literal)
        best = min(best, time.perf_counter() - t0)
    out["e2e_ms_per_mb"] = round(best / total_mb * 1e3, 1)
    out["e2e_mb_s"] = round(total_mb / best, 2)
    out["ratio"] = round(sum(len(b) for b in blobs) / len(data), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
