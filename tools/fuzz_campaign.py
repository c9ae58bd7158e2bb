"""Long-running differential fuzz campaign.

Reference analogues: fuzz/fuzz_round_trip.c + fuzz/fuzz_decompressor.c
(libFuzzer targets) and the differential esp32_host harness.  Every trial:

- one-shot native encode == reference encode (byte parity) across the
  config lattice (window 8-15, literal 5-8, extended/lazy);
- exact round-trips through the native and pure-Python decoders;
- streaming encode with random chunking, mid-stream flushes, dictionary
  resets, and custom dictionaries — decoded by the *reference* package;
- decoder robustness on random bit-flips of valid streams (no crashes);
- a sampled wavefront-decoder leg (device-parallel formulation,
  ops/decode_wavefront): byte parity on valid streams incl. custom
  dictionaries, exception-not-crash on mutated streams.

Usage: python tools/fuzz_campaign.py [seconds] [seed]
Set TAMP_FUZZ_WAVEFRONT=0 to skip the JAX leg (e.g. no-JAX hosts).
Requires the reference package at /root/reference for the oracle.
"""

import io
import os

import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, "/root/reference")


def gen_data(rng, n):
    style = rng.randrange(6)
    if style == 0:
        return bytes(rng.getrandbits(8) for _ in range(n))
    if style == 1:
        return bytes(rng.choice(b"abcdef ") for _ in range(n))
    if style == 2:
        out = bytearray()
        while len(out) < n:
            if rng.random() < 0.4:
                out += bytes([rng.getrandbits(8)]) * rng.randrange(1, 500)
            else:
                out += bytes(
                    rng.choice(b"lorem ipsum dolor") for _ in range(rng.randrange(1, 300))
                )
        return bytes(out[:n])
    if style == 3:
        return (b"abcdefgh" * ((n // 8) + 1))[:n]
    if style == 4:
        return bytes([rng.getrandbits(8)]) * n
    return bytes(rng.choice(b"ab") for _ in range(n))


def main() -> int:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    seed = int(sys.argv[2], 0) if len(sys.argv) > 2 else 0xF00D

    import tamp as ref  # the reference oracle

    import tamp_tpu
    from tamp_tpu import _native
    from tamp_tpu._native.stream import NativeCompressor
    from tamp_tpu.decompressor import decompress as py_decompress

    wavefront = None
    if os.environ.get("TAMP_FUZZ_WAVEFRONT", "1") != "0":
        # the axon TPU plugin ignores the JAX_PLATFORMS env var — only the
        # config API works (memory note axon-tpu-env-quirks); without this
        # the JAX legs silently fuzz through the TPU tunnel at ~1 trial/20s
        import jax

        jax.config.update(
            "jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
        from tamp_tpu.ops.decode_wavefront import decode_shards_wavefront

        def wavefront(stream, dictionary, max_out):
            return decode_shards_wavefront(
                [stream], dictionary=dictionary, max_out=max_out)[0]

    rng = random.Random(seed)
    t_end = time.time() + duration
    trials = fails = wf_trials = dev_trials = gd_trials = 0

    while time.time() < t_end:
        trials += 1
        n = rng.randrange(0, 30000)
        # biased toward 14/15: the split-field windows are the newest code
        w = rng.choice([8, 9, 10, 11, 12, 13, 14, 14, 15, 15])
        lit = rng.choice([5, 6, 7, 8, 8, 8])
        ext = rng.random() < 0.7
        lazy = rng.random() < 0.4
        mask = (1 << lit) - 1
        data = bytes(b & mask for b in gen_data(rng, n))
        use_dict = ext and rng.random() < 0.15
        dict_ = None
        if use_dict:
            dict_ = bytes(
                b & mask for b in gen_data(rng, 1 << w)
            )
        try:
            kw = dict(window=w, literal=lit, extended=ext, lazy_matching=lazy)
            ours = _native.native_compress(
                data, dictionary=dict_, **kw
            )
            theirs = ref.compress(
                data, **kw,
                **({"dictionary": bytearray(dict_)} if dict_ else {}),
            )
            assert ours == theirs, "encode parity"
            assert bytes(
                _native.native_decompress(ours, dictionary=dict_)
            ) == data, "native rt"
            assert bytes(py_decompress(ours, dictionary=dict_ and bytearray(dict_))) == data, "python rt"

            if not use_dict:
                # Decoded output is everything ever written; reset_dictionary
                # only clears the window, not prior output.
                out = io.BytesIO()
                c = NativeCompressor(out, dictionary_reset=True, **kw)
                i = 0
                while i < len(data):
                    step = rng.randrange(1, 5000)
                    c.write(data[i : i + step])
                    i += step
                    if rng.random() < 0.08:
                        c.flush(write_token=True)
                    if rng.random() < 0.02:
                        c.reset_dictionary()
                c.close()
                got = bytes(ref.decompress(out.getvalue()))
                assert got == data, "stream rt via reference"

            if wavefront is not None and n <= 8192 and rng.random() < 0.1:
                wf_trials += 1
                got = wavefront(ours, dict_, 16384)
                assert got == data, "wavefront rt"

            # device-planned extended leg: the on-chip pipeline (interpret
            # kernels) must be byte-identical to the native planned
            # committer at the same settings — incl. lazy (pure-position
            # planned-lazy) and the split-field windows 14/15 — and its
            # stream must decode in the reference package.
            if (wavefront is not None and ext and not use_dict
                    and n <= 6000 and rng.random() < 0.08):
                from tamp_tpu.engine.pipeline_ext import (
                    encode_ext_device_commit)
                from tamp_tpu.engine.plan import (
                    build_model_history, plan_runs)

                dev_trials += 1
                arr = np.frombuffer(data, np.uint8)
                plans = plan_runs(arr)
                keep, khat, dh = build_model_history(arr, plans, w)
                if lazy:
                    l16, i16, pl, pi = _native.native_v1_tables(
                        dh, w, lit, 16, probe=True, ext_dict=True)
                else:
                    l16, i16 = _native.native_v1_tables(
                        dh, w, lit, 16, ext_dict=True)
                    pl = pi = None
                rows = np.minimum(khat[:-1].astype(np.int64),
                                  max(0, dh.shape[0] - 1)).astype(np.int64)
                from tamp_tpu.engine.search_np import MatchTables

                g = MatchTables(
                    l16[rows], i16[rows], l16[rows], i16[rows],
                    pl[rows] if lazy else None, pi[rows] if lazy else None)
                want = _native.native_compress(
                    data, window=w, literal=lit, extended=True,
                    lazy_matching=lazy, tables=g, avoid_divergence=True,
                    khat=khat, plan=plans, force_planned=True)
                got = encode_ext_device_commit(
                    [data], window=w, literal=lit, lazy_matching=lazy,
                    interpret=True)[0]
                assert got == want, "device planned parity"
                assert bytes(ref.decompress(bytearray(got))) == data, \
                    "planned rt via reference"

            # greedy-parity device-mode leg (round 4): table-assisted
            # exact commit (the hybrid pipeline's host half) must stay
            # byte-identical to the reference past window divergence —
            # incl. lazy cache semantics and custom dictionaries
            if ext and n <= 12000 and rng.random() < 0.15:
                from tamp_tpu.engine.pipeline_ext import (
                    encode_ext_device_greedy)

                gd_trials += 1
                got = encode_ext_device_greedy(
                    [data], window=w, literal=lit, lazy_matching=lazy,
                    dictionary=dict_, device_tables=False)[0]
                assert got == theirs, "greedy device parity"

            if n <= 8192 and rng.random() < 0.25:
                # optimal parse: decoded exactly by the reference package;
                # the v1 DP is additionally never larger than greedy
                ref_kw = {"dictionary": bytearray(dict_)} if dict_ else {}
                if ext:
                    from tamp_tpu.engine.encode import encode_extended_optimal

                    opt = encode_extended_optimal(
                        data, window=w, literal=lit, dictionary=dict_)
                    assert bytes(ref.decompress(opt, **ref_kw)) == data, \
                        "ext-optimal rt"
                    if n <= 4096 and rng.random() < 0.4:
                        # device extended-optimal DP (round 5): byte-equal
                        # to the host hybrid DP at every config
                        from tamp_tpu.engine.pipeline_ext import (
                            encode_ext_device_optimal)

                        dev = encode_ext_device_optimal(
                            [data], window=w, literal=lit,
                            dictionary=dict_)[0]
                        assert dev == opt, "device ext-optimal parity"
                else:
                    from tamp_tpu.engine.encode import encode_v1

                    opt = encode_v1(
                        data, window=w, literal=lit, parse="optimal",
                        dictionary=dict_)
                    assert len(opt) <= len(ours), "optimal larger than greedy"
                    assert bytes(ref.decompress(opt, **ref_kw)) == data, \
                        "optimal rt"

            if ours and not use_dict:
                m = bytearray(ours)
                for _ in range(rng.randrange(1, 4)):
                    m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
                for fn in (py_decompress, _native.native_decompress):
                    try:
                        fn(bytes(m))
                    except Exception:
                        pass
                if wavefront is not None and len(m) <= 4096 and rng.random() < 0.05:
                    try:
                        wavefront(bytes(m), None, 1 << 20)
                    except Exception:
                        pass  # mutated streams may legally be rejected
        except AssertionError as e:
            fails += 1
            print(f"FAIL trial={trials} n={n} w={w} lit={lit} ext={ext} "
                  f"lazy={lazy} dict={use_dict}: {e}", flush=True)
            if fails >= 5:
                break
        if trials % 200 == 0:
            print(f"{trials} trials, {fails} fails", flush=True)
    print(f"DONE: {trials} trials ({wf_trials} wavefront, "
          f"{dev_trials} device-planned, {gd_trials} greedy-device), "
          f"{fails} failures",
          flush=True)
    if not fails and os.environ.get("TAMP_FUZZ_SLOW", "1") == "1":
        # the >=1 MB geometry legs (tests marked slow) ride along with
        # every campaign so the per-class ratio pins get exercised at the
        # geometry their percentages were measured at
        import subprocess

        print("running slow-marker 1 MB legs...", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", "-m", "slow",
             "tests/"],
            env={**os.environ, "TAMP_SLOW": "1"},
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        print(f"slow legs rc={rc}", flush=True)
        fails += 1 if rc else 0
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
