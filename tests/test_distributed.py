"""Real multi-process coverage for tamp_tpu.parallel.distributed.

Spawns two local CPU processes joined via ``jax.distributed.initialize``
(localhost coordinator) and asserts that the cooperatively-built container
is byte-identical to the single-process ``compress_sharded`` output —
exercising the multi-host branch of ``compress_distributed`` (shard
round-robin, ragged size exchange, flat allgather, rank-0 assembly) that
the in-suite degenerate path never reaches.

Reference parallel: the upstream project is single-threaded by design
(SURVEY §2.8); multi-host scaling is this project's new axis, so the test
model here is self-consistency against the single-process container.
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")  # before any backend init
jax.distributed.initialize(coordinator_address={addr!r},
                           num_processes=2, process_id={pid})
assert jax.process_count() == 2
from tamp_tpu.parallel.distributed import compress_distributed
data = open({data!r}, "rb").read()
blob = compress_distributed(data, shard_size=1 << 15)
if jax.process_index() == 0:
    assert blob is not None
    open({out!r}, "wb").write(blob)
else:
    assert blob is None
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_compress_matches_single_process(tmp_path):
    import numpy as np

    rng = np.random.default_rng(0xD157)
    words = [bytes(rng.integers(97, 123, rng.integers(2, 9))) for _ in range(64)]
    data = b" ".join(words[int(i) % 64] for i in rng.integers(0, 64, 40_000))
    data_path = tmp_path / "input.bin"
    out_path = tmp_path / "container.ttpu"
    data_path.write_bytes(data)

    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children use plain 1-device CPU backends
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             CHILD.format(root=ROOT, addr=addr, pid=pid,
                          data=str(data_path), out=str(out_path))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=240))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{so}\n{se}"

    from tamp_tpu.parallel.shard import compress_sharded, decompress_sharded

    blob = out_path.read_bytes()
    expect = compress_sharded(data, shard_size=1 << 15, engine="native")
    assert blob == expect
    assert bytes(decompress_sharded(blob)) == data
