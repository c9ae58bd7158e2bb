"""Device-mesh steps on the virtual 8-device CPU mesh (conftest): the
data-parallel encode search and wavefront decode halves under shard_map,
with their psum collectives (SURVEY.md §2.8 — dp over independent streams
is the format's scaling axis)."""

import numpy as np
import pytest

import tamp_tpu
from tamp_tpu import _native
from tamp_tpu.parallel.shard import (
    make_mesh,
    sharded_decode_step,
    sharded_search_step,
)

pytestmark = pytest.mark.skipif(
    not _native.available(), reason=f"native unavailable: {_native.load_error()}"
)


@pytest.fixture(scope="module")
def mesh():
    import jax

    n = min(8, len(jax.devices()))
    return make_mesh(n)


def test_sharded_search_step(mesh):
    n = mesh.devices.size
    rng = np.random.default_rng(7)
    data = rng.integers(97, 123, (n, 256), dtype=np.uint8)
    out = sharded_search_step(mesh, data, window_bits=8, literal_bits=8)
    lens = np.asarray(out["len16"])
    assert lens.shape == (n, 256)
    assert float(np.asarray(out["est_bits_total"]).reshape(-1)[0]) > 0
    # spot-check one shard's lengths against the NumPy oracle
    from tamp_tpu.dictionary import dictionary_array
    from tamp_tpu.engine.search_np import match_tables

    tables = match_tables(data[0], dictionary_array(256, literal=8), 8)
    np.testing.assert_array_equal(lens[0], tables.len16)


def test_sharded_decode_step(mesh):
    n = mesh.devices.size
    rng = np.random.default_rng(8)
    datas = [bytes(rng.integers(97, 123, 300, dtype=np.uint8).tobytes())
             for _ in range(n)]
    streams = [tamp_tpu.compress(d, window=9) for d in datas]
    outs, lens, total = sharded_decode_step(mesh, streams, max_out=512)
    outs, lens = np.asarray(outs), np.asarray(lens)
    assert int(np.asarray(total).reshape(-1)[0]) == sum(len(d) for d in datas)
    for i, d in enumerate(datas):
        assert outs[i, : lens[i]].tobytes() == d


def test_sharded_decode_step_rejects_corrupt(mesh):
    n = mesh.devices.size
    streams = [tamp_tpu.compress(b"mesh decode corpus " * 20, window=8)
               for _ in range(n)]
    bad = bytearray(streams[0])
    # corrupt a window offset deep in the stream until decode errors; OOB
    # references must surface as an exception, not silent garbage
    for flip in range(8, min(len(bad), 40)):
        bad[flip] ^= 0xFF
    streams[0] = bytes(bad)
    try:
        outs, lens, _ = sharded_decode_step(mesh, streams, max_out=1024)
    except ValueError:
        return  # expected: kernel error surfaced
    # if it decoded, output must differ from the original (it was corrupted)
    out0 = np.asarray(outs)[0, : int(np.asarray(lens)[0])].tobytes()
    assert out0 != b"mesh decode corpus " * 20
