"""Multi-host orchestration helpers.

The reference is single-threaded by design; scaling is this project's new
axis (SURVEY §2.8).  The recipe: initialize ``jax.distributed``, build a
mesh over all chips, give each host its slice of the input, run the
data-parallel search/encode per shard, and gather the variable-length
compressed blocks in order.  Because Tamp delegates framing to the
container layer (spec: "Tamp relies on external framing"), the ordered
gather is host-side byte concatenation into a TTPU container — no ragged
device collective is required, and any shard decodes independently.
"""

from __future__ import annotations

__all__ = ["initialize", "global_mesh", "compress_distributed"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (no-op when single-process).

    Wraps ``jax.distributed.initialize``; on managed TPU pods the arguments
    are discovered from the environment and may be omitted.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        try:
            if jax.process_count() > 1:
                return  # already initialized by the runtime
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "dp"):
    """A 1-D mesh over every chip in the slice (all hosts)."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def compress_distributed(
    data: bytes,
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    shard_size: int = 1 << 20,
    workers: int | None = None,
) -> bytes | None:
    """Compress ``data`` cooperatively across hosts.

    Each process encodes the shard range it owns (round-robin by process
    id over TTPU shards) with the local engine, then process 0 assembles
    the container from the per-process results via
    ``jax.experimental.multihost_utils``.  Returns the container on
    process 0, None elsewhere.  Single-process calls degrade to
    :func:`tamp_tpu.parallel.shard.compress_sharded`.
    """
    import jax

    from .shard import _pack_frame, compress_sharded

    if jax.process_count() == 1:
        return compress_sharded(
            data, window=window, literal=literal, extended=extended,
            shard_size=shard_size, workers=workers, engine="native",
        )

    import struct

    import numpy as np
    from jax.experimental import multihost_utils

    from .shard import _encode_one_shard

    pid, np_ = jax.process_index(), jax.process_count()
    shards = [data[i : i + shard_size] for i in range(0, len(data), shard_size)] or [b""]
    mine = {
        i: _encode_one_shard((s, window, literal, extended, False, "native"))
        for i, s in enumerate(shards)
        if i % np_ == pid
    }
    # Fixed-size exchange: per-shard blobs padded to the max length.
    max_len = max(len(b) for b in mine.values()) if mine else 0
    max_len = int(multihost_utils.process_allgather(np.array([max_len])).max())
    payload = np.zeros((len(shards), max_len + 8), dtype=np.uint8)
    for i, b in mine.items():
        payload[i, :8] = np.frombuffer(struct.pack("<Q", len(b)), np.uint8)
        payload[i, 8 : 8 + len(b)] = np.frombuffer(b, np.uint8)
    gathered = multihost_utils.process_allgather(payload)  # (P, n_shards, L)
    if pid != 0:
        return None
    blobs = []
    for i in range(len(shards)):
        owner = i % np_
        row = gathered[owner, i]
        (ln,) = struct.unpack("<Q", row[:8].tobytes())
        blobs.append(row[8 : 8 + ln].tobytes())
    return _pack_frame(blobs, len(data), shard_size)
