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
    dictionary: bytes | None = None,
    shard_size: int = 1 << 20,
    workers: int | None = None,
    engine: str = "native",
) -> bytes | None:
    """Compress ``data`` cooperatively across hosts.

    Each process encodes the shard range it owns (round-robin by process
    id over TTPU shards) with ``engine`` — ``"native"`` for the host C++
    codec, ``"device"`` to put the match search on each process's local
    chip (engine/pipeline) — then process 0 assembles the container from
    the per-process results via ``jax.experimental.multihost_utils``.
    Returns the container on process 0, None elsewhere.  Single-process
    calls degrade to :func:`tamp_tpu.parallel.shard.compress_sharded`.
    """
    import jax

    from .shard import _pack_frame, compress_sharded

    if jax.process_count() == 1:
        return compress_sharded(
            data, window=window, literal=literal, extended=extended,
            dictionary=dictionary, shard_size=shard_size, workers=workers,
            engine=engine,
        )

    import numpy as np
    from jax.experimental import multihost_utils

    from .shard import _encode_one_shard

    pid, np_ = jax.process_index(), jax.process_count()
    shards = [data[i : i + shard_size] for i in range(0, len(data), shard_size)] or [b""]
    mine = {
        i: _encode_one_shard(
            (s, window, literal, extended, False, engine, dictionary))
        for i, s in enumerate(shards)
        if i % np_ == pid
    }
    # Ragged gather in two rounds.  Round 1 is a tiny size exchange
    # (O(P*S) int64s): each process publishes the lengths of the shards it
    # owns, zeros elsewhere, so every host learns the exact layout.
    sizes = np.zeros(len(shards), np.int64)
    for i, b in mine.items():
        sizes[i] = len(b)
    all_sizes = multihost_utils.process_allgather(sizes)  # (P, S)
    sizes = all_sizes.max(axis=0)  # each shard has exactly one owner
    # Round 2 moves the bytes: each process concatenates its own blobs in
    # shard order into one flat buffer, padded only to the max per-process
    # total — traffic is O(total compressed bytes * imbalance), not
    # O(P * S * max_shard_len) as a per-shard padded gather would be.
    flat = b"".join(mine[i] for i in sorted(mine))
    max_tot = int(all_sizes.sum(axis=1).max())
    buf = np.zeros(max(max_tot, 1), np.uint8)
    buf[: len(flat)] = np.frombuffer(flat, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # (P, max_tot)
    if pid != 0:
        return None
    offsets = [0] * np_
    blobs = []
    for i in range(len(shards)):
        owner, ln = i % np_, int(sizes[i])
        blobs.append(gathered[owner, offsets[owner] : offsets[owner] + ln].tobytes())
        offsets[owner] += ln
    return _pack_frame(blobs, len(data), shard_size)
