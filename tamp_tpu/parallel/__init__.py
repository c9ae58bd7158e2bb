"""Data-parallel sharded compression over a device mesh.

The Tamp format has no intrinsic parallelism (each token depends on all
prior window state), so the scaling axis — per the format's own design for
concatenation and external framing (reference: docs/source/specification.rst
"Miscellaneous") — is data parallelism over *independent streams*: the input
is split into shards, each compressed as a self-contained Tamp stream with
its own header and window, computed across chips with ``shard_map`` and
gathered in order into a framed container.
"""

from .shard import (  # noqa: F401
    compress_sharded,
    decompress_sharded,
    make_mesh,
    sharded_search_step,
)
