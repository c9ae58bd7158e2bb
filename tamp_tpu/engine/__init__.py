"""Vectorized encode/decode engine.

The TPU-native architecture splits encoding into three phases:

1. **search** (O(N*window), massively parallel): per input position, the
   longest ring-buffer match and its ring index — NumPy oracle in
   :mod:`.search_np`, JAX/XLA in :mod:`tamp_tpu.ops.match_mxu`, Pallas
   kernel in :mod:`tamp_tpu.ops.match_pallas`.  Exploits the fact that the
   window state at position ``t`` is a pure function of ``t`` (v1) or of the
   committed write history (extended).
2. **commit** (O(N), sequential but trivial): the greedy token walk with the
   reference's exact tie-breaking, lazy-matching, RLE and extended-match
   state machines — :mod:`.commit` (Python) and the native C++ engine.
3. **bitpack** (O(tokens), parallel): prefix-sum bit offsets + scatter —
   :mod:`tamp_tpu.ops.bitpack`.
"""

from .encode import encode_v1  # noqa: F401
from .encode_extended import encode_extended  # noqa: F401
from .pipeline import device_pipeline_available, encode_device  # noqa: F401
