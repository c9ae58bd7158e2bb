"""Device-accelerated encode pipeline: TPU match search + native commit.

The TPU computes the O(N*window) match tables (ops.match_pallas); the C++
committer (tamp_tpu._native) runs the O(N) greedy token walk and bit pack.
Only the tables the committer will actually read are computed on device
(cap-15 vs cap-16 by max-pattern, probe only under lazy matching).
"""

from __future__ import annotations

from ..constants import compute_min_pattern_size

__all__ = ["device_pipeline_available", "encode_device", "device_search_fn"]


def device_pipeline_available() -> bool:
    """TPU search + native commit both usable."""
    try:
        from .. import _native
        from ..ops.match_pallas import pallas_available

        return _native.available() and pallas_available()
    except Exception:
        return False


def device_search_fn(window: int, literal: int, extended: bool):
    """A ``search_fn(data, dict_arr, window_bits, compute_probe=...)``
    backed by the Pallas kernel, computing only the needed tables."""
    from ..ops.match_pallas import match_tables_pallas

    minp = compute_min_pattern_size(window, literal)
    maxpat = minp + (131 if extended else 13)
    need = ("16",) if min(16, maxpat) == 16 else ("15",)

    def search(data, dict_arr, window_bits, compute_probe=False):
        return match_tables_pallas(
            data, dict_arr, window_bits,
            compute_probe=compute_probe, tables=need,
        )

    return search


def encode_device(
    data,
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    lazy_matching: bool = False,
    dictionary=None,
) -> bytes:
    """One-shot encode through the TPU search + native commit pipeline."""
    search = device_search_fn(window, literal, extended)
    if extended:
        from .encode_extended import encode_extended

        return encode_extended(
            data, window=window, literal=literal, lazy_matching=lazy_matching,
            dictionary=dictionary, search_fn=search,
        )
    from .encode import encode_v1

    return encode_v1(
        data, window=window, literal=literal, lazy_matching=lazy_matching,
        dictionary=dictionary, search_fn=search,
    )
