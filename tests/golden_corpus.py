"""Deterministic golden corpus generator.

The reference pins SHA256 hashes of compressed enwik8/Silesia outputs
(/root/reference/tests/test_dataset_regression.py:38-129) so that any
format drift trips CI even without a decoder bug.  No real corpus ships
in this environment, so this module *generates* a ~2 MB corpus from a
fixed seed: four segments exercising the encoder's distinct regimes —
text-like token soup (Huffman-coded match lengths), structured binary
records (short repeated patterns at fixed strides), long runs (the
extended format's RLE path), and incompressible noise (literal-only).

The generator is the committed artifact; `build_golden_corpus()` must
never change behavior — tests/test_dataset_regression.py pins both the
raw corpus hash and the compressed-output hashes produced from it.
"""

from __future__ import annotations

import numpy as np

GOLDEN_SEED = 0x7A39_11C5


def _text_segment(rng: np.random.Generator, size: int) -> bytes:
    words = [
        bytes(rng.integers(97, 123, int(n)).astype(np.uint8))
        for n in rng.integers(2, 11, 384)
    ]
    seps = [b" ", b" ", b" ", b"\n", b", ", b". "]
    out = []
    total = 0
    picks = rng.integers(0, 384, size // 3)
    sp = rng.integers(0, len(seps), size // 3)
    for w, s in zip(picks, sp):
        out.append(words[int(w)])
        out.append(seps[int(s)])
        total += len(words[int(w)]) + len(seps[int(s)])
        if total >= size:
            break
    return b"".join(out)[:size]


def _records_segment(rng: np.random.Generator, size: int) -> bytes:
    # 24-byte records: fixed magic, incrementing id, small noisy payload
    n = size // 24 + 1
    rec = np.zeros((n, 24), np.uint8)
    rec[:, 0:4] = [0xDE, 0xAD, 0xBE, 0xEF]
    ids = np.arange(n, dtype=np.uint32)
    rec[:, 4] = ids & 0xFF
    rec[:, 5] = (ids >> 8) & 0xFF
    rec[:, 6:8] = [0, 1]
    rec[:, 8:16] = rng.integers(0, 4, (n, 8))
    rec[:, 16:24] = rec[0, 16:24] = 7
    return rec.tobytes()[:size]


def _runs_segment(rng: np.random.Generator, size: int) -> bytes:
    out = []
    total = 0
    while total < size:
        run = int(rng.integers(4, 600))
        byte = int(rng.integers(0, 256))
        out.append(bytes([byte]) * run)
        total += run
        if rng.integers(0, 4) == 0:  # interleave short literals
            lit = bytes(rng.integers(0, 256, int(rng.integers(1, 6))).astype(np.uint8))
            out.append(lit)
            total += len(lit)
    return b"".join(out)[:size]


def _noise_segment(rng: np.random.Generator, size: int) -> bytes:
    return rng.integers(0, 256, size).astype(np.uint8).tobytes()


def build_golden_corpus(size: int = 2 << 20) -> bytes:
    """Deterministic mixed corpus; identical bytes on every platform."""
    rng = np.random.default_rng(GOLDEN_SEED)
    q = size // 4
    parts = [
        _text_segment(rng, q),
        _records_segment(rng, q),
        _runs_segment(rng, q),
        _noise_segment(rng, size - 3 * q),
    ]
    return b"".join(parts)
