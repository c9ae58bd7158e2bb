"""Golden-corpus regression (reference analogue: tests/test_dataset_regression.py).

The reference pins SHA256 hashes of compressed enwik8/Silesia outputs
(/root/reference/tests/test_dataset_regression.py:38-129) so format drift
trips CI even when every differential oracle is wired to the same bug.
Two layers here:

1. ALWAYS-ON: a committed deterministic ~2 MB generator
   (tests/golden_corpus.py) with pinned SHA256s of the raw corpus and of
   the v1 / extended / lazy / optimal compressed outputs.  The four
   greedy-format hashes were verified byte-identical to the reference
   package's encoder at pin time; the optimal-parse hashes pin this
   repo's extension (the reference has no optimal parser, but its decoder
   round-trips these streams — asserted below).

2. TAMP_DATASETS-gated: byte-equality against the reference encoder over
   real corpora (enwik8/Silesia class), when a corpus directory exists.
"""

import hashlib
import os
from pathlib import Path

import pytest

import tamp_tpu
from tamp_tpu import _native

from golden_corpus import build_golden_corpus

DATASETS = os.environ.get("TAMP_DATASETS")

RAW_SHA = "144bf4e94c8bc444ed29298b6d44f07e177399089fa4f2037e884134730f85f8"

# (kwargs, compressed size, sha256) — greedy rows byte-identical to the
# reference encoder (verified at pin time, 2026-08-19)
GOLDEN = {
    "v1": (
        dict(extended=False, lazy_matching=False),
        1177348,
        "852cabaa4df12759dd1c189b76b05313dcf70085ee06ef8303eb7921aa112121",
    ),
    "v1_lazy": (
        dict(extended=False, lazy_matching=True),
        1176264,
        "0dc69812868a1d9824f62d18ecd9b50b98d99ebb9a060a2bd5acd5d0a209073f",
    ),
    "extended": (
        dict(extended=True, lazy_matching=False),
        1104237,
        "d81fb8bf1ca9f6a320338f6c5c26597c1ac83a2fccf812d3d1e2462df58defd9",
    ),
    "extended_lazy": (
        dict(extended=True, lazy_matching=True),
        1102198,
        "42737307efa983b4a83f732b63627d5b9fa372e4251cb9584ce72436c5a486d0",
    ),
}

GOLDEN_OPTIMAL = {
    "optimal_v1": (
        dict(extended=False),
        1165719,
        "31b226e3d740dcd7287b5f4902b70aa11b511c807ed37c21ada1eb51efca9aa6",
    ),
    "optimal_extended": (
        dict(extended=True),
        1096417,
        "41659885f542bcd5f5f889b9048d522ed1427e9e56dfe89af09508d20c375acc",
    ),
}


@pytest.fixture(scope="module")
def golden_data():
    data = build_golden_corpus()
    assert hashlib.sha256(data).hexdigest() == RAW_SHA, (
        "golden corpus generator drifted — never change tests/golden_corpus.py"
    )
    return data


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_pinned_hashes(name, golden_data):
    kw, size, sha = GOLDEN[name]
    blob = _native.native_compress(golden_data, window=10, literal=8, **kw)
    assert len(blob) == size
    assert hashlib.sha256(blob).hexdigest() == sha
    assert bytes(_native.native_decompress(blob)) == golden_data
    assert bytes(tamp_tpu.decompress(blob)) == golden_data


@pytest.mark.parametrize("name", sorted(GOLDEN_OPTIMAL))
def test_golden_optimal_pinned_hashes(name, golden_data):
    kw, size, sha = GOLDEN_OPTIMAL[name]
    blob = tamp_tpu.compress(
        golden_data, window=10, literal=8, parse="optimal", **kw)
    assert len(blob) == size
    assert hashlib.sha256(blob).hexdigest() == sha
    assert bytes(_native.native_decompress(blob)) == golden_data


def test_golden_optimal_reference_interop(golden_data, ref_tamp):
    # the reference decoder must accept the optimal-parse stream
    kw, size, sha = GOLDEN_OPTIMAL["optimal_extended"]
    blob = tamp_tpu.compress(
        golden_data, window=10, literal=8, parse="optimal", **kw)
    assert bytes(ref_tamp.decompress(blob)) == golden_data


datasets_only = pytest.mark.skipif(
    not DATASETS or not Path(DATASETS).is_dir(),
    reason="set TAMP_DATASETS to a corpus directory",
)


def _corpus_files():
    root = Path(DATASETS)
    return sorted(p for p in root.iterdir() if p.is_file())[:16]


@datasets_only
@pytest.mark.parametrize("extended", [False, True], ids=["v1", "extended"])
def test_corpus_byte_parity_and_roundtrip(extended, ref_tamp):
    from tamp.compressor import compress as ref_compress

    for path in _corpus_files():
        data = path.read_bytes()[: 4 << 20]
        theirs = ref_compress(data, extended=extended)
        ours = _native.native_compress(data, extended=extended)
        assert ours == theirs, path.name
        assert bytes(_native.native_decompress(ours)) == data, path.name
        assert bytes(tamp_tpu.decompress(ours)) == data, path.name
