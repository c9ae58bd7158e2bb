"""Golden-corpus regression (reference analogue: tests/test_dataset_regression.py).

The reference pins SHA256 hashes of compressed enwik8/Silesia outputs; no
corpus ships in this environment, so this suite gates on TAMP_DATASETS
(a directory of corpus files) and asserts the stronger property directly:
byte-equality of our encoders against the reference encoder at both format
versions, plus exact round-trips through every decoder.  On any corpus this
implies the reference's pinned-hash property.
"""

import os
from pathlib import Path

import pytest

import tamp_tpu
from tamp_tpu import _native

DATASETS = os.environ.get("TAMP_DATASETS")

pytestmark = pytest.mark.skipif(
    not DATASETS or not Path(DATASETS).is_dir(),
    reason="set TAMP_DATASETS to a corpus directory",
)


def _corpus_files():
    root = Path(DATASETS)
    return sorted(p for p in root.iterdir() if p.is_file())[:16]


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
