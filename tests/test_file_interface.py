"""File interface tests (reference analogue: tests/test_file_interface.py):
``tamp_tpu.open`` modes, text encoding, path handling, implementation
selection, and cross-implementation file round-trips."""

import io

import pytest

import tamp_tpu


DATA = b"the rain in spain stays mainly in the plain. " * 40


@pytest.mark.parametrize("implementation", ["python", "auto"])
def test_binary_roundtrip_paths(tmp_path, implementation):
    p = tmp_path / "f.tamp"
    with tamp_tpu.open(p, "wb", implementation=implementation, window=9) as f:
        f.write(DATA[:1000])
        f.write(DATA[1000:])
    with tamp_tpu.open(p, "rb", implementation=implementation) as f:
        assert bytes(f.read()) == DATA


def test_text_mode(tmp_path):
    p = tmp_path / "t.tamp"
    text = "héllo wörld! " * 50
    with tamp_tpu.open(p, "w") as f:
        f.write(text)
    with tamp_tpu.open(p, "r") as f:
        assert f.read() == text


def test_implementations_byte_identical(tmp_path):
    pa = tmp_path / "a.tamp"
    pb = tmp_path / "b.tamp"
    with tamp_tpu.open(pa, "wb", implementation="python") as f:
        f.write(DATA)
    try:
        with tamp_tpu.open(pb, "wb", implementation="native") as f:
            f.write(DATA)
    except RuntimeError:
        pytest.skip("native engine unavailable")
    assert pa.read_bytes() == pb.read_bytes()


def test_mode_validation():
    with pytest.raises(ValueError):
        tamp_tpu.open(io.BytesIO(), "rw")
    with pytest.raises(ValueError):
        tamp_tpu.open(io.BytesIO(), "x")
    with pytest.raises(ValueError):
        tamp_tpu.open(io.BytesIO(), "rb", implementation="cuda")


def test_partial_reads(tmp_path):
    p = tmp_path / "f.tamp"
    with tamp_tpu.open(p, "wb") as f:
        f.write(DATA)
    with tamp_tpu.open(p, "rb") as f:
        first = bytes(f.read(100))
        rest = bytes(f.read())
    assert first + rest == DATA


def test_cross_implementation_files(tmp_path, ref_tamp):
    """Files written by the reference implementation open cleanly and
    vice versa."""
    p = tmp_path / "ref.tamp"
    p.write_bytes(ref_tamp.compress(DATA, window=11))
    with tamp_tpu.open(p, "rb") as f:
        assert bytes(f.read()) == DATA
    q = tmp_path / "ours.tamp"
    with tamp_tpu.open(q, "wb") as f:
        f.write(DATA)
    assert bytes(ref_tamp.decompress(q.read_bytes())) == DATA
