"""CLI tests (reference analogue: tests/test_cli.py — subprocess round trips
with stdin/stdout and custom-dictionary flows)."""

import subprocess
import sys
from pathlib import Path

import pytest

import tamp_tpu

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, data=None):
    return subprocess.run(
        [sys.executable, "-m", "tamp_tpu", *args],
        input=data, capture_output=True, cwd=REPO, timeout=120,
    )


DATA = (b"the quick brown fox jumps over the lazy dog. " * 30)


def test_compress_decompress_stdio():
    r = run_cli(["compress"], DATA)
    assert r.returncode == 0, r.stderr
    blob = r.stdout
    assert bytes(tamp_tpu.decompress(blob)) == DATA
    r2 = run_cli(["decompress"], blob)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == DATA


def test_compress_files(tmp_path):
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.tamp"
    back = tmp_path / "back.bin"
    src.write_bytes(DATA)
    r = run_cli(["compress", str(src), "-o", str(dst), "-w", "9", "--lazy-matching"])
    assert r.returncode == 0, r.stderr
    r = run_cli(["decompress", str(dst), "-o", str(back)])
    assert r.returncode == 0, r.stderr
    assert back.read_bytes() == DATA


def test_compress_matches_reference(ref_tamp):
    r = run_cli(["compress", "--implementation", "python"], DATA)
    assert r.stdout == ref_tamp.compress(DATA)


def test_window_validation():
    r = run_cli(["compress", "-w", "7"], b"x")
    assert r.returncode != 0


def test_sharded_container():
    r = run_cli(["compress", "--sharded", "--shard-size", "256"], DATA)
    assert r.returncode == 0, r.stderr
    assert r.stdout[:4] == b"TTPU"
    r2 = run_cli(["decompress"], r.stdout)
    assert r2.stdout == DATA


def test_custom_dictionary_flow(tmp_path):
    d = tmp_path / "dict.bin"
    d.write_bytes(b"the quick brown fox jumps over the lazy dog ")
    r = run_cli(["compress", "-d", str(d)], DATA)
    assert r.returncode == 0, r.stderr
    r2 = run_cli(["decompress", "-d", str(d)], r.stdout)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == DATA


def test_build_dictionary_end_to_end(tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(4):
        (corpus / f"s{i}.txt").write_bytes(
            b"GET /api/v1/users HTTP/1.1\r\nHost: example.com\r\n" * (3 + i)
        )
    out = tmp_path / "built.dict"
    r = run_cli(["build-dictionary", str(corpus), "-o", str(out), "-w", "8"])
    assert r.returncode == 0, r.stderr
    built = out.read_bytes()
    assert len(built) == 256
    # The dictionary should actually help on similar data.
    sample = b"GET /api/v1/users HTTP/1.1\r\nHost: example.com\r\n"
    with_d = tamp_tpu.compress(sample, window=8, dictionary=bytearray(built))
    without = tamp_tpu.compress(sample, window=8)
    assert len(with_d) < len(without)
    assert bytes(tamp_tpu.decompress(with_d, dictionary=bytearray(built))) == sample


def test_dictbuild_knee():
    from tamp_tpu.dictbuild import find_knee

    # compressed totals fall fast to 200 effective bytes, then plateau
    assert find_knee([(0, 500), (100, 420), (200, 380), (300, 375)]) == 200
    assert find_knee([(0, 500)]) == 0


def test_cli_build_dictionary_auto_size(tmp_path):
    from tamp_tpu.cli.main import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i in range(6):
        (corpus / f"s{i}").write_bytes(
            b"sensor[%d] status=ok temperature=21.5C\n" % i * 8)
    out = tmp_path / "dict.bin"
    rc = main(["build-dictionary", str(corpus), "-o", str(out),
               "-w", "8", "--auto-size"])
    assert rc == 0
    assert out.stat().st_size == 256


def test_sharded_container_file_to_file(tmp_path):
    # file-to-file --sharded routes through the bounded-memory streaming
    # path; output must be byte-identical to the stdin/stdout container
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.ttpu"
    back = tmp_path / "back.bin"
    src.write_bytes(DATA)
    r = run_cli(["compress", "--sharded", "--shard-size", "256",
                 str(src), "-o", str(dst)])
    assert r.returncode == 0, r.stderr
    via_stdio = run_cli(["compress", "--sharded", "--shard-size", "256"], DATA)
    assert dst.read_bytes() == via_stdio.stdout
    r2 = run_cli(["decompress", str(dst), "-o", str(back)])
    assert r2.returncode == 0, r2.stderr
    assert back.read_bytes() == DATA
