"""bz2tpu.open / BZ2File: stdlib-bz2 file-object parity.

Every behavior pinned here was first verified against CPython's
bz2.BZ2File on the same inputs (multi-member concat, trailing junk
ignored, truncated magic -> EOFError, truncated member -> EOFError).
"""

import bz2 as stdlib_bz2
import io

import numpy as np
import pytest

import bz2tpu
from conftest import make_corpus


def test_write_then_stock_reads(tmp_path, rng):
    data = make_corpus(rng, "text", 250_000)
    p = tmp_path / "f.bz2"
    with bz2tpu.open(p, "wb", level=1, parallel=2) as f:
        f.write(data[:100_000])
        assert f.tell() == 100_000
        f.write(data[100_000:])
    assert stdlib_bz2.decompress(p.read_bytes()) == data


def test_read_stock_stream(tmp_path, rng):
    data = make_corpus(rng, "text", 300_000)
    p = tmp_path / "f.bz2"
    p.write_bytes(stdlib_bz2.compress(data, 1))
    with bz2tpu.open(p, "rb") as f:
        assert f.read(1000) == data[:1000]
        assert f.read() == data[1000:]
        assert f.read() == b""
        assert f.tell() == len(data)


def test_append_makes_multimember(tmp_path, rng):
    a = make_corpus(rng, "text", 120_000)
    b = make_corpus(rng, "runs", 80_000)
    p = tmp_path / "f.bz2"
    with bz2tpu.BZ2File(p, "w", level=1) as f:
        f.write(a)
    with bz2tpu.BZ2File(p, "a", level=1) as f:
        f.write(b)
    # stdlib reads the concatenation; so do we.
    with stdlib_bz2.open(p) as f:
        assert f.read() == a + b
    with bz2tpu.open(p) as f:
        assert f.read() == a + b


def test_read_trailing_junk_ignored(rng):
    data = make_corpus(rng, "text", 50_000)
    blob = stdlib_bz2.compress(data, 1) + b"not a stream"
    assert bz2tpu.BZ2File(io.BytesIO(blob)).read() == data


def test_read_truncated_magic_raises(rng):
    data = make_corpus(rng, "text", 50_000)
    blob = stdlib_bz2.compress(data, 1) + b"BZ"
    f = bz2tpu.BZ2File(io.BytesIO(blob))
    with pytest.raises(EOFError):
        f.read()


def test_read_truncated_member_raises(rng):
    data = make_corpus(rng, "text", 50_000)
    blob = stdlib_bz2.compress(data, 1)[:-10]
    f = bz2tpu.BZ2File(io.BytesIO(blob))
    with pytest.raises(EOFError):
        f.read()


def test_read_empty_file():
    assert bz2tpu.BZ2File(io.BytesIO(b"")).read() == b""


def test_text_mode_roundtrip(tmp_path):
    p = tmp_path / "t.bz2"
    with bz2tpu.open(p, "wt", level=1, encoding="utf-8") as f:
        f.write("héllo wörld\nline two\n")
    with bz2tpu.open(p, "rt", encoding="utf-8") as f:
        assert f.readline() == "héllo wörld\n"
        assert f.read() == "line two\n"
    with stdlib_bz2.open(p, "rt", encoding="utf-8") as f:
        assert f.read() == "héllo wörld\nline two\n"


def test_exclusive_create(tmp_path):
    p = tmp_path / "x.bz2"
    with bz2tpu.open(p, "xb", level=1) as f:
        f.write(b"abc")
    with pytest.raises(FileExistsError):
        bz2tpu.open(p, "xb")


def test_mode_errors(tmp_path):
    with pytest.raises(ValueError):
        bz2tpu.open(tmp_path / "f", "rwb")
    with pytest.raises(ValueError):
        bz2tpu.open(tmp_path / "f", "rbt")
    with pytest.raises(ValueError):
        bz2tpu.open(io.BytesIO(), "rb", encoding="utf-8")
    f = bz2tpu.BZ2File(io.BytesIO(stdlib_bz2.compress(b"x", 1)))
    with pytest.raises(io.UnsupportedOperation):
        f.write(b"y")


def test_compresslevel_alias(tmp_path, rng):
    data = make_corpus(rng, "text", 50_000)
    p = tmp_path / "f.bz2"
    with bz2tpu.open(p, "wb", compresslevel=1) as f:
        f.write(data)
    assert p.read_bytes()[:4] == b"BZh1"
    assert stdlib_bz2.decompress(p.read_bytes()) == data


def test_iteration_lines(tmp_path):
    lines = [f"line {i}\n".encode() for i in range(200)]
    p = tmp_path / "f.bz2"
    with bz2tpu.open(p, "wb", level=1) as f:
        f.write(b"".join(lines))
    with bz2tpu.open(p, "rb") as f:
        assert list(f) == lines
