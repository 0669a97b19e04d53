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


def test_read_empty_file_raises():
    # stdlib: bz2.BZ2File(BytesIO(b"")).read() raises EOFError (verified).
    with pytest.raises(EOFError):
        bz2tpu.BZ2File(io.BytesIO(b"")).read()


def test_read_full_magic_trailing_junk_ignored(rng):
    # stdlib: a full "BZh1" magic followed by garbage after a complete
    # member is IGNORED (verified) — the junk errors inside the next
    # decompressor and trailing errors are swallowed.
    data = make_corpus(rng, "text", 50_000)
    blob = stdlib_bz2.compress(data, 1) + b"BZh1" + b"\x00" * 32
    assert bz2tpu.BZ2File(io.BytesIO(blob)).read() == data


def test_read_corrupt_second_member_ignored(rng):
    # stdlib: a second member that ERRORS mid-decode is ignored; the
    # first member's data is returned (verified).
    a = make_corpus(rng, "text", 50_000)
    b = bytearray(stdlib_bz2.compress(make_corpus(rng, "runs", 30_000), 1))
    for off in range(10, 200, 17):
        b[off] ^= 0xFF
    blob = stdlib_bz2.compress(a, 1) + bytes(b)
    assert bz2tpu.BZ2File(io.BytesIO(blob)).read() == a


def test_read_truncated_second_member_raises(rng):
    # stdlib: a VALID-prefix second member cut short raises EOFError.
    a = make_corpus(rng, "text", 50_000)
    second = stdlib_bz2.compress(make_corpus(rng, "text", 40_000), 1)
    blob = stdlib_bz2.compress(a, 1) + second[:20]
    f = bz2tpu.BZ2File(io.BytesIO(blob))
    with pytest.raises(EOFError):
        f.read()


def test_corruption_raises_oserror(rng):
    # stdlib raises OSError on corruption; Bz2FormatError subclasses it,
    # so `except OSError` call sites migrated from stdlib keep working.
    data = make_corpus(rng, "text", 50_000)
    blob = bytearray(stdlib_bz2.compress(data, 1))
    for off in range(10, 400, 13):
        blob[off] ^= 0xFF
    f = bz2tpu.BZ2File(io.BytesIO(bytes(blob)))
    with pytest.raises(OSError):
        f.read()


def test_seek_and_tell(rng):
    data = make_corpus(rng, "text", 120_000)
    blob = stdlib_bz2.compress(data, 1)
    f = bz2tpu.BZ2File(io.BytesIO(blob))
    assert f.seekable()
    assert f.read(5) == data[:5]
    f.seek(0)
    assert f.read(10) == data[:10]
    f.seek(600)
    assert f.read(10) == data[600:610]
    f.seek(100, io.SEEK_CUR)
    assert f.tell() == 710
    assert f.read(5) == data[710:715]
    f.seek(-5, io.SEEK_END)
    assert f.read() == data[-5:]


def test_write_rejects_non_bytes(tmp_path):
    with bz2tpu.open(tmp_path / "f.bz2", "wb", level=1) as f:
        with pytest.raises(TypeError):
            f.write(5)
        with pytest.raises(TypeError):
            f.write("text")


def test_read1_guards(tmp_path):
    f = bz2tpu.BZ2File(io.BytesIO(), "w", level=1)
    with pytest.raises(io.UnsupportedOperation):
        f.read1()
    g = bz2tpu.BZ2File(io.BytesIO(stdlib_bz2.compress(b"x", 1)))
    g.close()
    with pytest.raises(ValueError):
        g.read1()


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
