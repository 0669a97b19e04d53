"""CLI surface tests (oracle backend: no device, fast)."""

import os
import subprocess
import sys

import pytest

from conftest import make_corpus


def run_cli(args, input_bytes=None, cwd=None):
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, "-m", "bz2tpu.cli", *args],
        input=input_bytes,
        capture_output=True,
        cwd=cwd,
        env=env,
        timeout=300,
    )


def test_compress_decompress_check(tmp_path, rng):
    data = make_corpus(rng, "text", 50_000)
    src = tmp_path / "input.dat"
    src.write_bytes(data)
    r = run_cli([str(src), "--backend", "oracle", "--size", "1", "-v", "--metrics"])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "input.dat.bz2").exists()
    assert src.exists()  # kept by default (reference deletes; we do not)
    assert b'"op": "compress"' in r.stderr

    r = run_cli([str(src) + ".bz2", "--check", "--backend", "oracle"])
    assert r.returncode == 0
    assert b"Integrity check passed!" in r.stdout

    r = run_cli([str(src) + ".bz2", "--dec", "--backend", "oracle", "-o", str(tmp_path / "out.dat")])
    assert r.returncode == 0
    assert (tmp_path / "out.dat").read_bytes() == data


def test_stdio(rng):
    data = make_corpus(rng, "runs", 10_000)
    r = run_cli(["-", "--backend", "oracle", "--size", "1"], input_bytes=data)
    assert r.returncode == 0
    r2 = run_cli(["-", "--dec", "--backend", "oracle"], input_bytes=r.stdout)
    assert r2.returncode == 0 and r2.stdout == data


def test_error_exits(tmp_path):
    assert run_cli(["missing.file", "--backend", "oracle"]).returncode == 2
    f = tmp_path / "x"
    f.write_bytes(b"abc")
    assert run_cli([str(f), "--size", "0", "--backend", "oracle"]).returncode == 2
    bad = tmp_path / "bad.bz2"
    bad.write_bytes(b"BZh1garbagegarbage")
    assert run_cli([str(bad), "--check", "--backend", "oracle"]).returncode == 1


def test_rm_flag(tmp_path, rng):
    data = make_corpus(rng, "text", 5_000)
    src = tmp_path / "input.dat"
    src.write_bytes(data)
    r = run_cli([str(src), "--backend", "oracle", "--size", "1", "--rm"])
    assert r.returncode == 0
    assert not src.exists()


def test_cli_prime(tmp_path, monkeypatch):
    # --prime pre-compiles the (level, batch) shapes and exits 0.
    from bz2tpu.cli import main

    assert main(["-", "--prime", "--size", "1", "--parallel", "2"]) == 0


def test_cli_multi_file(tmp_path):
    # Stock-bzip2 multi-file semantics: each input gets its own .bz2 in
    # one invocation (one warmed backend).
    import bz2 as stdlib_bz2

    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.txt"
        p.write_bytes(f"hello world {i} ".encode() * 200)
        paths.append(p)
    rc = run_cli([str(p) for p in paths] + ["--backend", "oracle", "--size", "1"])
    assert rc.returncode == 0, rc.stderr
    for p in paths:
        out = p.with_suffix(p.suffix + ".bz2")
        assert stdlib_bz2.decompress(out.read_bytes()) == p.read_bytes()


def test_cli_multi_file_rejects_output_flag(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_bytes(b"x")
    b.write_bytes(b"y")
    rc = run_cli([str(a), str(b), "-o", str(tmp_path / "out")])
    assert rc.returncode == 2
